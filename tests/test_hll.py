"""hll_distinct: integer-rational HyperLogLog matches an independent
pure-Python mirror, is invariant under duplication (a sketch of
distincts), agrees with the DuckDB oracle bit-exactly, and estimates
within the m=64 error envelope."""

import hashlib
import os

import pytest


def _write_docs(dirpath, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["t"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, os.path.join(dirpath, "documents.parquet"))


def _mirror(texts):
    """Independent HLL: registers, estimate, v_zero — plain ints."""
    regs = {}
    for t in texts:
        h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
        r, w = h >> 58, h & ((1 << 58) - 1)
        rho = 59 - w.bit_length() if w else 59
        regs[r] = max(regs.get(r, 0), rho)
    vz = 64 - len(regs)
    s = (vz << 59) + sum(1 << (59 - rho) for rho in regs.values())
    est = (709 * 64 * 64 * (1 << 59)) // (1000 * s)
    return regs, est, vz


@pytest.mark.usefixtures("ray_session")
class TestHllDistinct:
    def _run(self, d):
        from pyspider_ray import training_queries as tq
        df = tq.QUERIES["hll_distinct"](d).to_pandas()
        return df.set_index("register")["value"].to_dict()

    def test_matches_mirror_and_duplication_invariant(self, tmp_path):
        texts = [f"word{i} text body {i * 7}" for i in range(300)]
        d1 = tmp_path / "once"
        d2 = tmp_path / "thrice"
        d1.mkdir(), d2.mkdir()
        _write_docs(str(d1), texts)
        _write_docs(str(d2), texts * 3)     # duplicates must not move it
        got1, got2 = self._run(str(d1)), self._run(str(d2))
        assert got1 == got2
        regs, est, vz = _mirror(texts)
        assert got1[-1] == est and got1[-2] == vz
        assert {k: v for k, v in got1.items() if k >= 0} == regs

    def test_oracle_parity_and_accuracy(self, sf_dir):
        import duckdb

        import pandas as pd
        from pyspider_ray import training_queries as tq
        df = (tq.QUERIES["hll_distinct"](sf_dir).to_pandas()
              .sort_values("register").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
        odf = (con.sql(tq.ORACLES["hll_distinct"]).df()
               .sort_values("register").reset_index(drop=True))
        pd.testing.assert_frame_equal(df, odf)
        exact = con.sql(
            "SELECT count(DISTINCT text) FROM documents").fetchone()[0]
        est = int(df.loc[df.register == -1, "value"].iloc[0])
        # 64 registers → std error ~13%; allow 3 sigma
        assert abs(est - exact) / exact < 0.4

"""dedup_incremental: crafted corpus exercising every path — history
duplicate dropped, within-batch duplicate first-wins, unique passes —
plus DuckDB oracle parity on the crafted AND the real sf0.01 table."""

import os

import pytest


def _write_docs(dirpath, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["t"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, os.path.join(dirpath, "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
class TestDedupIncremental:
    def _oracle(self, d):
        import duckdb

        from pyspider_ray import training_queries as tq
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        return (con.sql(tq.ORACLES["dedup_incremental"]).df()
                .sort_values("doc_id").reset_index(drop=True))

    def _run(self, d):
        from pyspider_ray import training_queries as tq
        return (tq.QUERIES["dedup_incremental"](d).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    def test_crafted_corpus_all_paths(self, tmp_path):
        rows = [
            # history (doc_id % 5 != 0)
            (1, "seen before alpha"),
            (2, "seen before beta"),
            (3, "history only gamma"),
            # new batch (doc_id % 5 == 0)
            (5, "seen before alpha"),      # dup of history -> dropped
            (10, "fresh delta"),           # unique -> survives
            (15, "batch twin epsilon"),    # first of a batch pair
            (20, "batch twin epsilon"),    # second -> dropped (first wins)
            (25, "seen before beta"),      # dup of history -> dropped
            (30, "fresh zeta"),
        ]
        _write_docs(str(tmp_path), rows)
        df = self._run(str(tmp_path))
        assert list(df["doc_id"]) == [10, 15, 30]
        import pandas as pd
        pd.testing.assert_frame_equal(
            df.reindex(sorted(df.columns), axis=1),
            self._oracle(str(tmp_path)).reindex(
                sorted(df.columns), axis=1))

    def test_sf001_oracle_parity(self, sf_dir):
        import pandas as pd
        df = self._run(sf_dir)
        odf = self._oracle(sf_dir)
        pd.testing.assert_frame_equal(
            df.reindex(sorted(df.columns), axis=1),
            odf.reindex(sorted(odf.columns), axis=1))
        assert len(df) > 0

"""dsir_select: hashed-n-gram importance statistics match an
independent pure-Python mirror on a crafted corpus (holdout exclusion,
single-word docs, whitespace docs, the cross-multiplied gate) and the
DuckDB oracle on the real sf0.001 table."""

import hashlib
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


def _mirror(rows, B):
    """Independent mirror of the DSIR statistics: no shared code with
    training_queries beyond the md5 definition in the docstring."""
    def buckets(text):
        ws = text.split()
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        return [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
                for g in grams]

    tvec, rvec = [0] * B, [0] * B
    for doc_id, text in rows:
        vec = tvec if doc_id % 50 == 0 else rvec
        for b in buckets(text):
            vec[b] += 1
    tt, rt = sum(tvec), sum(rvec)
    out = {}
    for doc_id, text in rows:
        if doc_id % 50 == 0 or not text.split():
            continue
        bx = buckets(text)
        tm = sum(tvec[b] for b in bx)
        rm = sum(rvec[b] for b in bx)
        out[doc_id] = (len(bx), tm, rm, tm * rt > rm * tt)
    return out


@pytest.mark.usefixtures("ray_session")
class TestDsirSelect:
    def _run(self, d):
        from pyspider_ray import training_queries as tq
        df = tq.QUERIES["dsir_select"](d).to_pandas()
        return df.sort_values("doc_id").reset_index(drop=True)

    def test_hand_corpus_matches_mirror(self, tmp_path):
        rows = [
            (0, "the target style text"),        # holdout
            (50, "the target style text again"), # holdout
            (1, "the target style text"),        # raw, target-like
            (2, "zz qq ww"),                     # raw, off-target
            (3, "lonely"),                       # raw, 1 unigram 0 bigrams
            (4, "   "),                          # whitespace: no row
            (5, "the the the"),                  # repeated grams count per position
        ]
        _write_docs(tmp_path, rows)
        from pyspider_ray import training_queries as tq
        df = self._run(str(tmp_path))
        exp = _mirror(rows, tq._DSIR_B)
        assert list(df["doc_id"]) == sorted(exp)
        for _, r in df.iterrows():
            n_g, tm, rm, sel = exp[r["doc_id"]]
            assert (r["n_grams"], r["target_mass"],
                    r["raw_mass"], bool(r["selected"])) == (n_g, tm, rm, sel)
        # the target-like doc is selected, the off-target one is not
        by_id = df.set_index("doc_id")
        assert bool(by_id.loc[1, "selected"])
        assert not bool(by_id.loc[2, "selected"])
        # single word: exactly one gram
        assert by_id.loc[3, "n_grams"] == 1
        # 4 never emits a row (handled by the doc_id list check above);
        # repeated grams count once per POSITION
        assert by_id.loc[5, "n_grams"] == 5

    def test_sf0001_matches_oracle(self, sf_dir):
        import duckdb

        from pyspider_ray import training_queries as tq
        df = self._run(sf_dir)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
        odf = (con.sql(tq.ORACLES["dsir_select"]).df()
               .sort_values("doc_id").reset_index(drop=True))
        import pandas as pd
        pd.testing.assert_frame_equal(
            df.reindex(sorted(df.columns), axis=1),
            odf.reindex(sorted(odf.columns), axis=1),
            check_dtype=False)
        # the gate discriminates (not degenerate all-true/all-false)
        assert 0 < df["selected"].sum() < len(df)

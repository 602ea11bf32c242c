"""substring_dedup (ExactSubstr): crafted corpus exercising cross-doc
spans, within-doc repetition, sub-window docs, total erasure; fallback
path equality; DuckDB oracle parity on crafted + real tables."""

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


def _span(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.mark.usefixtures("ray_session")
class TestSubstringDedup:
    def _run(self, d):
        from pyspider_ray import training_queries as tq
        return (tq.QUERIES["substring_dedup"](d).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    def _oracle(self, d):
        import duckdb

        from pyspider_ray import training_queries as tq
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
        return (con.sql(tq.ORACLES["substring_dedup"]).df()
                .sort_values("doc_id").reset_index(drop=True))

    def test_crafted_corpus(self, tmp_path):
        shared = _span("dup", 25)            # 25-token span shared by 1+2
        rows = [
            (1, _span("a", 10) + " " + shared + " " + _span("b", 10)),
            (2, _span("c", 10) + " " + shared),
            (3, _span("solo", 30)),          # unique 30 tokens: untouched
            (4, _span("tiny", 10)),          # < window width: untouched
            (5, shared),                     # fully covered -> ''
            (6, _span("rep", 20) + " " + _span("rep", 20)),  # self-repeat
        ]
        _write_docs(str(tmp_path), rows)
        df = self._run(str(tmp_path)).set_index("doc_id")
        # doc 3 and 4 untouched
        assert df.loc[3, "clean_text"] == rows[2][1]
        assert df.loc[4, "clean_text"] == rows[3][1]
        assert df.loc[4, "n_tokens_kept"] == 10
        # the shared span vanished from every copy; unique flanks stay
        for d_id, flanks in ((1, ("a0", "b9")), (2, ("c0",))):
            txt = df.loc[d_id, "clean_text"]
            assert "dup0" not in txt and "dup24" not in txt
            for f in flanks:
                assert f in txt
        # fully-duplicated doc erased
        assert df.loc[5, "clean_text"] == ""
        assert df.loc[5, "n_tokens_kept"] == 0
        # within-doc repetition: "rep0..rep19 rep0..rep19" — every
        # window containing the seam or either copy duplicates; all
        # 40 tokens are covered
        assert df.loc[6, "n_tokens_kept"] == 0
        # oracle agrees on the whole crafted table
        import pandas as pd
        pd.testing.assert_frame_equal(
            df.reset_index().reindex(sorted(df.reset_index().columns),
                                     axis=1),
            self._oracle(str(tmp_path)).reindex(
                sorted(df.reset_index().columns), axis=1))

    def test_fallback_equals_broadcast(self, tmp_path):
        shared = _span("dup", 25)
        rows = [(1, _span("x", 12) + " " + shared),
                (2, shared + " " + _span("y", 12)),
                (3, _span("z", 40))]
        _write_docs(str(tmp_path), rows)
        import pandas as pd
        from pyspider_ray import training_queries as tq
        docs = tq._read(str(tmp_path), "documents", ["doc_id", "text"])
        fb = (tq._substr_dedup_shuffled(docs).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
        bc = self._run(str(tmp_path))
        pd.testing.assert_frame_equal(
            fb.reindex(sorted(fb.columns), axis=1),
            bc.reindex(sorted(bc.columns), axis=1))

    def test_sf0001_oracle_parity(self, sf_dir):
        import pandas as pd
        df = self._run(sf_dir)
        odf = self._oracle(sf_dir)
        pd.testing.assert_frame_equal(
            df.reindex(sorted(df.columns), axis=1),
            odf.reindex(sorted(odf.columns), axis=1))
        # the op fires on the real corpus (exact-dup docs share windows)
        assert int(df["n_tokens_kept"].sum()) < int(df["n_tokens"].sum())

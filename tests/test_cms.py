"""cms_word_counts: the Count-Min estimate is never an undercount,
collisions only inflate, the sketch matches an independent mirror,
and the DuckDB oracle agrees bit-exactly (crafted + real corpus)."""

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


def _mirror(texts, probes, depth=4, width=1024):
    sk = [[0] * width for _ in range(depth)]
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    for w, c in counts.items():
        for r in range(depth):
            b = int(hashlib.md5(f"{r}:{w}".encode())
                    .hexdigest()[:8], 16) % width
            sk[r][b] += c
    out = {}
    for w in probes:
        out[w] = min(sk[r][int(hashlib.md5(f"{r}:{w}".encode())
                               .hexdigest()[:8], 16) % width]
                     for r in range(depth))
    return out, counts


@pytest.mark.usefixtures("ray_session")
class TestCmsWordCounts:
    def _run(self, d):
        from pyspider_ray import training_queries as tq
        df = tq.QUERIES["cms_word_counts"](d).to_pandas()
        return dict(zip(df["word"], df["est_count"].astype(int)))

    def test_dense_vocab_never_undercounts(self, tmp_path):
        # ~12k distinct words over 4x1024 counters: collisions certain
        texts = ["the quick " + " ".join(
            f"w{i}_{j}" for j in range(40)) for i in range(300)]
        texts += ["the a of to and in is"] * 50
        _write_docs(str(tmp_path), texts)
        from pyspider_ray import training_queries as tq
        got = self._run(str(tmp_path))
        exp, counts = _mirror(texts, sorted(tq.STOPWORDS))
        assert got == exp
        for w in tq.STOPWORDS:
            assert got[w] >= counts.get(w, 0)    # CMS one-sided error
        # at least the heavy hitter is estimated sanely (<2x true)
        assert got["the"] < 2 * counts["the"]

    def test_oracle_parity(self, sf_dir):
        import duckdb

        import pandas as pd
        from pyspider_ray import training_queries as tq
        df = (tq.QUERIES["cms_word_counts"](sf_dir).to_pandas()
              .sort_values("word").reset_index(drop=True))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
        odf = (con.sql(tq.ORACLES["cms_word_counts"]).df()
               .sort_values("word").reset_index(drop=True))
        pd.testing.assert_frame_equal(df, odf)

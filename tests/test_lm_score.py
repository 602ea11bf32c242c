"""lm_bigram_score: broadcast path, shuffled fallback, and the DuckDB
oracle agree on a crafted corpus where the statistics are computed by
hand — including a cased/multi-space doc, repeated bigrams, and OOV."""

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


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestLmBigramScore:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("lmscore")
        rows = [
            # holdout (trains the LM): bigrams a-b (x2: positions 1 and
            # 3 of "a b a b"), b-a (x1)
            (50, "a b a b"),
            # holdout: cased + multi-space — "A b" is a DIFFERENT
            # bigram from "a b"
            (100, "A  b"),
            # scored: "a b" seen twice in training -> mass 2; "b c"
            # unseen -> oov
            (1, "a b c"),
            # scored: repeated unseen bigram counts per POSITION
            (2, "x y x y x y"),   # bigrams: x-y x3, y-x x2 -> 5 oov
            # scored: single word -> no bigrams -> no row
            (3, "lonely"),
        ]
        _write_docs(d, rows)
        return str(d)

    def _oracle(self, corpus):
        import duckdb

        from pyspider_ray import training_queries as tq
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus}/documents.parquet')")
        return _norm(con.sql(tq.ORACLES["lm_bigram_score"]).df())

    def test_broadcast_matches_oracle_and_hand_counts(self, corpus):
        from pyspider_ray import training_queries as tq
        ours = _norm(tq.q_lm_bigram_score(corpus).to_pandas())
        oracle = self._oracle(corpus)
        assert ours.equals(oracle)
        by_id = {int(r.doc_id): r for r in oracle.itertuples()}
        assert set(by_id) == {1, 2}
        # doc 1: positions (a b)->c=2, (b c)->oov
        assert (by_id[1].n_bigrams, by_id[1].mass, by_id[1].n_oov) \
            == (2, 2, 1)
        # doc 2: five positions, all unseen
        assert (by_id[2].n_bigrams, by_id[2].mass, by_id[2].n_oov) \
            == (5, 0, 5)

    def test_shuffled_fallback_equals_broadcast(self, corpus,
                                                monkeypatch):
        from pyspider_ray import training_queries as tq
        broadcast = _norm(tq.q_lm_bigram_score(corpus).to_pandas())
        monkeypatch.setattr(tq, "_LM_MAX_TRAIN", 0)
        fallback = _norm(tq.q_lm_bigram_score(corpus).to_pandas())
        assert fallback.equals(broadcast)

    def test_trained_model_counts(self, corpus):
        from pyspider_ray import training_queries as tq
        docs = tq._read(corpus, "documents", ["doc_id", "text"])
        model = tq._collect_lm_counts(docs)
        assert model == {"a b": 2, "b a": 1, "A b": 1}

"""C4-style line_dedup: broadcast election path, shuffled fallback, and
the DuckDB oracle must agree on a corpus with real duplicate lines —
including cased text, multi-space runs, within-doc duplicates, partial
tail windows, a doc that dedups to empty, and an empty doc."""

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


LINE_A = " ".join(f"alpha{i}" for i in range(16))      # full window
LINE_B = " ".join(f"Beta{i}" for i in range(16))       # cased words
TAIL = "omega0 omega1 omega2"                           # partial window


@pytest.mark.usefixtures("ray_session")
class TestLineDedup:
    @pytest.fixture(scope="class")
    def corpus(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("linededup")
        rows = [
            # doc 1: A + B + partial tail (first occurrences)
            (1, f"{LINE_A} {LINE_B} {TAIL}"),
            # doc 2: B again (loses) + fresh line + the same tail
            # (loses: partial windows dedup too); multi-space runs
            # collapse identically on both sides (split vs \s+)
            (2, f"{LINE_B}  " + " ".join(f"g{i}" for i in range(16))
                + f"  {TAIL}"),
            # doc 3: within-doc duplicate — A twice; second loses
            (3, f"{LINE_A} {LINE_A}"),
            # doc 4: dedups to EMPTY (every line already seen)
            (4, f"{LINE_A} {LINE_B}"),
            # doc 5: empty text — no row on either side
            (5, "   "),
            # doc 6: cased variant of A is a DIFFERENT line (exact
            # dedup is case-sensitive)
            (6, LINE_A.upper()),
        ]
        _write_docs(d, rows)
        return str(d)

    def _oracle(self, corpus):
        import duckdb

        from pyspider_ray import training_queries as tq
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{corpus}/documents.parquet')")
        return _norm(con.sql(tq.ORACLES["line_dedup"]).df())

    def test_broadcast_path_matches_oracle(self, corpus):
        from pyspider_ray import training_queries as tq
        ours = _norm(tq.q_line_dedup(corpus).to_pandas())
        oracle = self._oracle(corpus)
        assert ours.equals(oracle)
        by_id = {int(r.doc_id): r for r in oracle.itertuples()}
        assert set(by_id) == {1, 2, 3, 4, 6}        # doc 5 emits no row
        assert by_id[1].n_lines_kept == 3           # all first
        assert by_id[2].n_lines_kept == 1           # B and tail lose
        assert by_id[3].n_lines_kept == 0           # A seen in doc 1
        assert by_id[4].clean_text == ""            # fully deduped
        assert by_id[4].n_lines == 2
        assert by_id[6].n_lines_kept == 1           # case-distinct

    def test_shuffled_fallback_equals_broadcast(self, corpus,
                                                monkeypatch):
        from pyspider_ray import training_queries as tq
        broadcast = _norm(tq.q_line_dedup(corpus).to_pandas())
        monkeypatch.setattr(tq, "_LINE_DEDUP_MAX_DISTINCT", 0)
        fallback = _norm(tq.q_line_dedup(corpus).to_pandas())
        assert fallback.equals(broadcast)

    def test_within_doc_first_wins_order(self, corpus):
        """Doc 3's FIRST copy of A loses to doc 1 (smaller doc_id), not
        the other way round — the election orders by (doc_id, line_no)
        globally."""
        from pyspider_ray import training_queries as tq
        docs = tq._read(corpus, "documents", ["doc_id", "text"])
        winners = tq._collect_dup_line_winners(docs)
        assert winners[LINE_A] == (1, 0)
        assert winners[LINE_B] == (1, 1)
        assert winners[TAIL] == (1, 2)

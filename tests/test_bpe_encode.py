"""bpe_encode / bpe_token_counts: the distributed encode pass must
equal an independent sequential encoder over the same corpus, conserve
symbols exactly (n_tokens_bpe = initial_symbols - n_merges_applied),
and the token histogram must tie out against the per-doc counts."""

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


def _simple_mirror(word: str, merges) -> list[str]:
    """Independent sequential encoder (no shared code with the
    library's _bpe_apply_merges), written against the documented
    rewrite rule: replay merges in rank order; within a merge, scan
    left-to-right and re-examine at the merge site."""
    syms = list(word) + ["</w>"]
    for _rank, left, right, _w in merges:
        i = 0
        while i + 1 < len(syms):
            if syms[i] == left and syms[i + 1] == right:
                syms = syms[:i] + [left + right] + syms[i + 2:]
            else:
                i += 1
    return syms


ROWS = [(1, "low low low lowest lowest wider"),
        (2, "newer newer newer wider wider widest"),
        (3, "new news newest lower  lowest"),      # double space
        (4, "aaaa aa aaa"),                        # run-merge case
        (5, "the")]


@pytest.mark.usefixtures("ray_session")
class TestBpeEncode:
    def test_matches_sequential_mirror(self, tmp_path):
        import pandas as pd
        from pyspider_ray import training_queries as tq
        _write_docs(tmp_path, ROWS)
        merges_t = tq.q_bpe_train(str(tmp_path))
        merges = list(zip(merges_t["rank"].to_pylist(),
                          merges_t["left"].to_pylist(),
                          merges_t["right"].to_pylist(),
                          merges_t["weight"].to_pylist()))
        got = (tq.q_bpe_encode(str(tmp_path)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        exp_rows = []
        for doc_id, text in ROWS:
            toks = []
            init = 0
            for w in text.strip().split():
                enc = _simple_mirror(w, merges)
                toks.extend(enc)
                init += len(w) + 1
            exp_rows.append({"doc_id": doc_id,
                             "n_tokens_bpe": len(toks),
                             "n_merges_applied": init - len(toks)})
        exp = pd.DataFrame(exp_rows)
        pd.testing.assert_frame_equal(got, exp, check_dtype=True)
        # something actually merged (the corpus repeats subwords)
        assert (got["n_merges_applied"] > 0).any()

    def test_run_merge_semantics(self):
        """b b b b under merge (b, b) collapses pairwise left-to-right
        with re-examination: [bb, bb] — the trainer's rewrite rule."""
        from pyspider_ray import training_queries as tq
        out = tq._bpe_apply_merges("bbbb", [(0, "b", "b", 1)])
        assert out == ["bb", "bb", "</w>"]
        assert tq._bpe_apply_merges("bbb", [(0, "b", "b", 1)]) == \
            ["bb", "b", "</w>"]
        assert _simple_mirror("bbbb", [(0, "b", "b", 1)]) == \
            ["bb", "bb", "</w>"]

    def test_token_counts_tie_out(self, tmp_path):
        from collections import Counter

        from pyspider_ray import training_queries as tq
        _write_docs(tmp_path, ROWS)
        merges_t = tq.q_bpe_train(str(tmp_path))
        merges = list(zip(merges_t["rank"].to_pylist(),
                          merges_t["left"].to_pylist(),
                          merges_t["right"].to_pylist(),
                          merges_t["weight"].to_pylist()))
        hist = tq.q_bpe_token_counts(str(tmp_path)).to_pandas()
        exp = Counter()
        for _doc, text in ROWS:
            for w in text.strip().split():
                exp.update(_simple_mirror(w, merges))
        got = dict(zip(hist["token"], hist["n"]))
        assert got == dict(exp)
        # global conservation: histogram total == sum of per-doc counts
        enc = tq.q_bpe_encode(str(tmp_path)).to_pandas()
        assert hist["n"].sum() == enc["n_tokens_bpe"].sum()

    def test_encode_applies_trained_merges(self, tmp_path):
        """Encoding the training corpus with the full merge table
        yields tokens that include the learned multi-char symbols."""
        from pyspider_ray import training_queries as tq
        _write_docs(tmp_path, ROWS)
        hist = tq.q_bpe_token_counts(str(tmp_path)).to_pandas()
        assert (hist["token"].str.len() > 1).any()
        merges_t = tq.q_bpe_train(str(tmp_path))
        final = merges_t["left"].to_pylist()[-1] + \
            merges_t["right"].to_pylist()[-1]
        assert final in set(hist["token"])

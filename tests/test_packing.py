"""Sequence-packing operator: the pack_greedy kernel's searchsorted
walk must equal the obvious sequential reference, and the distributed
seq_packing query must equal driver-side packing of the same docs
(no_oracle — greedy packing is order-dependent, not SQL-expressible)."""

import numpy as np
import pandas as pd
import pytest

from pyspider_ray.training_queries import _PACK_BUDGET, pack_greedy


def pack_reference(tokens, budget):
    bins, cur, b = [], 0, 0
    for t in tokens:
        if cur > 0 and cur + t > budget:
            b, cur = b + 1, 0
        bins.append(b)
        cur += t
    return np.array(bins, dtype=np.int64)


class TestPackGreedy:
    def test_matches_sequential_reference(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            toks = rng.integers(1, 200, size=rng.integers(1, 400))
            got = pack_greedy(toks, 512)
            assert (got == pack_reference(toks, 512)).all()

    def test_zero_token_docs_never_force_a_bin_break(self):
        # empty bin admits the next doc regardless of size (cur == 0)
        for toks in ([0, 600], [0, 0, 600, 100], [0, 100, 600],
                     [600, 0, 0, 600], [0], [0, 0]):
            t = np.array(toks)
            assert (pack_greedy(t, 512) == pack_reference(t, 512)).all(), \
                toks
        rng = np.random.default_rng(11)
        for _ in range(30):
            toks = rng.integers(0, 700, size=rng.integers(1, 300))
            toks[rng.integers(0, len(toks), size=len(toks) // 3)] = 0
            assert (pack_greedy(toks, 512)
                    == pack_reference(toks, 512)).all()

    def test_oversized_doc_gets_own_bin(self):
        toks = np.array([100, 9999, 100, 9999, 50])
        got = pack_greedy(toks, 512)
        assert (got == np.array([0, 1, 2, 3, 4])).all()

    def test_exact_fill_boundary(self):
        # cum == budget stays in the bin; +1 starts a new one
        assert (pack_greedy(np.array([256, 256, 1]), 512)
                == np.array([0, 0, 1])).all()
        assert (pack_greedy(np.array([256, 257]), 512)
                == np.array([0, 1])).all()


@pytest.mark.usefixtures("ray_session")
class TestSeqPackingQuery:
    def test_matches_driver_side_packing(self, sf_dir):
        import duckdb

        from pyspider_ray.training_queries import QUERIES

        got = (QUERIES["seq_packing"](sf_dir).to_pandas()
               .sort_values(["source", "bin_id"]).reset_index(drop=True))
        # per-bin invariant: within budget, or a single oversized doc
        assert ((got["n_tokens"] <= _PACK_BUDGET)
                | (got["n_docs"] == 1)).all()

        docs = duckdb.sql(
            f"SELECT doc_id, source, text FROM "
            f"read_parquet('{sf_dir}/documents.parquet') "
            f"ORDER BY source, doc_id").df()
        parts = []
        for src, g in docs.groupby("source", sort=True):
            toks = np.array([len(t.split()) for t in g["text"]])
            bins = pack_reference(toks, _PACK_BUDGET)
            ref = (pd.DataFrame({"bin_id": bins, "n": toks})
                   .groupby("bin_id")
                   .agg(n_docs=("n", "size"), n_tokens=("n", "sum"))
                   .reset_index())
            ref.insert(0, "source", src)
            parts.append(ref)
        want = pd.concat(parts, ignore_index=True)
        assert got.astype(str).equals(want.astype(str))

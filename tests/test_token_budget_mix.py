"""token_budget_mix: the distributed histogram-cutoff selection must
equal an independent pure-Python mirror of the spec (per-source char
quota = budget * w_s // Σw, filled by the maximal placement-hash-order
prefix with running sum ≤ quota) and the DuckDB oracle, including
zero-char docs, an over-sized doc that blocks its source's tail, and a
source small enough to be selected wholesale (the no-boundary path)."""

import hashlib
import os

import pytest


def _write_docs(dirpath, rows):
    """rows: (doc_id, source, n_chars)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["x" * r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64())})
    pq.write_table(t, os.path.join(dirpath, "documents.parquet"))


def _mirror(rows):
    """Independent sequential implementation of the documented rule
    (no shared code with the library)."""
    budget = sum(r[2] for r in rows) // 3
    sources = sorted({r[1] for r in rows})
    wt = {s: int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 5 + 1
          for s in sources}
    wsum = sum(wt.values())
    sel = set()
    for s in sources:
        quota = budget * wt[s] // wsum
        docs = sorted(
            (r for r in rows if r[1] == s),
            key=lambda r: (int(hashlib.md5(str(r[0]).encode())
                               .hexdigest()[:15], 16), r[0]))
        cum = 0
        for did, _s, n in docs:
            cum += n
            if cum > quota:
                break
            sel.add(did)
    return sel


def _corpus():
    import numpy as np
    rng = np.random.default_rng(7)
    rows = []
    did = 0
    for k in range(12):
        for _ in range(40):
            rows.append((did, f"s{k}", int(rng.integers(10, 400))))
            did += 1
    rows.append((did, "s0", 0))            # zero-char doc
    rows.append((did + 1, "s1", 0))
    rows.append((did + 2, "s2", 500_000))  # blocks s2's tail wherever
    did += 3                               # it lands in hash order
    # a tiny source that fits entirely under its quota (select-all
    # path: cutoff bucket = _MIX_BUCKETS, no boundary group)
    for _ in range(3):
        rows.append((did, "tiny", 1))
        did += 1
    return rows


@pytest.mark.usefixtures("ray_session")
class TestTokenBudgetMix:
    def test_matches_mirror_and_oracle(self, tmp_path):
        import pandas as pd
        from pyspider_ray import training_queries as tq

        rows = _corpus()
        _write_docs(tmp_path, rows)
        exp = _mirror(rows)
        assert exp, "mirror selected nothing — corpus too small"
        # the select-all path must actually be exercised
        assert {r[0] for r in rows if r[1] == "tiny"} <= exp
        # ... and at least one source must be cut (boundary path)
        cut_sources = {r[1] for r in rows
                       if r[0] not in exp} & {r[1] for r in rows
                                              if r[0] in exp}
        assert cut_sources

        got = (tq.q_token_budget_mix(str(tmp_path)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert set(got["doc_id"]) == exp
        by_id = {r[0]: r for r in rows}
        for _, r in got.iterrows():
            assert r["source"] == by_id[r["doc_id"]][1]
            assert r["n_chars"] == by_id[r["doc_id"]][2]

        import duckdb
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
        odf = (con.sql(tq.ORACLES["token_budget_mix"]).df()
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.reindex(sorted(got.columns), axis=1),
            odf.reindex(sorted(odf.columns), axis=1),
            check_dtype=True)

    def test_zero_char_docs_follow_prefix_rule(self, tmp_path):
        """A zero-char doc is selected iff it precedes the overflow
        point in hash order — both engines must agree (regression
        guard for 'greedy skip' vs 'strict prefix' divergence)."""
        from pyspider_ray import training_queries as tq
        rows = [(i, "only", 0 if i % 3 == 0 else 50) for i in range(60)]
        _write_docs(tmp_path, rows)
        got = set(tq.q_token_budget_mix(str(tmp_path)).to_pandas()["doc_id"])
        assert got == _mirror(rows)

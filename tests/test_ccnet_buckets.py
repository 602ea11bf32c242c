"""ccnet_buckets: head/middle/tail tertile partitioning pinned by a
full independent pure-Python mirror (train counts, integer scores,
histogram-rule thresholds) on the real sf0.001 table; oracle parity
additionally runs in the sweep."""

import re
from collections import Counter


def _mirror(docs):
    train = Counter()
    stats = {}
    for d in docs:
        ws = re.split(r"\s+", d["text"].strip())
        grams = list(zip(ws, ws[1:]))
        if d["doc_id"] % 50 == 0:
            train.update(grams)
    for d in docs:
        if d["doc_id"] % 50 == 0:
            continue
        ws = d["text"].split()
        grams = list(zip(ws, ws[1:]))
        if not grams:
            continue
        mass = sum(train.get(g, 0) for g in grams)
        stats[d["doc_id"]] = mass * 1000 // len(grams)
    scores = sorted(stats.values())
    n = len(scores)

    # histogram rule: smallest v with count(<= v) * 100 >= q * n
    def t(q):
        cum = 0
        for v in scores:
            cum += 1
            if cum * 100 >= q * n:
                return v
        return scores[-1]

    t33, t66 = t(33), t(66)
    return {doc: (s, 0 if s > t66 else (1 if s > t33 else 2))
            for doc, s in stats.items()}, (t33, t66)


class TestCcnetBuckets:
    def test_matches_mirror(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        from pyspider_ray.training_queries import q_ccnet_buckets
        got = q_ccnet_buckets(sf_dir).to_pandas().set_index("doc_id")
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).to_pylist()
        want, (t33, t66) = _mirror(docs)
        assert len(got) == len(want)
        for doc_id, (score, bucket) in want.items():
            row = got.loc[doc_id]
            assert (int(row["score"]), int(row["bucket"])) == (
                score, bucket), (doc_id, t33, t66)

    def test_tertiles_are_balanced(self, ray_session, sf_dir):
        """Each bucket holds roughly a third of the corpus (exact
        thirds are impossible with tied scores, but no bucket may be
        empty or hold the majority twice over)."""
        from pyspider_ray.training_queries import q_ccnet_buckets
        df = q_ccnet_buckets(sf_dir).to_pandas()
        counts = df["bucket"].value_counts()
        assert set(counts.index) == {0, 1, 2}
        n = len(df)
        for b in (0, 1, 2):
            assert counts[b] >= n // 6

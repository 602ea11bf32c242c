"""Unit contracts of the distributed pair machinery
(pyspider_ray/neardup.py): candidate generation matches brute force,
co-partitioned attach equals a hash join, multi-index Hamming banding
has zero misses inside its pigeonhole envelope, hot buckets cap."""

import collections

import numpy as np
import pyarrow as pa
import pytest

from pyspider_ray.neardup import (attach_column, candidate_pairs,
                                  hamming_band_keys, join_signatures)


def _triples_table(rows):
    return pa.table({"band": pa.array([r[0] for r in rows], pa.int64()),
                     "key": pa.array([r[1] for r in rows], pa.int64()),
                     "doc_id": pa.array([r[2] for r in rows], pa.int64())})


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data as rd
    return rd


class TestCandidatePairs:
    def test_matches_bruteforce(self, rd):
        rng = np.random.RandomState(7)
        rows = []
        for d in range(100):
            for band in range(4):
                key = (d // 3) * 10 + band if d % 2 == 0 \
                    else int(rng.randint(0, 1000))
                rows.append((band, key, d))
        pairs = candidate_pairs(rd.from_arrow(_triples_table(rows))
                                .repartition(5))
        got = {(r["doc_a"], r["doc_b"]) for r in pairs.take_all()}
        buckets = collections.defaultdict(list)
        for band, key, d in rows:
            buckets[(band, key)].append(d)
        exp = set()
        for mem in buckets.values():
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    exp.add((min(mem[i], mem[j]), max(mem[i], mem[j])))
        assert got == exp

    def test_wide_doc_ids_beyond_2_32(self, rd):
        """The >2^32-doc envelope (10^10-URL frontiers): doc ids that
        don't fit the packed (lo<<32|hi) word ride the (n, 2) wide
        transport through the same exchange, and MIXED narrow/wide
        partitions meet safely in the pair-dedup reduce (partition
        routing hashes pair VALUES, never the packed word)."""
        rng = np.random.RandomState(13)
        base = np.int64(1) << np.int64(40)           # 2^40 > 2^32
        docs = []                                    # mixed id widths:
        for d in range(80):                          # ~half narrow,
            docs.append(int(d) if d % 2 == 0         # ~half wide
                        else int(base + d * 977))
        rows = []
        for i, d in enumerate(docs):
            for band in range(4):
                key = (i // 3) * 10 + band if i % 2 == 0 \
                    else int(rng.randint(0, 500))
                rows.append((band, key, d))
        pairs = candidate_pairs(rd.from_arrow(_triples_table(rows))
                                .repartition(5))
        got = {(r["doc_a"], r["doc_b"]) for r in pairs.take_all()}
        buckets = collections.defaultdict(list)
        for band, key, d in rows:
            buckets[(band, key)].append(d)
        exp = set()
        for mem in buckets.values():
            for i in range(len(mem)):
                for j in range(i + 1, len(mem)):
                    exp.add((min(mem[i], mem[j]), max(mem[i], mem[j])))
        assert got == exp
        assert any(a >= (1 << 32) or b >= (1 << 32) for a, b in got)

    def test_max_bucket_caps_hot_buckets(self, rd):
        rows = [(0, 1, d) for d in range(50)]          # one hot bucket
        rows += [(1, 2, 0), (1, 2, 1)]                 # one small bucket
        pairs = candidate_pairs(rd.from_arrow(_triples_table(rows)),
                                max_bucket=10)
        got = {(r["doc_a"], r["doc_b"]) for r in pairs.take_all()}
        assert got == {(0, 1)}          # hot bucket dropped, small kept

    def test_cap_drops_are_logged_not_silent(self, caplog):
        import logging
        from pyspider_ray.neardup import _expand_runs
        rows = [(0, 1, d) for d in range(50)] + [(1, 2, 0), (1, 2, 1)]
        band = np.array([r[0] for r in rows])
        key = np.array([r[1] for r in rows])
        doc = np.array([r[2] for r in rows])
        with caplog.at_level(logging.WARNING, "pyspider_ray.neardup"):
            lo, hi = _expand_runs(band, key, doc, max_bucket=10)
        assert len(lo) == 1             # only the small bucket expanded
        msgs = [r.getMessage() for r in caplog.records]
        assert any("dropped 1 hot bucket" in m for m in msgs)
        assert any("hottest 50" in m for m in msgs)


class TestAttach:
    def test_attach_equals_hash_join(self, rd):
        pairs_t = pa.table({
            "doc_a": pa.array([1, 2, 3, 99], pa.int64()),   # 99 absent
            "doc_b": pa.array([4, 5, 6, 7], pa.int64())})
        sig_t = pa.table({
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "sig": pa.array([d * 7 for d in range(10)], pa.int64())})
        out = join_signatures(rd.from_arrow(pairs_t),
                              rd.from_arrow(sig_t), "sig",
                              num_partitions=4).take_all()
        # inner-join semantics: the row with the absent doc_a dropped
        assert len(out) == 3
        for r in out:
            assert r["sig_a"] == r["doc_a"] * 7
            assert r["sig_b"] == r["doc_b"] * 7


class TestPairTransport:
    """Unit contracts of the narrow/wide pair transport (no Ray)."""

    def test_pack_roundtrip_narrow_and_wide(self):
        from pyspider_ray.neardup import _pack_pairs, _unpack_pairs
        lo = np.array([0, 5, 2**31], dtype=np.int64)
        hi = np.array([1, 9, 2**32 - 1], dtype=np.int64)
        p = _pack_pairs(lo, hi)
        assert p.ndim == 1 and p.dtype == np.uint64
        l2, h2 = _unpack_pairs(p)
        assert (l2 == lo).all() and (h2 == hi).all()
        hi_wide = hi.copy()
        hi_wide[-1] = 2**40 + 3
        w = _pack_pairs(lo, hi_wide)
        assert w.ndim == 2
        l3, h3 = _unpack_pairs(w)
        assert (l3 == lo).all() and (h3 == hi_wide).all()

    def test_pair_hash_format_independent(self):
        """A pair routes to the same partition whichever transport
        representation carries it."""
        from pyspider_ray.neardup import _pair_hash
        rng = np.random.RandomState(3)
        lo = rng.randint(0, 2**31, 1000).astype(np.int64)
        hi = lo + rng.randint(1, 2**31, 1000).astype(np.int64)
        h1 = _pair_hash(lo, hi) % np.uint64(64)
        h2 = _pair_hash(lo.copy(), hi.copy()) % np.uint64(64)
        assert (h1 == h2).all()
        assert len(np.unique(h1)) > 32        # spreads across partitions

    def test_expand_bipartite_matches_bruteforce(self):
        """Query x corpus bucket expansion == brute-force set logic,
        including ids beyond 2^32 (wide transport) and self-exclusion."""
        from pyspider_ray.neardup import _expand_bipartite_runs
        rng = np.random.RandomState(7)
        n = 600
        band = rng.randint(0, 4, n).astype(np.int64)
        key = rng.randint(0, 9, n).astype(np.int64)
        doc = rng.randint(0, 2**40, n).astype(np.int64)
        # make some docs queries; duplicate their rows like the fan-out
        isq = np.zeros(n, dtype=bool)
        qdocs = set(doc[rng.choice(n, 25, replace=False)].tolist())
        qrows = np.isin(doc, list(qdocs))
        band = np.concatenate([band, band[qrows]])
        key = np.concatenate([key, key[qrows]])
        doc = np.concatenate([doc, doc[qrows]])
        isq = np.concatenate([isq, np.ones(int(qrows.sum()), bool)])
        qs, cs = _expand_bipartite_runs(band, key, doc, isq)
        got = set(zip(qs.tolist(), cs.tolist()))
        exp = set()
        buckets: dict = {}
        for b, k, d, q in zip(band.tolist(), key.tolist(),
                              doc.tolist(), isq.tolist()):
            buckets.setdefault((b, k), ([], []))[int(q)].append(d)
        for corpus, queries in buckets.values():
            for q in queries:
                for c in corpus:
                    if q != c:
                        exp.add((q, c))
        assert got == exp and len(exp) > 0

    def test_dedup_pairs_matches_np_unique(self):
        from pyspider_ray.neardup import _dedup_pairs
        rng = np.random.RandomState(5)
        lo = rng.randint(0, 50, 5000).astype(np.int64)
        hi = lo + rng.randint(1, 50, 5000).astype(np.int64)
        dl, dh = _dedup_pairs(lo, hi)
        exp = sorted(set(zip(lo.tolist(), hi.tolist())))
        assert list(zip(dl.tolist(), dh.tolist())) == exp


class TestHammingBanding:
    @pytest.mark.parametrize("n_bands,dist", [(8, 6), (12, 10)])
    def test_zero_misses_within_envelope(self, n_bands, dist):
        """d <= n_bands - composite guarantees a shared composite key."""
        rng = np.random.RandomState(11)
        vals = rng.randint(0, 2**63, 200).astype(np.uint64)
        flipped = vals.copy()
        for i in range(len(vals)):
            for b in rng.choice(64, dist, replace=False):
                flipped[i] ^= np.uint64(1) << np.uint64(b)
        _, k1 = hamming_band_keys(vals, n_bands, 2)
        _, k2 = hamming_band_keys(flipped, n_bands, 2)
        assert all((k1[i] == k2[i]).any() for i in range(len(vals)))


@pytest.mark.usefixtures("ray_session")
class TestAnnLsh:
    def test_recall_vs_brute_force(self, sf_dir):
        """ann_lsh candidates come from signature collisions only; its
        top-5 should recover a solid fraction of the exact top-5 and
        every reported neighbor must be structurally valid."""
        from pyspider_ray.training_queries import q_ann_lsh, q_embedding_knn
        exact = q_embedding_knn(sf_dir).to_pandas()
        approx = q_ann_lsh(sf_dir).to_pandas()
        assert set(approx.columns) == {"query_id", "rank", "neighbor_id"}
        assert (approx.groupby("query_id")["rank"].apply(
            lambda r: sorted(r) == list(range(1, len(r) + 1)))).all()
        assert (approx["query_id"] != approx["neighbor_id"]).all()
        hits = tot = 0
        ex = exact.groupby("query_id")["neighbor_id"].apply(set)
        for qid, grp in approx.groupby("query_id")["neighbor_id"]:
            truth = ex.get(qid, set())
            hits += len(set(grp) & truth)
            tot += len(truth)
        recall = hits / max(tot, 1)
        # approximate by construction; the floor pins that bucketing is
        # actually finding neighbors, not returning arbitrary rows
        assert recall >= 0.25, f"recall {recall:.2f}"

    def test_deterministic(self, sf_dir):
        from pyspider_ray.training_queries import q_ann_lsh
        a = q_ann_lsh(sf_dir).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        b = q_ann_lsh(sf_dir).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestAnnLshBucketed:
    def test_matches_broadcast_form_exactly(self, sf_dir):
        """The bucketed-shuffle form uses the same planes and the same
        ANY-table collision criterion as the broadcast-probe form, so
        the candidate sets — and therefore the exact-scored top-k —
        are identical.  This pins the whole exchange (bipartite bucket
        expansion, cross-table pair dedup, partitioned embedding join,
        vectorized scoring) against the independently-implemented
        broadcast path."""
        from pyspider_ray.training_queries import (q_ann_lsh,
                                                   q_ann_lsh_bucketed)
        a = q_ann_lsh(sf_dir).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        b = q_ann_lsh_bucketed(sf_dir).to_pandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
        assert len(a) > 0
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestAnnIvf:
    def test_recall_vs_brute_force(self, sf_dir):
        """IVF probes 3 of 8 cells; with sample-trained centroids its
        top-5 should recover most of the exact top-5 — the quantitative
        pin that turns a rows-only entry into a measured approximation."""
        from pyspider_ray.training_queries import q_ann_ivf, q_embedding_knn
        exact = q_embedding_knn(sf_dir).to_pandas()
        approx = q_ann_ivf(sf_dir).to_pandas()
        assert set(approx.columns) == {"query_id", "rank", "neighbor_id"}
        assert set(approx["query_id"]) == set(exact["query_id"])
        assert (approx.groupby("query_id")["rank"].apply(
            lambda r: sorted(r) == list(range(1, len(r) + 1)))).all()
        hits = tot = 0
        ex = exact.groupby("query_id")["neighbor_id"].apply(set)
        for qid, grp in approx.groupby("query_id")["neighbor_id"]:
            truth = ex.get(qid, set())
            hits += len(set(grp) & truth)
            tot += len(truth)
        recall = hits / max(tot, 1)
        assert recall >= 0.6, f"recall {recall:.2f}"


class TestMinByKey:
    def test_matches_pandas_groupby_min(self, rd):
        import pandas as pd
        from pyspider_ray.neardup import min_by_key
        rng = np.random.RandomState(3)
        k = rng.randint(0, 500, size=5000).astype(np.int64)
        v = rng.randint(-10**12, 10**12, size=5000).astype(np.int64)
        ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(7)
        got = min_by_key(ds, "k", "v", n_buckets=8).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        exp = pd.DataFrame({"k": k, "v": v}).groupby("k", as_index=False) \
            .min().sort_values("k").reset_index(drop=True)
        assert (got["k"].values == exp["k"].values).all()
        assert (got["v"].values == exp["v"].values).all()

    def test_wide_int64_keys(self, rd):
        """Keys beyond 2^32 partition and reduce correctly (the
        10^10-doc id space)."""
        from pyspider_ray.neardup import min_by_key
        base = np.int64(1) << np.int64(40)
        k = np.array([base + 1, base + 1, base + 2], dtype=np.int64)
        v = np.array([7, 3, 9], dtype=np.int64)
        got = min_by_key(rd.from_arrow(pa.table({"k": k, "v": v})),
                         "k", "v").to_pandas().sort_values("k")
        assert got["v"].tolist() == [3, 9]


class TestNearDupComponents:
    def test_chain_converges_to_min_label(self, rd, tmp_path):
        """A chain component A-B-C-D (diameter 3) must collapse to one
        label even though the ends never share a pair — the case plain
        pair output under-merges.  Runs the label-propagation loop on a
        synthetic documents table whose near-dup pairs form the chain."""
        import pyarrow.parquet as pq
        from pyspider_ray.training_queries import q_near_dup_components
        # sliding 20-word windows over w0..w22: adjacent docs share 19
        # words (J=19/21~0.905 >= 0.9), two apart share 18 (J=18/22
        # ~0.818 < 0.9) — a true chain, no shortcut edges
        docs = [" ".join(f"w{i}" for i in range(d, d + 20))
                for d in range(4)]
        t = pa.table({"doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                      "text": pa.array(docs, pa.string()),
                      "lang": pa.array(["en"] * 4),
                      "source": pa.array(["t"] * 4),
                      "n_chars": pa.array([len(d) for d in docs],
                                          pa.int64())})
        pq.write_table(t, tmp_path / "documents.parquet")
        out = q_near_dup_components(str(tmp_path)).to_pandas() \
            .sort_values("doc_id")
        # every doc in one component labeled by the min id
        assert out["doc_id"].tolist() == [10, 11, 12, 13]
        assert out["component"].tolist() == [10, 10, 10, 10]


class TestMaskClassFastPath:
    """The small-vocab exact near-dup path (training_queries
    ._mask_class_near_dup): wordset classes + popcount class joins must
    equal brute force AND the general LSH path bit-for-bit."""

    def _write_docs(self, tmp_path, wide_ids=False):
        import pyarrow.parquet as pq
        rng = np.random.RandomState(11)
        vocab = [f"w{i}" for i in range(24)]
        base_id = (1 << 33) if wide_ids else 0
        ids, texts = [], []
        d = 0
        for c in range(25):  # 25 clusters of 5 variants of a base set
            size = int(rng.randint(10, 20))
            base = set(rng.choice(24, size=size, replace=False).tolist())
            for v in range(5):
                s = set(base)
                if v and len(s) > 10:
                    s.discard(sorted(s)[int(rng.randint(0, len(s)))])
                words = [vocab[i] for i in sorted(s)]
                rng.shuffle(words)
                texts.append(" ".join(words))
                ids.append(base_id + d)
                d += 1
        t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string()),
                      "lang": pa.array(["en"] * d),
                      "source": pa.array(["t"] * d),
                      "n_chars": pa.array([len(x) for x in texts],
                                          pa.int64())})
        pq.write_table(t, tmp_path / "documents.parquet")
        sets = {i: frozenset(x.split()) for i, x in zip(ids, texts)}
        exp = set()
        for i in ids:
            for j in ids:
                if i < j:
                    inter = len(sets[i] & sets[j])
                    union = len(sets[i] | sets[j])
                    if inter * 10 >= 9 * union:
                        exp.add((i, j))
        return exp

    def _run(self, tmp_path):
        from pyspider_ray.training_queries import q_jaccard_near_dup
        out = q_jaccard_near_dup(str(tmp_path)).to_pandas()
        return set(zip(out["doc_a"].tolist(), out["doc_b"].tolist()))

    def test_matches_bruteforce(self, ray_session, tmp_path):
        exp = self._write_docs(tmp_path)
        assert len(exp) > 100  # the corpus is genuinely similarity-dense
        assert self._run(tmp_path) == exp

    def test_gate_trip_falls_back_to_lsh_identically(self, ray_session,
                                                     tmp_path,
                                                     monkeypatch):
        import pyspider_ray.training_queries as tq
        exp = self._write_docs(tmp_path)
        monkeypatch.setattr(tq, "_MASK_CLASS_MAX_CLASSES", 1)
        assert self._run(tmp_path) == exp

    def test_wide_doc_ids_beyond_2_32(self, ray_session, tmp_path):
        exp = self._write_docs(tmp_path, wide_ids=True)
        got = self._run(tmp_path)
        assert got == exp
        assert min(a for a, _ in got) >= (1 << 33)


class TestDecontaminatePaths:
    def test_shuffled_path_equals_broadcast(self, ray_session, sf_dir,
                                            monkeypatch):
        """Tripping the broadcast envelope must switch to the hash
        co-partition path and produce the identical answer."""
        import pyspider_ray.training_queries as tq

        base = tq.QUERIES["decontaminate"](sf_dir).to_pandas()
        monkeypatch.setattr(tq, "_DECON_MAX_BENCH", 0)
        shuffled = tq.QUERIES["decontaminate"](sf_dir).to_pandas()
        a = base.sort_values("doc_id").reset_index(drop=True)
        b = shuffled.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b[a.columns])

    def test_curate_fallback_equals_broadcast(self, ray_session, sf_dir,
                                              monkeypatch):
        """curate_corpus through the shuffled-decontamination +
        payload-carrying anti-join path must equal the broadcast
        searchsorted path row for row."""
        import pyspider_ray.training_queries as tq

        cols = list(tq._CURATE_COLS)
        base = tq.QUERIES["curate_corpus"](sf_dir).to_pandas()
        monkeypatch.setattr(tq, "_DECON_MAX_BENCH", 0)
        fb = tq.QUERIES["curate_corpus"](sf_dir).to_pandas()
        a = base[cols].sort_values("doc_id").reset_index(drop=True)
        b = fb[cols].sort_values("doc_id").reset_index(drop=True)
        assert len(a) and a.equals(b)

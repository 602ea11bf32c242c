"""Large-scale training-data operators over the documents/embeddings
tables: dedup (exact, set-fingerprint, MinHash+LSH Jaccard, SimHash),
similarity search (brute-force cosine top-k, IVF-bucketed variant),
text analysis (token counts, stopwords, language-ID, quality), and the
multimodal decode plumbing over synthetic image pages.

SQL-expressible ops carry DuckDB oracles (integer outputs only — no
float hash hazards); approximate ops (SimHash, IVF, language-ID) are
rows-only checks.  Each stage follows the scale pattern: signatures are
computed per batch, candidate generation is a groupby over band
buckets, verification joins against a broadcast word-set index loaded
once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .functions.synthweb import mix64

STOPWORDS = ("the", "a", "of", "to", "and", "in", "is")
_MINHASH_PERMS = 126
_LSH_ROWS = 6                      # 21 bands x 6 rows: at tau=0.9 the
# per-pair miss probability is (1 - 0.9^6)^21 ~ 1.3e-7 — effectively
# exact — while low-J pairs collide far less than with r=4 bands,
# shrinking the candidate set several-fold on similarity-dense corpora
_JACCARD_TAU_NUM, _JACCARD_TAU_DEN = 9, 10   # tau = 0.9, integer compare


def _rd():
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    return rd


def _read(sf_dir, table, columns=None):
    return _rd().read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _word_hashes(words: list[str]) -> np.ndarray:
    """Stable 64-bit word hashes (md5-low64, process-independent)."""
    return np.array([int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                                    "big") for w in words], dtype=np.uint64)


_SEEDS = mix64(np.arange(_MINHASH_PERMS, dtype=np.uint64), 0xBEEF)


def minhash_signature(words: set[str]) -> np.ndarray:
    wh = _word_hashes(sorted(words))
    if not len(wh):
        return np.zeros(_MINHASH_PERMS, dtype=np.uint64)
    return mix64(wh[:, None], _SEEDS[None, :]).min(axis=0)


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_token_count(sf_dir):
    """Token counting (whitespace tokenizer), vectorized via pandas str."""
    import pandas as pd
    def counts(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.strip().str.split(r"\s+").str.len()
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "n_tokens": n.astype("int64")})
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(counts, batch_format="pandas"))


def q_stopword_count(sf_dir):
    import pandas as pd
    stop = set(STOPWORDS)
    def counts(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].str.strip().str.split(r"\s+") \
            .map(lambda ws: sum(w in stop for w in ws))
        return pd.DataFrame({"doc_id": b["doc_id"],
                             "n_stop": n.astype("int64")})
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(counts, batch_format="pandas"))


def q_quality_score(sf_dir):
    """Quality scoring heuristics (rows-only): length, mean word length,
    stopword ratio, alpha ratio — the cheap filters a 100 TB text
    pipeline runs before anything expensive."""
    import pandas as pd
    stop = set(STOPWORDS)
    word_re = re.compile(r"\s+")
    def score(b: pd.DataFrame) -> pd.DataFrame:
        texts = b["text"].str.strip()
        words = texts.str.split(word_re)
        n_tok = words.str.len().clip(lower=1)
        stop_ratio = words.map(lambda ws: sum(w in stop for w in ws)) / n_tok
        alpha = texts.str.count(r"[A-Za-z]") / texts.str.len().clip(lower=1)
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_chars_obs": texts.str.len().astype("int64"),
            "mean_word_len": (texts.str.len() - (n_tok - 1)) / n_tok,
            "stop_ratio": stop_ratio,
            "alpha_ratio": alpha,
            "keep": ((stop_ratio < 0.9) & (alpha > 0.5)).astype("int64"),
        })
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(score, batch_format="pandas"))


_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is"},
    "es": {"el", "la", "de", "que", "los"},
    "de": {"der", "die", "und", "das", "ist"},
    "fr": {"le", "la", "et", "les", "des"},
}


def q_lang_id(sf_dir):
    """Language-ID by stopword-marker voting (rows-only heuristic;
    deterministic, ties broken by language name)."""
    import pandas as pd
    def lid(b: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for t in b["text"]:
            ws = set(t.split())
            best = max(sorted(_LANG_MARKERS),
                       key=lambda l: (len(ws & _LANG_MARKERS[l]), ))
            score = len(ws & _LANG_MARKERS[best])
            preds.append(best if score else "unk")
        return pd.DataFrame({"doc_id": b["doc_id"], "pred_lang": preds})
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(lid, batch_format="pandas"))


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir):
    """Exact dedup, first-wins: hash-partition by content, keep min id."""
    from ray.data.aggregate import Min
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .groupby("text").aggregate(Min("doc_id", alias_name="doc_id")))


def q_dedup_counts(sf_dir):
    ds = _read(sf_dir, "documents", ["text"])
    total = ds.count()
    distinct = len(ds.unique("text"))
    return pa.table({"total": pa.array([total], pa.int64()),
                     "distinct_texts": pa.array([distinct], pa.int64())})


def q_wordset_dup_groups(sf_dir):
    """Near-dup at J=1.0: identical distinct-word sets, grouped by a
    canonical set fingerprint."""
    from ray.data.aggregate import Count, Min
    def fp(b: pa.Table) -> pa.Table:
        fps = []
        for t in b["text"].to_pylist():
            key = " ".join(sorted(set(t.split())))
            fps.append(hashlib.md5(key.encode()).hexdigest())
        return pa.table({"doc_id": b["doc_id"],
                         "set_fp": pa.array(fps, pa.string())})
    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(fp, batch_format="pyarrow")
            .groupby("set_fp")
            .aggregate(Min("doc_id", alias_name="rep"),
                       Count(alias_name="n")))


class _SignatureStage:
    """MinHash signatures + LSH band keys per document (one compiled
    seed table per actor)."""

    def __call__(self, b: pa.Table) -> pa.Table:
        doc_ids, bands, keys = [], [], []
        for doc_id, text in zip(b["doc_id"].to_pylist(),
                                b["text"].to_pylist()):
            sig = minhash_signature(set(text.split()))
            view = sig.reshape(-1, _LSH_ROWS)
            for band_idx in range(view.shape[0]):
                h = hashlib.md5(view[band_idx].tobytes()).digest()
                doc_ids.append(doc_id)
                bands.append(band_idx)
                keys.append(int.from_bytes(h[:8], "big", signed=True))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int64())})


class _JaccardVerify:
    """Exact Jaccard verification with a broadcast word-set index
    (loaded once per actor; at larger scale this becomes a
    co-partitioned join on doc_id).

    When the corpus vocabulary fits in <=64 distinct words each doc is a
    single uint64 bitset and the whole batch verifies vectorized
    (AND/OR + byte-wise popcount); otherwise falls back to per-pair
    set arithmetic."""

    def __init__(self, sf_dir: str):
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"])
        docs = {d: set(x.split())
                for d, x in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist())}
        vocab = sorted(set().union(*docs.values())) if docs else []
        self.sets = docs
        self.masks: dict[int, int] | None = None
        if len(vocab) <= 64:
            widx = {w: i for i, w in enumerate(vocab)}
            self.masks = {d: sum(1 << widx[w] for w in ws)
                          for d, ws in docs.items()}

    @staticmethod
    def _popcount(x: np.ndarray) -> np.ndarray:
        return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                             axis=1).sum(axis=1)

    def __call__(self, b: pa.Table) -> pa.Table:
        a_ids = b["doc_a"].to_numpy()
        b_ids = b["doc_b"].to_numpy()
        if self.masks is not None:
            ma = np.array([self.masks[i] for i in a_ids], dtype=np.uint64)
            mb = np.array([self.masks[i] for i in b_ids], dtype=np.uint64)
            inter = self._popcount(ma & mb).astype(np.int64)
            union = self._popcount(ma | mb).astype(np.int64)
            keep = inter * _JACCARD_TAU_DEN >= _JACCARD_TAU_NUM * union
            return pa.table({"doc_a": pa.array(a_ids[keep]),
                             "doc_b": pa.array(b_ids[keep])})
        out_a, out_b = [], []
        for a, c in zip(a_ids.tolist(), b_ids.tolist()):
            sa, sb = self.sets[a], self.sets[c]
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if inter * _JACCARD_TAU_DEN >= _JACCARD_TAU_NUM * union:
                out_a.append(a)
                out_b.append(c)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64())})


def q_jaccard_near_dup(sf_dir):
    """MinHash+LSH near-dup (shingle→minhash→band→bucket→candidate
    pairs→exact-Jaccard verify), tau=0.9 on word sets.  With 32 bands x
    4 rows the miss probability at tau is < 1e-14, so the verified
    output equals the exact pair set the oracle computes.

    Signature computation and verification are distributed stages; the
    bucket→pair expansion runs vectorized on the driver over the
    *compact* (band, key, doc_id) triple table — at 10^9 docs this step
    becomes one more groupby-free shuffle by (band, key), but a Ray
    Data map_groups over millions of 2-5 row buckets is the wrong tool
    at any scale (per-group overhead dominates)."""
    sigs = (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(_SignatureStage, batch_format="pyarrow",
                         concurrency=2)
            .take_all())
    band = np.array([r["band"] for r in sigs], dtype=np.int64)
    key = np.array([r["key"] for r in sigs], dtype=np.int64)
    doc = np.array([r["doc_id"] for r in sigs], dtype=np.int64)
    order = np.lexsort((doc, key, band))
    band, key, doc = band[order], key[order], doc[order]
    # run boundaries of equal (band, key)
    new_run = np.ones(len(band), dtype=bool)
    new_run[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(band))
    # vectorized within-bucket pair expansion: for a run of size m emit
    # the m*(m-1)/2 index pairs via triu coordinates, then dedup the
    # packed (a<<32|b) keys across all bands in one np.unique
    packed_parts = []
    sizes = ends - starts
    for m in np.unique(sizes):
        if m < 2:
            continue
        runs = starts[sizes == m]                   # (r,) run starts
        ii, jj = np.triu_indices(int(m), k=1)       # (p,) intra-run idx
        a = doc[runs[:, None] + ii[None, :]]        # (r, p) doc ids
        b = doc[runs[:, None] + jj[None, :]]
        lo = np.minimum(a, b).astype(np.uint64)
        hi = np.maximum(a, b).astype(np.uint64)
        packed_parts.append((lo << np.uint64(32)) | hi)
    if not packed_parts:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    packed = np.unique(np.concatenate([p.ravel() for p in packed_parts]))
    cand = pa.table({
        "doc_a": pa.array((packed >> np.uint64(32)).astype(np.int64)),
        "doc_b": pa.array((packed & np.uint64(0xFFFFFFFF)).astype(np.int64))})
    return (_rd().from_arrow(cand)
            .map_batches(_JaccardVerify,
                         fn_constructor_kwargs={"sf_dir": sf_dir},
                         batch_format="pyarrow", concurrency=2))


def q_simhash_near_dup(sf_dir):
    """SimHash-64 near-dup pairs at Hamming distance <= 6 (rows-only:
    the bit-sampling approximation has no SQL equivalent)."""
    def sim64(b: pa.Table) -> pa.Table:
        out = []
        for text in b["text"].to_pylist():
            wh = _word_hashes(sorted(set(text.split())))
            bits = ((wh[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            val = 0
            for i, v in enumerate(vote):
                if v > 0:
                    val |= (1 << i)
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pa.table({"doc_id": b["doc_id"],
                         "simhash": pa.array(out, pa.int64())})
    sigs = (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(sim64, batch_format="pyarrow").take_all())
    ids = np.array([r["doc_id"] for r in sigs])
    hs = np.array([np.uint64(r["simhash"] % (1 << 64)) for r in sigs],
                  dtype=np.uint64)
    # block by 4x16-bit bands (any pair at dist<=6 shares >=1 exact band
    # only heuristically; verify all candidates exactly)
    pairs = set()
    for shift in (0, 16, 32, 48):
        band = (hs >> np.uint64(shift)) & np.uint64(0xFFFF)
        import collections
        buckets = collections.defaultdict(list)
        for i, bnd in enumerate(band):
            buckets[int(bnd)].append(i)
        for members in buckets.values():
            for ii, x in enumerate(members):
                for y in members[ii + 1:]:
                    pairs.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    out_a, out_b = [], []
    id_to_h = dict(zip(ids.tolist(), hs.tolist()))
    for a, c in sorted(pairs):
        d = bin(int(id_to_h[a]) ^ int(id_to_h[c])).count("1")
        if d <= 6:
            out_a.append(a)
            out_b.append(c)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64())})


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_N_QUERIES = 20
_TOP_K = 5


class _CosinePartialTopK:
    """Brute-force cosine: the query matrix loads once per actor; each
    DB batch emits its local top-k per query (partial), merged by a tiny
    grouped stage after — the scale pattern for 10^9-row ANN baselines."""

    def __init__(self, sf_dir: str):
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = np.array(t["vec_id"].to_pylist())
        order = np.argsort(ids)[:_N_QUERIES]
        Q = np.array([t["embedding"].to_pylist()[i] for i in order],
                     dtype=np.float64)
        self.q_ids = ids[order]
        self.Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def __call__(self, b: pa.Table) -> pa.Table:
        E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        vec_ids = np.asarray(b["vec_id"].to_pylist())
        S = self.Q @ E.T                      # (n_q, batch)
        qs, ns, sims = [], [], []
        k = min(_TOP_K + 1, S.shape[1])
        for qi in range(S.shape[0]):
            idx = np.argpartition(-S[qi], k - 1)[:k]
            for j in idx:
                if vec_ids[j] == self.q_ids[qi]:
                    continue              # exclude self-match
                qs.append(int(self.q_ids[qi]))
                ns.append(int(vec_ids[j]))
                sims.append(float(S[qi, j]))
        return pa.table({"query_id": pa.array(qs, pa.int64()),
                         "neighbor_id": pa.array(ns, pa.int64()),
                         "sim": pa.array(sims, pa.float64())})


def q_embedding_knn(sf_dir):
    """ANN baseline: brute-force cosine top-5 for the first 20 vectors."""
    import pandas as pd
    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(_TOP_K)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id"]]
    return (_read(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(_CosinePartialTopK,
                         fn_constructor_kwargs={"sf_dir": sf_dir},
                         batch_format="pyarrow", concurrency=2)
            .groupby("query_id").map_groups(final_topk,
                                            batch_format="pandas"))


class _NearDupPairs:
    """Embedding near-dup: each batch scores against the broadcast
    full matrix (fits per-actor at these scales; the LSH/IVF variant is
    the scale path) and emits pairs with cosine >= tau, a < b."""

    TAU = 0.3

    def __init__(self, sf_dir: str):
        import pyarrow.parquet as pq
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        self.ids = np.asarray(t["vec_id"].to_pylist())
        E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        self.E = E / np.linalg.norm(E, axis=1, keepdims=True)

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = np.asarray(b["vec_id"].to_pylist())
        E = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        S = E @ self.E.T
        out_a, out_b = [], []
        for i in range(S.shape[0]):
            js = np.where(S[i] >= self.TAU)[0]
            for j in js:
                if self.ids[j] > ids[i]:
                    out_a.append(int(ids[i]))
                    out_b.append(int(self.ids[j]))
        return pa.table({"vec_a": pa.array(out_a, pa.int64()),
                         "vec_b": pa.array(out_b, pa.int64())})


def q_embedding_near_dup(sf_dir):
    return (_read(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(_NearDupPairs,
                         fn_constructor_kwargs={"sf_dir": sf_dir},
                         batch_format="pyarrow", concurrency=2))


def q_ann_ivf(sf_dir):
    """IVF-bucketed ANN variant (rows-only): coarse-quantize by the
    label column (stand-in for k-means cells), probe the 3 nearest
    cells per query, exact-rank within probed cells."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist())
    lab = np.asarray(t["label"].to_pylist())
    E = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    cells = {c: np.where(lab == c)[0] for c in np.unique(lab)}
    centroids = {c: En[idx].mean(axis=0) for c, idx in cells.items()}
    cmat = np.stack([centroids[c] for c in sorted(cells)])
    cids = sorted(cells)
    order = np.argsort(ids)[:_N_QUERIES]
    qs, ranks, ns = [], [], []
    for qi in order:
        cd = cmat @ En[qi]
        probe = [cids[j] for j in np.argsort(-cd)[:3]]
        cand = np.concatenate([cells[c] for c in probe])
        cand = cand[ids[cand] != ids[qi]]
        sims = En[cand] @ En[qi]
        top = cand[np.lexsort((ids[cand], -sims))[:_TOP_K]]
        for r, j in enumerate(top, 1):
            qs.append(int(ids[qi]))
            ranks.append(r)
            ns.append(int(ids[j]))
    return pa.table({"query_id": pa.array(qs, pa.int64()),
                     "rank": pa.array(ranks, pa.int64()),
                     "neighbor_id": pa.array(ns, pa.int64())})


# ---------------------------------------------------------------------------
# multimodal plumbing (synthetic pages; no image libs in this container)
# ---------------------------------------------------------------------------

class _DecodeResize:
    """Image decode + 8x8 thumbnail features as an actor-pool stage —
    the schema/batch plumbing is real; the codec is the sandbox codec
    (pyspider_ray.functions.imaging; real JPEG decode is stubbed there)."""

    def __init__(self):
        from .functions.imaging import decode_image
        from .functions.imaging import _block_mean_8x8
        self._decode = decode_image
        self._thumb = _block_mean_8x8

    def __call__(self, b: pa.Table) -> pa.Table:
        means, ws, hs = [], [], []
        for data in b["bytes"].to_pylist():
            px = self._decode(data)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            gray = px.astype(np.float64).mean(axis=2)
            means.append(int(round(float(self._thumb(gray).mean()))))
        return pa.table({"image_id": b["image_id"],
                         "w_obs": pa.array(ws, pa.int32()),
                         "h_obs": pa.array(hs, pa.int32()),
                         "fmt": b["fmt"],
                         "thumb_mean": pa.array(means, pa.int64())})


def q_image_decode(sf_dir):
    """Multimodal decode/feature pipeline over 200 synthetic pages
    (rows-only; deterministic from the seed)."""
    from .functions.synthweb import page_payload
    rows = [page_payload(i) for i in range(200)]
    table = pa.table({
        "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
    })
    return (_rd().from_arrow(table)
            .map_batches(_DecodeResize, batch_format="pyarrow",
                         batch_size=64, concurrency=2))


def q_image_phash_near_dup(sf_dir):
    """Image near-dup by perceptual-hash Hamming distance <= 10 over the
    synthetic page corpus + its lossy re-encodes (rows-only): the
    image-payload analogue of SimHash dedup.  Each batch computes
    pHashes in an actor stage; the small 64-bit signature table collapses
    on the driver for pairing (at corpus scale: band the hash into 4x16
    bit keys and groupby, as in q_jaccard_near_dup)."""
    from .functions.imaging import fjpg_decode, fjpg_encode, phash64
    from .functions.synthweb import page_pixels

    def hashes(b: pa.Table) -> pa.Table:
        out = []
        for iid in b["image_id"].to_pylist():
            base, _, variant = iid.partition(":")
            url_id = int(base.split("-")[1])
            px = page_pixels(url_id)
            if variant == "lossy":
                px = fjpg_decode(fjpg_encode(px))
            out.append(phash64(px))
        return pa.table({"image_id": b["image_id"],
                         "phash": pa.array(out, pa.int64())})

    ids = [f"img-{i:012d}" for i in range(100)] + \
          [f"img-{i:012d}:lossy" for i in range(100)]
    table = pa.table({"image_id": pa.array(ids, pa.string())})
    sig = (_rd().from_arrow(table)
           .map_batches(hashes, batch_format="pyarrow", batch_size=50)
           .take_all())
    items = [(r["image_id"], np.uint64(r["phash"] % (1 << 64)))
             for r in sig]
    out_a, out_b = [], []
    for i in range(len(items)):
        for j in range(i + 1, len(items)):
            d = bin(int(items[i][1]) ^ int(items[j][1])).count("1")
            if d <= 10:
                out_a.append(items[i][0])
                out_b.append(items[j][0])
    return pa.table({"image_a": pa.array(out_a, pa.string()),
                     "image_b": pa.array(out_b, pa.string())})


def q_crawl_order(sf_dir):
    """Frontier emission order on a 200-id synthetic web (rows-only;
    the ordering contract itself is pinned by the pytest suite)."""
    import shutil
    from .pipelines import CrawlConfig, CrawlPipeline
    out = "/tmp/pyspider_ray_q_crawl"
    shutil.rmtree(out, ignore_errors=True)
    pipe = CrawlPipeline(CrawlConfig(total=200, n_seeds=8, n_shards=4,
                                     use_ray=False, out_dir=out,
                                     loop_limit=100))
    pipe.seed()
    pipe.run(max_rounds=100)
    order = pipe.emitted_order()
    return pa.table({"seq": pa.array(range(len(order)), pa.int64()),
                     "taskid": pa.array(order, pa.string())})


ORACLES: dict[str, str] = {
    "token_count": r"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents
    """,
    "stopword_count": r"""
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                   x -> x IN ('the','a','of','to','and','in','is'))) AS n_stop
        FROM documents
    """,
    "dedup_exact": """
        SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "dedup_counts": """
        SELECT count(*) AS total, count(DISTINCT text) AS distinct_texts
        FROM documents
    """,
    "wordset_dup_groups": r"""
        SELECT md5(array_to_string(list_sort(list_distinct(
                   regexp_split_to_array(trim(text), '\s+'))), ' ')) AS set_fp,
               min(doc_id) AS rep, count(*) AS n
        FROM documents GROUP BY 1
    """,
    "jaccard_near_dup": r"""
        WITH w AS (
            SELECT DISTINCT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS word
            FROM documents),
        sizes AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
            FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT da AS doc_a, db AS doc_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = da
        JOIN sizes sb ON sb.doc_id = db
        WHERE i * 10 >= 9 * (sa.sz + sb.sz - i)
    """,
    "embedding_knn": """
        WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                   FROM embeddings ORDER BY vec_id LIMIT 20)
        SELECT query_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY list_cosine_similarity(
                       qe::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                       e.vec_id) AS rank,
               e.vec_id AS neighbor_id
        FROM q, embeddings e
        WHERE e.vec_id <> query_id
        QUALIFY rank <= 5
    """,
    "embedding_near_dup": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= 0.3
    """,
}

QUERIES = {
    "token_count": q_token_count,
    "stopword_count": q_stopword_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "dedup_exact": q_dedup_exact,
    "dedup_counts": q_dedup_counts,
    "wordset_dup_groups": q_wordset_dup_groups,
    "jaccard_near_dup": q_jaccard_near_dup,
    "simhash_near_dup": q_simhash_near_dup,
    "embedding_knn": q_embedding_knn,
    "embedding_near_dup": q_embedding_near_dup,
    "ann_ivf": q_ann_ivf,
    "image_decode": q_image_decode,
    "image_phash_near_dup": q_image_phash_near_dup,
    "crawl_order": q_crawl_order,
}

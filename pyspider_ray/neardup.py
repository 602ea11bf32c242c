"""Distributed candidate-pair machinery for banded near-dup dedup
(MinHash+LSH, SimHash multi-index, pHash multi-index).

The scale shape (SURVEY.md §2.7 + the 100 TB brief):

1. signatures are computed per batch in an actor/task stage;
2. each doc emits (band, key) rows — ``flat_map``-style fan-out;
3. candidate generation co-locates complete (band, key) buckets by a
   coarse deterministic hash, then expands runs vectorized
   (``np.triu_indices`` over lexsorted runs);
4. pair dedup across bands is a second hash exchange keyed on the
   (lo, hi) pair values — packed into one uint64 word on the wire when
   doc ids fit 32 bits, carried as (n, 2) int64 columns beyond that
   (the 10^10-doc envelope);
5. exact verification re-joins the pair table against the signature /
   document table on doc_a then doc_b — a partitioned hash join; no
   stage broadcasts the corpus.

The exchanges run as a MANUAL two-stage hash shuffle on raw Ray tasks
(the SURVEY's case-(c) escape hatch) rather than
``groupby().map_groups``: the map side splits every block into P
partition sub-tables (``num_returns=P``); the reduce side concats one
partition and processes it.  Two reasons, both measured at sf0.1:

- Ray Data's sort-based groupby spent ~70 s sorting the 37 M-row pair
  table that hash partitioning moves without any sort;
- these tasks unpickle ``pyspider_ray`` and therefore run with the
  package's allocator tuning (``_malloc.py``) — on virtualized hosts
  the first-touch page faults of fresh numpy/Arrow pages are the
  dominant cold-run cost, and Ray Data's internal shuffle tasks can't
  be tuned from library code.

Partitioning contract: every (band, key) bucket lands WHOLLY in one
reduce partition (the hash is over the bucket key, never the doc), so
pair expansion sees complete buckets; P bounds per-reduce-task memory
at O(rows/P + hottest bucket).  At cluster scale P should be ~total
cores; object transfer is the plasma store exactly as a Dataset
shuffle would use it.

Skew note: a degenerate band key (e.g. the empty-document signature)
produces a quadratic bucket; callers cap buckets with ``max_bucket``
the way production MinHash dedup drops stop-buckets.  Drops are never
silent: the expand task logs (count, member rows, hottest size) per
partition through the ``pyspider_ray.neardup`` logger.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ._malloc import prefault_arena

_GOLD = np.uint64(0x9E3779B97F4A7C15)
_GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _expand_runs(band: np.ndarray, key: np.ndarray, doc: np.ndarray,
                 max_bucket: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized within-bucket pair expansion over lexsorted triples;
    returns (lo, hi) int64 pair columns (lo < hi).  Works for the full
    int64 doc-id space — packing into one word, when the ids allow it,
    is the transport layer's concern (``_pack_pairs``)."""
    if len(band) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    order = np.lexsort((doc, key, band))
    band, key = band[order], key[order]
    doc_s = doc[order].astype(np.int64)
    new_run = np.ones(len(band), dtype=bool)
    new_run[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(band))
    sizes = ends - starts
    if max_bucket:
        keepable = sizes <= max_bucket
        dropped = sizes[~keepable]
        if len(dropped):
            # stop-bucket cap accounting: dropped buckets are LOGGED,
            # never silent (the 100 TB skew contract) — the count and
            # the hottest size tell the operator whether the cap bit
            import logging
            logging.getLogger("pyspider_ray.neardup").warning(
                "max_bucket=%d dropped %d hot bucket(s) "
                "(%d member rows, hottest %d)",
                max_bucket, len(dropped), int(dropped.sum()),
                int(dropped.max()))
        starts, sizes = starts[keepable], sizes[keepable]
    total = int((sizes.astype(np.int64) * (sizes - 1) // 2).sum())
    lo_out = np.empty(total, dtype=np.int64)
    hi_out = np.empty(total, dtype=np.int64)
    pos = 0
    for m in np.unique(sizes):
        if m < 2:
            continue
        runs = starts[sizes == m]
        ii, jj = np.triu_indices(int(m), k=1)
        a = doc_s[(runs[:, None] + ii[None, :]).ravel()]
        b = doc_s[(runs[:, None] + jj[None, :]).ravel()]
        n = a.size
        lo_out[pos:pos + n] = np.minimum(a, b)
        hi_out[pos:pos + n] = np.maximum(a, b)
        pos += n
    return lo_out, hi_out


_NARROW_MAX = np.int64(1) << np.int64(32)


def _pack_pairs(lo: np.ndarray, hi: np.ndarray):
    """Transport/dedup format for a pair column: packed uint64
    (lo<<32 | hi) when every doc id fits 32 bits (half the exchange
    bytes, one-word np.unique), else a C-contiguous (n, 2) int64 array
    — the >2^32-doc fallback for 10^10-URL frontiers.  Mixed
    representations meet safely in ``_nd_pair_unique``: partition
    routing hashes (lo, hi) VALUES (``_pair_hash``), never the packed
    word, so both formats route a given pair identically."""
    if len(hi) == 0 or (hi.max() < _NARROW_MAX and lo.max() < _NARROW_MAX
                        and min(lo.min(), hi.min()) >= 0):
        u = lo.astype(np.uint64) << np.uint64(32)
        return u | hi.astype(np.uint64)
    return np.ascontiguousarray(np.stack([lo, hi], axis=1))


def _unpack_pairs(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if p.ndim == 2:
        return p[:, 0], p[:, 1]
    return ((p >> np.uint64(32)).astype(np.int64),
            (p & np.uint64(0xFFFFFFFF)).astype(np.int64))


def _pair_hash(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Partition hash over pair VALUES — identical whichever transport
    representation carries the pair."""
    with np.errstate(over="ignore"):
        h = (lo.astype(np.uint64) * _GOLD) ^ (hi.astype(np.uint64) * _GOLD2)
        h ^= h >> np.uint64(29)
    return h


def _dedup_pairs(lo: np.ndarray, hi: np.ndarray):
    """Distinct (lo, hi) rows via lexsort + adjacent-diff (the wide-id
    path's np.unique equivalent); returns sorted pairs."""
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    keep = np.ones(len(lo), dtype=bool)
    keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    return lo[keep], hi[keep]


def _key_bucket(k: np.ndarray, n_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (k.astype(np.uint64) * _GOLD) >> np.uint64(31)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _split_table(t: pa.Table, ids: np.ndarray, P: int) -> tuple:
    """Partition an Arrow table into P sub-tables by int partition id
    (one stable argsort + P zero-copy slices of the gathered table)."""
    order = np.argsort(ids, kind="stable")
    bounds = np.searchsorted(ids[order], np.arange(P + 1))
    taken = t.take(pa.array(order)).combine_chunks()
    return tuple(taken.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
                 for p in range(P))


def _block_refs(ds) -> list:
    """ObjectRefs of a Dataset's Arrow blocks (materializes the input —
    the exchange needs the complete block list; blocks stay in the
    object store, nothing lands on the driver)."""
    refs = []
    for bundle in ds.materialize().iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    return refs


def _grouped_block_refs(ds, target_bytes: int = 64 << 20,
                        min_tasks: int = 8) -> list[list]:
    """Group a Dataset's block refs into map-task work lists of
    ~``target_bytes`` each (small blocks coalesce — a split task per
    tiny block drowns the exchange in per-object overhead, measured 2x
    at sf0.1), keeping at least ``min_tasks`` groups for parallelism."""
    refs, sizes = [], []
    for bundle in ds.materialize().iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows == 0:
                # empty blocks carry a ZERO-COLUMN schema (Ray Data
                # skips the map fn on empty batches), and a task group
                # of only-empty blocks would concat to a columnless
                # table — drop them; they contribute nothing anyway
                continue
            refs.append(ref)
            sizes.append(meta.size_bytes or 0)
    if not refs:
        return []
    total = sum(sizes)
    n_tasks = max(1, min(len(refs),
                         max(min_tasks, int(total // target_bytes))))
    groups: list[list] = [[] for _ in range(n_tasks)]
    order = np.argsort(sizes)[::-1]          # greedy largest-first
    load = np.zeros(n_tasks)
    for i in order:
        g = int(np.argmin(load))
        groups[g].append(refs[i])
        load[g] += sizes[i]
    return [g for g in groups if g]


# -- exchange tasks (module-level: registered once, unpickled with the
#    package so _malloc tuning is active inside them) -----------------------

@ray.remote
def _nd_split_bands(P: int, *blocks) -> tuple:
    prefault_arena()
    t = pa.concat_tables(blocks)
    band = t["band"].to_numpy().astype(np.uint64)
    key = t["key"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (band * _GOLD) ^ (key * _GOLD2)
        h ^= h >> np.uint64(29)
    return _split_table(t, (h % np.uint64(P)).astype(np.int64), P)


@ray.remote
def _nd_expand(P: int, max_bucket: int, *parts) -> tuple:
    """Reduce side of exchange 1 fused with the map side of exchange 2:
    expand this partition's complete buckets, locally dedup, and
    pre-partition the packed pairs by pair hash."""
    prefault_arena()
    g = pa.concat_tables(parts)
    lo, hi = _expand_runs(g["band"].to_numpy().astype(np.int64),
                          g["key"].to_numpy(), g["doc_id"].to_numpy(),
                          max_bucket=max_bucket)
    packed = _pack_pairs(lo, hi)
    if packed.ndim == 1:                       # narrow: one-word dedup
        packed = np.unique(packed)
        lo, hi = _unpack_pairs(packed)
    else:                                      # wide (>2^32 doc ids)
        lo, hi = _dedup_pairs(lo, hi)
        packed = _pack_pairs(lo, hi)
    ids = (_pair_hash(lo, hi) % np.uint64(P)).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    sp = packed[order]
    bounds = np.searchsorted(ids[order], np.arange(P + 1))
    return tuple(np.ascontiguousarray(sp[bounds[p]:bounds[p + 1]])
                 for p in range(P))


def _expand_bipartite_runs(band: np.ndarray, key: np.ndarray,
                           doc: np.ndarray, isq: np.ndarray,
                           max_bucket: int = 0
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Within-bucket query x corpus expansion over lexsorted rows
    (queries sort to each run's tail); returns ORDERED (query, corpus)
    int64 pair columns, self-pairs excluded.  Full int64 id space —
    transport packing is ``_pack_pairs``' concern.  The Python loop
    runs only over buckets that contain a query."""
    qs = np.empty(0, dtype=np.int64)
    cs = np.empty(0, dtype=np.int64)
    if not len(band):
        return qs, cs
    order = np.lexsort((doc, isq, key, band))       # queries sort last
    band, key = band[order], key[order]
    doc, isq = doc[order], isq[order]
    new_run = np.ones(len(band), dtype=bool)
    new_run[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(band))
    nq = np.add.reduceat(isq, starts).astype(np.int64)
    nc = (ends - starts) - nq
    produce = (nq > 0) & (nc > 0)
    if max_bucket:
        hot = produce & (nc > max_bucket)
        if hot.any():
            import logging
            logging.getLogger("pyspider_ray.neardup").warning(
                "max_bucket=%d dropped %d hot bipartite bucket(s) "
                "(%d corpus rows, hottest %d)",
                max_bucket, int(hot.sum()), int(nc[hot].sum()),
                int(nc[hot].max()))
            produce &= ~hot
    q_parts, c_parts = [], []
    for s, e, k in zip(starts[produce], ends[produce], nq[produce]):
        corpus = doc[s:e - k]
        queries = doc[e - k:e]
        q_parts.append(np.repeat(queries, len(corpus)))
        c_parts.append(np.tile(corpus, int(k)))
    if q_parts:
        qs = np.concatenate(q_parts)
        cs = np.concatenate(c_parts)
        keep = qs != cs                              # no self-match
        qs, cs = qs[keep], cs[keep]
    return qs, cs


@ray.remote
def _nd_expand_bipartite(P: int, max_bucket: int, *parts) -> tuple:
    """Reduce side of the BIPARTITE bucket exchange (query x corpus —
    the many-queries ANN-LSH scale path): within each complete
    (band, key) bucket, pair every query member with every non-self
    corpus member.  Ordered pairs (query, corpus) — no lo/hi
    canonicalization — then local dedup + pair-hash pre-partition,
    exactly like ``_nd_expand``.  The loop below runs only over
    buckets that CONTAIN a query (≤ tables x queries / P iterations),
    never over the corpus."""
    prefault_arena()
    g = pa.concat_tables(parts)
    qs, cs = _expand_bipartite_runs(
        g["band"].to_numpy().astype(np.int64),
        g["key"].to_numpy().astype(np.int64),
        g["doc_id"].to_numpy().astype(np.int64),
        g["is_q"].to_numpy().astype(bool), max_bucket=max_bucket)
    packed = _pack_pairs(qs, cs)
    if packed.ndim == 1:                             # narrow ids
        packed = np.unique(packed)
        qs, cs = _unpack_pairs(packed)
    else:                                            # >2^32 ids
        qs, cs = _dedup_pairs(qs, cs)
        packed = _pack_pairs(qs, cs)
    ids = (_pair_hash(qs, cs) % np.uint64(P)).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    sp = packed[order]
    bounds = np.searchsorted(ids[order], np.arange(P + 1))
    return tuple(np.ascontiguousarray(sp[bounds[p]:bounds[p + 1]])
                 for p in range(P))


@ray.remote
def _nd_pair_unique(*parts) -> pa.Table:
    """Reduce side of exchange 2: global pair dedup within a partition
    (a pair's hash pins it to exactly one partition)."""
    prefault_arena()
    arrs = [a for a in parts if len(a)]
    if not arrs:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    if all(a.ndim == 1 for a in arrs):         # narrow: one-word dedup
        p = np.unique(np.concatenate(arrs))
        lo, hi = _unpack_pairs(p)
    else:   # ≥1 wide part: normalize every part to (lo, hi) columns
        los, his = zip(*(_unpack_pairs(a) for a in arrs))
        lo, hi = _dedup_pairs(np.concatenate(los), np.concatenate(his))
    return pa.table({"doc_a": pa.array(lo), "doc_b": pa.array(hi)})


@ray.remote
def _nd_split_by_key(col: str, P: int, *blocks) -> tuple:
    prefault_arena()
    t = pa.concat_tables(blocks)
    return _split_table(t, _key_bucket(t[col].to_numpy(), P), P)


@ray.remote
def _nd_group_apply(key_col: str, fn, schema: pa.Schema,
                    *parts) -> pa.Table:
    """Reduce side of group_apply: one stable argsort per partition,
    then ``fn`` applied to each contiguous same-key run.  The key hash
    pins every key to exactly one partition, so runs are whole
    groups."""
    prefault_arena()
    parts = [p for p in parts if len(p)]
    if not parts:
        return schema.empty_table()
    t = pa.concat_tables(parts)
    k = t[key_col].to_numpy().astype(np.int64)
    order = np.argsort(k, kind="stable")
    t = t.take(pa.array(order)).combine_chunks()
    ks = k[order]
    bounds = np.flatnonzero(ks[1:] != ks[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(ks)]))
    outs = [fn(t.slice(int(s), int(e - s)))
            for s, e in zip(starts, ends)]
    return pa.concat_tables(outs) if outs else schema.empty_table()


@ray.remote
def _nd_partition_apply(fn, schema: pa.Schema, *parts) -> pa.Table:
    """Reduce side of partition_apply: ``fn`` applied ONCE to the
    whole concatenated partition (fn must itself handle a mix of keys
    — e.g. a per-key pandas merge/groupby inside).  The key hash pins
    every key to exactly one partition, so partition-local per-key
    results are global."""
    prefault_arena()
    parts = [p for p in parts if len(p)]
    if not parts:
        return schema.empty_table()
    out = fn(pa.concat_tables(parts))
    return out if len(out) else schema.empty_table()


def partition_apply(ds, key_col: str, fn, schema: pa.Schema,
                    n_buckets: int = 32):
    """Like group_apply, but ``fn`` runs once per hash PARTITION, not
    once per key group — for vectorized fns that already group
    internally (pandas merge / groupby).  High-cardinality keys (a
    vocabulary) pay 1 fn call per partition instead of 1 per key."""
    import ray.data as rd
    P = max(2, n_buckets)
    groups = _grouped_block_refs(ds)
    if not groups:
        return rd.from_arrow(schema.empty_table())
    splits = [_nd_split_by_key.options(num_returns=P)
              .remote(key_col, P, *g) for g in groups]
    outs = [_nd_partition_apply.remote(fn, schema,
                                       *(s[p] for s in splits))
            for p in range(P)]
    return rd.from_arrow_refs(outs)


def group_apply(ds, key_col: str, fn, schema: pa.Schema,
                n_buckets: int = 32):
    """Sort-free distributed map_groups over an int64 key with a
    DECLARED output schema: two-stage hash exchange (split each block
    by key hash, one reduce per partition applies ``fn`` to every
    whole group).  Unlike Dataset.groupby().map_groups() this never
    range-sorts the dataset and never emits schema-less empty blocks
    (Ray's sort shuffle produces those whenever partitions outnumber
    distinct keys, tripping the RefBundle schema warning)."""
    import ray.data as rd
    P = max(2, n_buckets)
    groups = _grouped_block_refs(ds)
    if not groups:
        return rd.from_arrow(schema.empty_table())
    splits = [_nd_split_by_key.options(num_returns=P)
              .remote(key_col, P, *g) for g in groups]
    outs = [_nd_group_apply.remote(key_col, fn, schema,
                                   *(s[p] for s in splits))
            for p in range(P)]
    return rd.from_arrow_refs(outs)


@ray.remote
def _nd_min_by_key(key_col: str, val_col: str, *parts) -> pa.Table:
    """Reduce side of a groupby-min exchange: per distinct key, the
    minimum value — one lexsort + adjacent-diff per partition, no
    Python per-group loop.  The key hash pins every key to exactly one
    partition, so partition-local minima are global minima."""
    prefault_arena()
    t = pa.concat_tables(parts)
    if not len(t):
        return pa.table({key_col: pa.array([], pa.int64()),
                         val_col: pa.array([], pa.int64())})
    k = t[key_col].to_numpy().astype(np.int64)
    v = t[val_col].to_numpy().astype(np.int64)
    order = np.lexsort((v, k))
    k, v = k[order], v[order]
    first = np.ones(len(k), dtype=bool)
    first[1:] = k[1:] != k[:-1]
    return pa.table({key_col: pa.array(k[first]),
                     val_col: pa.array(v[first])})


def min_by_key(ds, key_col: str, val_col: str, n_buckets: int = 32):
    """Distributed groupby-min over (key, value) int64 rows via the
    manual hash exchange (no sort-based groupby: hash partitioning
    moves the rows without ordering them).  Returns a Dataset with one
    row per distinct key.  Per-reduce memory is O(rows/P)."""
    import ray.data as rd
    P = max(2, n_buckets)
    groups = _grouped_block_refs(ds)
    if not groups:
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64()),
                                       val_col: pa.array([], pa.int64())}))
    splits = [_nd_split_by_key.options(num_returns=P)
              .remote(key_col, P, *g) for g in groups]
    outs = [_nd_min_by_key.remote(key_col, val_col,
                                  *(s[p] for s in splits))
            for p in range(P)]
    return rd.from_arrow_refs(outs)


@ray.remote
def _nd_hash_join(left_on: str, right_on: str, how: str, suffix: str,
                  schema: pa.Schema, n_left: int, *parts) -> pa.Table:
    """Reduce side of ``hash_join``: both sides' partition-p slices
    arrive together (left slices first, ``n_left`` of them), one
    pandas merge resolves the whole partition.  The key hash pins
    every key to exactly one partition, so partition-local joins are
    global."""
    prefault_arena()
    import pandas as pd

    def _pdf(tables):
        # int64 → pandas nullable Int64: a left-join miss must become
        # <NA>, NOT a float64 NaN — float promotion silently corrupts
        # payloads > 2^53 (doc-id hashes span the full int64 range)
        return pa.concat_tables(tables).to_pandas(
            types_mapper={pa.int64(): pd.Int64Dtype()}.get)

    lt = [p for p in parts[:n_left] if len(p)]
    rt = [p for p in parts[n_left:] if len(p)]
    if not lt:
        return schema.empty_table()
    ldf = _pdf(lt)
    if how in ("semi", "anti"):
        keys = (pc.drop_null(pa.concat_tables(rt)[right_on])
                .to_numpy(zero_copy_only=False)
                if rt else np.empty(0, np.int64))
        hit = np.isin(ldf[left_on].to_numpy(np.int64), np.unique(keys))
        out = ldf[~hit] if how == "anti" else ldf[hit]
    else:
        if not rt:
            if how == "inner":
                return schema.empty_table()
            out = ldf.copy()                    # left join, no matches
            for name in schema.names:
                if name not in out.columns:
                    out[name] = None
        else:
            rdf = _pdf(rt)
            out = ldf.merge(rdf, how=how, left_on=left_on,
                            right_on=right_on, suffixes=("", suffix))
            if right_on != left_on:
                # the merged right-key column kept its name unless it
                # collided with a LEFT column and took the suffix —
                # dropping the bare name there would delete left data
                merged_key = (right_on + suffix
                              if right_on in ldf.columns else right_on)
                out = out.drop(columns=[merged_key])
    arrays = [pa.Array.from_pandas(out[name], type=typ)
              for name, typ in zip(schema.names, schema.types)]
    return pa.Table.from_arrays(arrays, schema=schema)


def hash_join(left, right, left_on: str, right_on: str | None = None,
              how: str = "inner", n_buckets: int = 32,
              suffix: str = "_r"):
    """General co-partitioned hash join of two Datasets with
    ARBITRARY (different) schemas on an int64 key — the library
    primitive behind the repo's tagged-union join queries, exposed
    directly: ``hash_join(orders, customer, "o_custkey", "c_custkey")``.

    ``how``: 'inner' | 'left' | 'semi' | 'anti'.  Inner/left emit
    left columns + right payload columns (right key dropped when
    named differently; clashing payload names get ``suffix``); with
    'left', unmatched right-side int columns surface as Arrow nulls
    (never NaN-floats — the output schema is pinned from the input
    schemas, identical across partitions).  Semi/anti emit left rows
    verbatim.

    Scale shape: one sort-free hash exchange per side (each input
    block splits by key hash; reduce p merges both sides' p-slices
    with one vectorized pandas merge) — no broadcast, no global sort;
    per-reduce memory is O(rows/P + matches/P).  Skew caveat: a key's
    ENTIRE match set lands in one reduce — pre-aggregate hot keys
    (the per-batch-combiner pattern) before joining, as the repo's
    reporting queries do."""
    import ray.data as rd
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    right_on = right_on or left_on
    P = max(2, n_buckets)

    lschema = left.schema()
    lschema = pa.schema(list(zip(lschema.names, lschema.types)))
    if how in ("semi", "anti"):
        out_schema = lschema
    else:
        rs = right.schema()
        fields = list(zip(lschema.names, lschema.types))
        taken = {n for n, _ in fields}
        for name, typ in zip(rs.names, rs.types):
            if name == right_on:
                continue
            out = name if name not in taken else name + suffix
            if out in taken:
                # pandas would raise MergeError mid-task; fail fast
                # with the fix spelled out instead
                raise ValueError(
                    f"hash_join column collision: right column "
                    f"{name!r} suffixes to {out!r}, which the left "
                    f"side already has — rename a column or pass a "
                    f"different suffix")
            fields.append((out, typ))
            taken.add(out)
        out_schema = pa.schema(fields)

    lgroups = _grouped_block_refs(left)
    rgroups = _grouped_block_refs(right)
    if not lgroups:
        return rd.from_arrow(out_schema.empty_table())
    lsplits = [_nd_split_by_key.options(num_returns=P)
               .remote(left_on, P, *g) for g in lgroups]
    rsplits = [_nd_split_by_key.options(num_returns=P)
               .remote(right_on, P, *g) for g in rgroups]
    outs = [_nd_hash_join.remote(
        left_on, right_on, how, suffix, out_schema, len(lsplits),
        *(s[p] for s in lsplits), *(s[p] for s in rsplits))
        for p in range(P)]
    return rd.from_arrow_refs(outs)


@ray.remote
def _nd_attach(side: str, sig_col: str, out_col: str, n_pair_parts: int,
               *parts) -> pa.Table:
    """Reduce side of the partitioned hash join: attach ``sig_col`` of
    the ``side`` doc onto each pair row (inner-join semantics: pairs
    whose key is absent from the signature side are dropped)."""
    prefault_arena()
    pairs = pa.concat_tables(parts[:n_pair_parts])
    sigs = pa.concat_tables(parts[n_pair_parts:])
    if not len(pairs):
        return pairs.append_column(
            out_col, pa.nulls(0, sigs.schema.field(sig_col).type))
    keys = sigs["doc_id"].to_numpy()
    order = np.argsort(keys)
    ks = keys[order]
    vals = sigs[sig_col].combine_chunks().take(pa.array(order))
    pk = pairs[side].to_numpy()
    idx = np.searchsorted(ks, pk)
    ok = idx < len(ks)
    idx = np.minimum(idx, max(len(ks) - 1, 0))
    ok &= (ks[idx] == pk) if len(ks) else False
    out = pairs.filter(pa.array(ok))
    return out.append_column(out_col, vals.take(pa.array(idx[ok])))


# -- public API -------------------------------------------------------------

def candidate_pairs(sig_ds, n_buckets: int = 64, max_bucket: int = 0):
    """(band, key, doc_id) Dataset → distinct candidate-pair Dataset
    with columns (doc_a, doc_b).

    Manual two-stage hash exchange (module docstring): exchange 1
    co-locates complete (band, key) buckets and expands them
    vectorized; exchange 2 dedups pairs that surfaced in several bands
    with one np.unique per pair partition.  Nothing touches the driver
    and no task holds more than one partition.  ``max_bucket`` drops
    degenerate hot buckets (stop-bucket capping under skew)."""
    import ray.data as rd
    groups = _grouped_block_refs(sig_ds)
    P = max(2, n_buckets)
    if not groups:
        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64())}))
    splits = [_nd_split_bands.options(num_returns=P).remote(P, *g)
              for g in groups]
    expanded = [_nd_expand.options(num_returns=P)
                .remote(P, max_bucket, *(s[p] for s in splits))
                for p in range(P)]
    finals = [_nd_pair_unique.remote(*(e[p] for e in expanded))
              for p in range(P)]
    return rd.from_arrow_refs(finals)


def bipartite_candidate_pairs(sig_ds, n_buckets: int = 64,
                              max_bucket: int = 0):
    """(band, key, doc_id, is_q) Dataset → distinct ORDERED candidate
    pairs (doc_a = query, doc_b = corpus member) — the asymmetric
    variant of :func:`candidate_pairs` for many-queries ANN search:
    query and corpus signature rows meet in co-located (band, key)
    buckets; each bucket emits its query x corpus cross product
    (self-pairs excluded); the second exchange dedups pairs that
    collided in several tables.  Same partitioning contract, same
    stop-bucket cap (``max_bucket`` bounds the CORPUS side of a
    bucket), nothing touches the driver."""
    import ray.data as rd
    groups = _grouped_block_refs(sig_ds)
    P = max(2, n_buckets)
    if not groups:
        return rd.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64())}))
    splits = [_nd_split_bands.options(num_returns=P).remote(P, *g)
              for g in groups]
    expanded = [_nd_expand_bipartite.options(num_returns=P)
                .remote(P, max_bucket, *(s[p] for s in splits))
                for p in range(P)]
    finals = [_nd_pair_unique.remote(*(e[p] for e in expanded))
              for p in range(P)]
    return rd.from_arrow_refs(finals)


def attach_column(pair_ds, sig_ds, sig_col: str, side: str, out_col: str,
                  n_buckets: int = 32):
    """Partitioned hash join: bring ``sig_col`` of the ``side`` doc onto
    each pair row.  Both sides split by the same coarse key hash; each
    join task sees one co-partition (state O(rows/P), never a broadcast
    key set).  Inner-join semantics: pairs whose key is absent from
    sig_ds are dropped."""
    import ray.data as rd
    P = max(2, n_buckets)
    pair_groups = _grouped_block_refs(pair_ds)
    sig_groups = _grouped_block_refs(sig_ds)
    if not pair_groups or not sig_groups:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        return rd.from_arrow(empty)
    psplits = [_nd_split_by_key.options(num_returns=P).remote(side, P, *g)
               for g in pair_groups]
    ssplits = [_nd_split_by_key.options(num_returns=P)
               .remote("doc_id", P, *g) for g in sig_groups]
    outs = [_nd_attach.remote(side, sig_col, out_col, len(psplits),
                              *(s[p] for s in psplits),
                              *(s[p] for s in ssplits))
            for p in range(P)]
    return rd.from_arrow_refs(outs)


def join_signatures(pair_ds, sig_ds, sig_col: str,
                    num_partitions: int = 32):
    """Attach a per-doc signature column to both sides of a pair table
    via two partitioned hash joins (the no-broadcast verify path).
    ``num_partitions`` is the partition count per join."""
    sig_ds = sig_ds.materialize()   # read once, feed both attaches
    a = attach_column(pair_ds, sig_ds, sig_col, "doc_a", f"{sig_col}_a",
                      n_buckets=num_partitions)
    return attach_column(a, sig_ds, sig_col, "doc_b", f"{sig_col}_b",
                         n_buckets=num_partitions)


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

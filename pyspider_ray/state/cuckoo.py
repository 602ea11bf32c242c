"""Cuckoo filter: approximate membership prefilter for the URL-seen set.

The reference dedups implicitly through taskdb point lookups
(pyspider/scheduler/scheduler.py:813-823).  At 10^10-URL frontier scale
an exact lookup per candidate link is the bottleneck, so each frontier
shard keeps (a) this cuckoo filter as a no-false-negative fast path —
a miss proves "never seen", skipping the exact check for the ~95% of
candidate links that are new — and (b) the exact per-shard set, which
stays authoritative (the acceptance bar is bit-for-bit URL-seen parity,
BASELINE.md).

Standard construction (Fan et al., "Cuckoo Filter: Practically Better
Than Bloom", CoNEXT 2014): buckets of 4 fingerprints, partial-key
cuckoo hashing with alt-bucket = bucket XOR hash(fp), bounded eviction
chain.  numpy storage: one uint16 array, fingerprint 0 = empty slot.
"""

from __future__ import annotations

import numpy as np

_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 42):
        # power-of-two bucket count, 4 slots/bucket, ~95% target load
        n_buckets = 1
        while n_buckets * 4 * 0.95 < capacity:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.count = 0
        self.saturated = False
        self._seed = np.uint64(seed)
        self._rng = np.random.default_rng(seed)

    # -- hashing ------------------------------------------------------------
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (keys ^ self._seed) * np.uint64(0xC2B2AE3D27D4EB4F)
            h ^= h >> np.uint64(29)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 is the empty marker

    def _bucket1(self, keys: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = keys * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(32)
        return (h % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt_bucket(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)
        return ((bucket.astype(np.uint64) ^ h) % np.uint64(self.n_buckets)).astype(np.int64)

    # -- operations ---------------------------------------------------------
    def add_many(self, keys: np.ndarray) -> int:
        """Vectorized bulk insert: hashing is computed for the whole batch
        in numpy; slot placement is a tight index loop.  Once the table
        saturates (an eviction chain fails) further inserts become no-ops
        — membership then under-reports, which is safe: the exact store
        is authoritative and a cuckoo miss only skips the fast path."""
        if self.saturated:
            return 0
        arr = np.asarray(keys, dtype=np.int64).view(np.uint64)
        fps = self._fingerprint(arr)
        b1s = self._bucket1(arr)
        b2s = self._alt_bucket(b1s, fps)
        table = self.table
        inserted = 0
        for fp, b1, b2 in zip(fps, b1s, b2s):
            placed = False
            for b in (b1, b2):
                row = table[b]
                for slot in range(4):
                    if row[slot] == 0:
                        row[slot] = fp
                        placed = True
                        break
                if placed:
                    break
            if placed:
                inserted += 1
                continue
            if self._evict_insert(int(b1), int(b2), fp):
                inserted += 1
            else:
                self.saturated = True
                break
        self.count += inserted
        return inserted

    def _evict_insert(self, b1: int, b2: int, fp) -> bool:
        b = b1 if self._rng.integers(2) else b2
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(4))
            cur, self.table[b, slot] = self.table[b, slot], cur
            b = int(self._alt_bucket(np.asarray([b]), np.asarray([cur]))[0])
            empty = np.where(self.table[b] == 0)[0]
            if empty.size:
                self.table[b, empty[0]] = cur
                return True
        return False

    def add(self, key: int) -> bool:
        if self.saturated:
            return False
        arr = np.asarray([key], dtype=np.int64).view(np.uint64)
        fp = self._fingerprint(arr)[0]
        b1 = int(self._bucket1(arr)[0])
        b2 = int(self._alt_bucket(np.asarray([b1]), np.asarray([fp]))[0])
        for b in (b1, b2):
            empty = np.where(self.table[b] == 0)[0]
            if empty.size:
                self.table[b, empty[0]] = fp
                self.count += 1
                return True
        if self._evict_insert(b1, b2, fp):
            self.count += 1
            return True
        self.saturated = True  # fall back to exact store only
        return False

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership; True may be a false positive, False is
        definitive (no false negatives).

        Once the filter saturates, add() becomes a no-op, so a later-added
        key would otherwise return False — breaking the no-false-negative
        contract. A saturated filter therefore answers all-True (callers
        must fall back to the exact store for every key)."""
        if self.saturated:
            return np.ones(len(np.atleast_1d(keys)), dtype=bool)
        arr = np.asarray(keys, dtype=np.int64).view(np.uint64)
        fp = self._fingerprint(arr)
        b1 = self._bucket1(arr)
        b2 = self._alt_bucket(b1, fp)
        hit1 = (self.table[b1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def __contains__(self, key: int) -> bool:
        return bool(self.contains_many(np.asarray([key]))[0])

    def __len__(self) -> int:
        return self.count

    # -- checkpoint ---------------------------------------------------------
    def snapshot(self) -> dict:
        return {"table": self.table.tobytes(), "n_buckets": self.n_buckets,
                "count": self.count, "seed": int(self._seed),
                "saturated": self.saturated}

    @classmethod
    def restore(cls, snap: dict) -> "CuckooFilter":
        cf = cls.__new__(cls)
        cf.n_buckets = snap["n_buckets"]
        cf.table = np.frombuffer(snap["table"], dtype=np.uint16).reshape(
            cf.n_buckets, 4).copy()
        cf.count = snap["count"]
        cf.saturated = snap.get("saturated", False)
        cf._seed = np.uint64(snap["seed"])
        cf._rng = np.random.default_rng(snap["seed"])
        return cf

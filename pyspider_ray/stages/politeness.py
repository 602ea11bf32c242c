"""Per-host politeness gate: token buckets + robots rules (T3/T4/O5).

The reference rate-limits per *project* (one Bucket per TaskQueue,
task_queue.py:142) and checks robots.txt per domain inside the fetcher
with a 1 h TTL cache (tornado_fetcher.py:289-324); a disallowed URL
becomes a 403 error result (tornado_fetcher.py:360-363).  This graft
promotes politeness to host granularity (the north rule): each host
gets its own bucket; tasks that exceed a host's budget this round are
*deferred* (re-queued with a short exetime), robots-disallowed tasks
are *blocked* (403 result, no fetch).

Deterministic: buckets run on the virtual clock; admission processes
tasks in the coordinator's emission order, so under a fixed politeness
budget the admitted sequence is reproducible bit-for-bit.

At cluster scale this object lives sharded inside an actor pool keyed
by host hash (each host's bucket has exactly one owner); the driver
version here is the n=1 instance of that layout.
"""

from __future__ import annotations

from typing import Callable

from ..state.clock import wall_clock
from ..state.token_bucket import TokenBucket


class HostPolicy:
    def __init__(self, rate: float = 10.0, burst: float = 20.0,
                 robots_disallow: tuple[str, ...] = ()):
        self.rate = rate
        self.burst = burst
        self.robots_disallow = tuple(robots_disallow)


class PolitenessGate:
    def __init__(self, default_policy: HostPolicy | None = None,
                 host_policies: dict[str, HostPolicy] | None = None,
                 clock: Callable[[], float] = wall_clock,
                 defer_delay: float = 1.0,
                 robots_cache=None):
        self.default_policy = default_policy or HostPolicy()
        self.host_policies = host_policies or {}
        self._clock = clock
        self.defer_delay = defer_delay
        self._buckets: dict[str, TokenBucket] = {}
        # optional fetched+parsed robots.txt with TTL (stages.robots);
        # overrides the static prefix rules when set
        self.robots_cache = robots_cache

    def policy(self, host: str) -> HostPolicy:
        return self.host_policies.get(host, self.default_policy)

    def _bucket(self, host: str) -> TokenBucket:
        b = self._buckets.get(host)
        if b is None:
            pol = self.policy(host)
            b = TokenBucket(rate=pol.rate, burst=pol.burst, clock=self._clock)
            self._buckets[host] = b
        return b

    def robots_allowed(self, host: str, url: str) -> bool:
        """Robots check: the fetched+parsed RobotsCache (TTL'd,
        tornado_fetcher.py:289-324 parity) when configured, else the
        static prefix rules from the politeness config table
        (FIXTURES.md F5)."""
        if self.robots_cache is not None:
            return self.robots_cache.allowed(host, url)
        rules = self.policy(host).robots_disallow
        if not rules:
            return True
        path = url.split(host, 1)[-1] if host and host in url else url
        return not any(path.startswith(rule) for rule in rules)

    def _bucket_for(self, task: dict) -> TokenBucket:
        """Bucket owning this task's admission (overridden by the
        sharded gate for hot-host splitting)."""
        return self._bucket(task.get("host") or "")

    def _observe_demand(self, tasks: list[dict]) -> None:
        pass   # hook for the sharded gate's hot-host detector

    def admit(self, tasks: list[dict]) -> tuple[list[dict], list[dict], list[dict]]:
        """Split an emission-ordered fetch batch into
        (admitted, deferred, robots_blocked); consumes one token per
        admitted task from its host bucket."""
        self._observe_demand(tasks)
        admitted: list[dict] = []
        deferred: list[dict] = []
        blocked: list[dict] = []
        for task in tasks:
            host = task.get("host") or ""
            url = task.get("url") or ""
            if not host or url.startswith("data:"):
                admitted.append(task)  # control tasks bypass politeness
                continue
            if (task.get("fetch") or {}).get("robots_txt", True) and \
                    not self.robots_allowed(host, url):
                blocked.append(task)
                continue
            bucket = self._bucket_for(task)
            if bucket.get() >= 1:
                bucket.desc()
                admitted.append(task)
            else:
                deferred.append(task)
        return admitted, deferred, blocked

    # -- checkpoint ----------------------------------------------------------
    def snapshot(self) -> dict:
        snap = {"buckets": {h: b.snapshot()
                            for h, b in self._buckets.items()},
                "defer_delay": self.defer_delay}
        if self.robots_cache is not None:
            # a resumed crawl must honor the ORIGINAL robots TTL
            # schedule — without this every host refetched at first
            # admission after resume, applying a mid-TTL robots change
            # earlier than the uninterrupted run would have
            snap["robots"] = self.robots_cache.snapshot()
        return snap

    def restore_buckets(self, snap: dict) -> None:
        for host, bsnap in snap.get("buckets", {}).items():
            self._buckets[host] = TokenBucket.restore(bsnap, self._clock)
        self.defer_delay = snap.get("defer_delay", self.defer_delay)
        if self.robots_cache is not None and "robots" in snap:
            self.robots_cache.restore_state(snap["robots"])


class ShardedPolitenessGate(PolitenessGate):
    """Host-partitioned politeness with HOT-HOST SPLITTING — the
    north-rule skew path for 10^10-URL frontiers.

    Layout: host buckets hash-partition across ``n_shards`` owners
    (each shard is one politeness actor on a real cluster; here the
    shard dicts model that ownership and record per-shard admission
    counts so tests can assert the load spread).  A cold host's bucket
    lives on exactly one shard — per-host rate semantics identical to
    the plain gate.

    Hot-host splitting: when one host's demand in a single admission
    round exceeds ``hot_threshold``, its bucket splits into
    ``split_factor`` sub-buckets keyed ``(host, urlhash % k)``, each
    carrying ``rate/k`` / ``burst/k`` and hashed to (generally)
    different shards — the aggregate admission rate for the host is
    preserved (k x rate/k) while no single shard serializes the hot
    host's admissions.  Token quantization makes sub-bucket admission
    order differ slightly from the single-bucket order within a round;
    the per-host aggregate rate over any window is unchanged.
    """

    def __init__(self, *args, n_shards: int = 4, hot_threshold: int = 256,
                 split_factor: int = 4, **kwargs):
        super().__init__(*args, **kwargs)
        self.n_shards = n_shards
        self.hot_threshold = hot_threshold
        self.split_factor = split_factor
        self.split_hosts: dict[str, int] = {}      # host -> k
        self.shard_admits = [0] * n_shards         # accounting (tests/UI)

    def _shard_of(self, key: str) -> int:
        import hashlib
        return int.from_bytes(hashlib.md5(key.encode()).digest()[:4],
                              "big") % self.n_shards

    def _observe_demand(self, tasks: list[dict]) -> None:
        if not self.hot_threshold:
            return
        demand: dict[str, int] = {}
        for t in tasks:
            host = t.get("host") or ""
            if host:
                demand[host] = demand.get(host, 0) + 1
        for host, n in demand.items():
            if n > self.hot_threshold and host not in self.split_hosts:
                self.split_hosts[host] = self.split_factor

    def _bucket_for(self, task: dict) -> TokenBucket:
        host = task.get("host") or ""
        k = self.split_hosts.get(host, 1)
        if k <= 1:
            self.shard_admits[self._shard_of(host)] += 1
            return self._bucket(host)
        sub = int(task.get("urlhash", 0)) % k
        key = f"{host}#{sub}"
        self.shard_admits[self._shard_of(key)] += 1
        b = self._buckets.get(key)
        if b is None:
            pol = self.policy(host)
            b = TokenBucket(rate=pol.rate / k, burst=max(pol.burst / k, 1.0),
                            clock=self._clock)
            self._buckets[key] = b
        return b

    # -- checkpoint ----------------------------------------------------------
    def snapshot(self) -> dict:
        snap = super().snapshot()
        snap["split_hosts"] = dict(self.split_hosts)
        return snap

    def restore_buckets(self, snap: dict) -> None:
        super().restore_buckets(snap)
        self.split_hosts.update(snap.get("split_hosts", {}))

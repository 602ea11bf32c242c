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

    def admit(self, tasks: list[dict]) -> tuple[list[dict], list[dict], list[dict]]:
        """Split an emission-ordered fetch batch into
        (admitted, deferred, robots_blocked); consumes one token per
        admitted task from its host bucket."""
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
            bucket = self._bucket(host)
            if bucket.get() >= 1:
                bucket.desc()
                admitted.append(task)
            else:
                deferred.append(task)
        return admitted, deferred, blocked

    # -- checkpoint ----------------------------------------------------------
    def snapshot(self) -> dict:
        return {"buckets": {h: b.snapshot() for h, b in self._buckets.items()},
                "defer_delay": self.defer_delay}

    def restore_buckets(self, snap: dict) -> None:
        for host, bsnap in snap.get("buckets", {}).items():
            self._buckets[host] = TokenBucket.restore(bsnap, self._clock)
        self.defer_delay = snap.get("defer_delay", self.defer_delay)

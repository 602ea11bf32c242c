"""Fetched-and-parsed robots.txt cache with TTL (T4) — the reference
fetches ``/robots.txt`` per domain, parses it with RobotFileParser and
re-fetches after ``robot_txt_age`` seconds
(fetcher/tornado_fetcher.py:289-324).  Here the fetch is a pluggable
callable (``fetch_fn(host) -> str``) so the sandboxed synthetic web
serves deterministic robots bodies and a real HTTP fetcher slots in
unchanged outside the sandbox.

At cluster scale one ``RobotsCache`` lives inside each politeness-gate
shard (hosts are hash-partitioned, so each host's cache entry has one
owner and the TTL refetch happens once per host per hour, not once per
worker)."""

from __future__ import annotations

from typing import Callable
from urllib.robotparser import RobotFileParser

from ..state.clock import wall_clock


class RobotsCache:
    def __init__(self, fetch_fn: Callable[[str], str],
                 ttl: float = 60 * 60,
                 clock: Callable[[], float] = wall_clock,
                 user_agent: str = "pyspider-ray"):
        self.fetch_fn = fetch_fn
        self.ttl = ttl
        self._clock = clock
        self.user_agent = user_agent
        self._cache: dict[str, tuple[float, RobotFileParser]] = {}
        self._bodies: dict[str, str] = {}
        self.fetch_count = 0

    def _get_parser(self, host: str) -> RobotFileParser:
        now = self._clock()
        hit = self._cache.get(host)
        if hit is not None and now - hit[0] <= self.ttl:
            return hit[1]
        try:
            content = self.fetch_fn(host) or ""
        except Exception:
            content = ""     # fetch error → allow-all (reference :305-310)
        self.fetch_count += 1
        parser = RobotFileParser()
        parser.parse(content.splitlines())
        self._cache[host] = (now, parser)
        self._bodies[host] = content
        return parser

    def allowed(self, host: str, url: str,
                user_agent: str | None = None) -> bool:
        return self._get_parser(host).can_fetch(
            user_agent or self.user_agent, url)

    def clear_expired(self) -> None:
        """clear_robot_txt_cache (tornado_fetcher.py:320-324)."""
        now = self._clock()
        for host in [h for h, (t, _) in self._cache.items()
                     if now - t > self.ttl]:
            del self._cache[host]
            self._bodies.pop(host, None)

    # -- checkpoint ----------------------------------------------------------
    def snapshot(self) -> dict:
        """Persist per-host (fetch_time, raw robots body); restore
        rebuilds parsers from the bodies, so a resumed crawl honors the
        original TTL schedule instead of refetching every host."""
        return {"hosts": {h: [t, self._bodies.get(h, "")]
                          for h, (t, _) in self._cache.items()},
                "ttl": self.ttl}

    def restore_state(self, snap: dict) -> None:
        """In-place restore into an EXISTING cache — the politeness
        gate's checkpoint path, where fetch_fn/clock are already
        bound.  Hosts with legacy time-only entries (no stored body)
        are skipped: installing an empty allow-all parser pinned at
        the original fetch time would silently ignore disallow rules
        until TTL expiry, so those refetch on demand instead."""
        self.ttl = snap.get("ttl", self.ttl)
        for host, entry in (snap.get("hosts") or {}).items():
            if not isinstance(entry, (list, tuple)):
                continue
            t, body = entry
            parser = RobotFileParser()
            parser.parse((body or "").splitlines())
            self._cache[host] = (float(t), parser)
            self._bodies[host] = body or ""

    @classmethod
    def restore(cls, snap: dict, fetch_fn, clock=wall_clock) -> "RobotsCache":
        rc = cls(fetch_fn, ttl=snap.get("ttl", 3600), clock=clock)
        rc.restore_state(snap)
        return rc

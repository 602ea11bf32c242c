"""Token-bucket rate limiter with the reference's refill semantics.

Behavioral parity with pyspider/scheduler/token_bucket.py:15-56:
tokens accrue at ``rate``/sec capped at ``burst``; the lazy refill on
``get()`` only applies when more than one whole token has accrued
(token_bucket.py:41-45), and a bucket at/above burst just resets its
refill timestamp.  Differences: the clock is injectable (virtual time
for deterministic crawls) and there is no lock — each bucket lives
inside exactly one actor.
"""

from __future__ import annotations

from typing import Callable

from .clock import wall_clock


class TokenBucket:
    def __init__(self, rate: float = 1.0, burst: float | None = None,
                 clock: Callable[[], float] = wall_clock):
        self.rate = float(rate)
        self.burst = float(rate) * 10 if burst is None else float(burst)
        self._clock = clock
        self._level = self.burst
        self._stamp = clock()

    def get(self) -> float:
        """Current token count, refilling lazily (>=1 whole token only)."""
        now = self._clock()
        if self._level >= self.burst:
            self._stamp = now
            return self._level
        accrued = self.rate * (now - self._stamp)
        if accrued > 1:
            self._level = min(self._level + accrued, self.burst)
            self._stamp = now
        return self._level

    def set(self, value: float) -> None:
        self._level = value

    def desc(self, value: float = 1) -> None:
        """Consume ``value`` tokens (may go negative, as in the reference)."""
        self._level -= value

    # -- checkpoint support -------------------------------------------------
    def snapshot(self) -> dict:
        return {"rate": self.rate, "burst": self.burst,
                "level": self._level, "stamp": self._stamp}

    @classmethod
    def restore(cls, snap: dict, clock: Callable[[], float] = wall_clock) -> "TokenBucket":
        b = cls(snap["rate"], snap["burst"], clock)
        b._level = snap["level"]
        b._stamp = snap["stamp"]
        return b

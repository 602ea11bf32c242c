"""Deterministic time & sequence sources.

The reference keys every scheduling decision off wall-clock
(``time.time()`` in pyspider/scheduler/task_queue.py:205 and
token_bucket.py:31) and a process-global atomic counter
(``AtomInt``, task_queue.py:28-38).  For reproducible, distributed
execution both become injectable: a virtual clock advanced by the
driver round loop, and a sequence source whose values the driver
assigns deterministically per (round, shard, intra-batch index).
"""

from __future__ import annotations

import itertools
import time


class VirtualClock:
    """Monotonic logical clock. ``now()`` is stable until ``advance()``."""

    def __init__(self, start: float = 1_700_000_000.0):
        self._t = float(start)

    def now(self) -> float:
        return self._t

    def advance(self, dt: float) -> float:
        assert dt >= 0, "virtual time cannot go backwards"
        self._t += dt
        return self._t

    def set(self, t: float) -> None:
        """Jump to an absolute time (used to sync shard-actor clocks and
        to restore from checkpoint)."""
        assert t >= self._t, "virtual time cannot go backwards"
        self._t = float(t)

    def __call__(self) -> float:  # usable directly as a clock callable
        return self._t


def wall_clock() -> float:
    return time.time()


class SequenceSource:
    """Deterministic replacement for the reference's global AtomInt
    (task_queue.py:28-38): strictly increasing ints used as the FIFO
    tiebreaker.  ``base`` lets the driver partition the sequence space
    per (round, shard) so interleaved shards stay reproducible."""

    def __init__(self, base: int = 0):
        self._counter = itertools.count(base + 1)

    def next(self) -> int:
        return next(self._counter)

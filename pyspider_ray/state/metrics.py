"""Windowed metrics (T7/A3/A4): per-(project, key) event counters over
multiple sliding windows, virtual-clock driven.

Same observable semantics as pyspider/libs/counter.py:

- ``TotalCounter``             — monotonic total (counter.py:51-72)
- ``WindowedCounter``          — sum/avg over the trailing
  ``window_size x window_interval`` seconds, with an interval-grained
  cache bucket exactly like ``TimebaseAverageWindowCounter``
  (counter.py:188-265): events accumulate into the current interval
  bucket; buckets older than the window are trimmed lazily; ``avg`` is
  per-second over the (ramping) window.
- ``MetricsHub``               — the CounterManager role
  (counter.py:271-441): (project, key) → counter per named window,
  driver-side merge point for per-shard partial counts, JSON
  dump/load for the 60-second checkpoint (scheduler.py:616-628).

The distributed pattern is partial/final: shards keep plain int
partials (FrontierShard.counters); each round the coordinator pulls the
deltas and feeds them here — no cross-actor shared counter.
"""

from __future__ import annotations

import json
from collections import deque
from typing import Callable

from .clock import wall_clock


class TotalCounter:
    def __init__(self, clock=None):
        self.cnt = 0

    def event(self, value: float = 1) -> "TotalCounter":
        self.cnt += value
        return self

    def value(self, value: float) -> None:
        self.cnt = value

    @property
    def sum(self) -> float:
        return self.cnt

    @property
    def avg(self) -> float:
        return self.cnt

    def empty(self) -> bool:
        return self.cnt == 0

    def snapshot(self) -> dict:
        return {"type": "total", "cnt": self.cnt}


class AverageWindowCounter:
    """Last-N-values window (counter.py:75-100): avg/sum over the most
    recent ``window_size`` events, no time component."""

    def __init__(self, window_size: int = 300):
        self.values: deque = deque(maxlen=window_size)

    def event(self, value: float = 1) -> "AverageWindowCounter":
        self.values.append(value)
        return self

    value = event

    @property
    def sum(self) -> float:
        return sum(self.values)

    @property
    def avg(self) -> float:
        return self.sum / len(self.values) if self.values else 0.0

    def empty(self) -> bool:
        return not self.values


class WindowedCounter:
    def __init__(self, window_size: int = 30, window_interval: int = 10,
                 clock: Callable[[], float] = wall_clock):
        self.max_window_size = window_size
        self.window_size = 0.0
        self.window_interval = window_interval
        self._clock = clock
        self.values: deque = deque(maxlen=window_size)
        self.times: deque = deque(maxlen=window_size)
        self.cache_value = 0.0
        self.cache_start: float | None = None
        self._first_data_time: float | None = None

    def event(self, value: float = 1) -> "WindowedCounter":
        now = self._clock()
        if self._first_data_time is None:
            self._first_data_time = now
        if self.cache_start is None:
            self.cache_value = value
            self.cache_start = now
        elif now - self.cache_start > self.window_interval:
            self.values.append(self.cache_value)
            self.times.append(self.cache_start)
            self.cache_value = value
            self.cache_start = now
        else:
            self.cache_value += value
        return self

    def _trim(self) -> None:
        now = self._clock()
        if self.cache_start is not None and \
                now - self.cache_start > self.window_interval:
            self.values.append(self.cache_value)
            self.times.append(self.cache_start)
            self.cache_value = 0.0
            self.cache_start = None
        if self.window_size != self.max_window_size and \
                self._first_data_time is not None:
            passed = now - self._first_data_time
            self.window_size = min(self.max_window_size,
                                   passed / self.window_interval)
        limit = now - self.window_size * self.window_interval
        while self.times and self.times[0] < limit:
            self.times.popleft()
            self.values.popleft()

    @property
    def sum(self) -> float:
        self._trim()
        return sum(self.values) + self.cache_value

    @property
    def avg(self) -> float:
        """Events per second over the ramped window (counter.py:253-258)."""
        total = float(self.sum)
        if not self.window_size:
            return 0.0
        return total / self.window_size / self.window_interval

    def empty(self) -> bool:
        self._trim()
        return not self.values and self.cache_start is None


class MetricsHub:
    """(project, key) counters across named windows + top-k reports."""

    WINDOWS = {"5m": (30, 10), "1h": (60, 60), "1d": (600, 144),
               "all": None}

    def __init__(self, clock: Callable[[], float] = wall_clock):
        self._clock = clock
        self._counters: dict[tuple[str, str, str], object] = {}

    def _get(self, window: str, project: str, key: str):
        k = (window, project, key)
        c = self._counters.get(k)
        if c is None:
            spec = self.WINDOWS[window]
            c = TotalCounter() if spec is None else \
                WindowedCounter(spec[0], spec[1], self._clock)
            self._counters[k] = c
        return c

    def event(self, project: str, key: str, value: float = 1) -> None:
        for window in self.WINDOWS:
            self._get(window, project, key).event(value)

    def ingest_shard_deltas(self, deltas: dict[tuple[str, str], int]) -> None:
        """Partial/final merge: per-shard counter deltas → all windows."""
        for (project, key), value in deltas.items():
            if value:
                self.event(project, key, value)

    def to_dict(self, window: str, kind: str = "sum") -> dict:
        out: dict[str, dict[str, float]] = {}
        for (w, project, key), c in self._counters.items():
            if w != window:
                continue
            out.setdefault(project, {})[key] = getattr(c, kind)
        return out

    def top_projects(self, n_fails: int = 2, n_actives: int = 3,
                     window: str = "5m") -> dict:
        """A4 — top-2 failing + top-3 active projects
        (scheduler.py:578-614)."""
        keywords = ("pending", "success", "retry", "failed")
        data = self.to_dict(window, "sum")
        actives, fails = [], []
        for project, counts in data.items():
            act = sum(counts.get(k, 0) for k in keywords)
            actives.append((act, project))
            if counts.get("failed"):
                fails.append((counts["failed"], project))
        top_fails = sorted(fails, reverse=True)[:n_fails]
        fail_names = {p for _, p in top_fails}
        top_actives = sorted((x for x in actives if x[1] not in fail_names),
                             reverse=True)[:n_fails + n_actives - len(top_fails)]
        return {"top_fails": top_fails, "top_actives": top_actives}

    # -- persistence (60 s dump, scheduler.py:616-628) -----------------------
    def dump(self, path: str) -> None:
        state = []
        for (w, project, key), c in self._counters.items():
            if isinstance(c, TotalCounter):
                state.append([w, project, key, {"cnt": c.cnt}])
            else:
                state.append([w, project, key, {
                    "values": list(c.values), "times": list(c.times),
                    "cache_value": c.cache_value,
                    "cache_start": c.cache_start,
                    "first": c._first_data_time,
                    "window_size": c.window_size}])
        with open(path, "w") as f:
            json.dump(state, f)

    def load(self, path: str) -> None:
        with open(path) as f:
            state = json.load(f)
        for w, project, key, payload in state:
            c = self._get(w, project, key)
            if isinstance(c, TotalCounter):
                c.cnt = payload["cnt"]
            else:
                c.values = deque(payload["values"], maxlen=c.max_window_size)
                c.times = deque(payload["times"], maxlen=c.max_window_size)
                c.cache_value = payload["cache_value"]
                c.cache_start = payload["cache_start"]
                c._first_data_time = payload["first"]
                c.window_size = payload["window_size"]

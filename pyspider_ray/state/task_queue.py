"""Frontier priority queue with pyspider's exact ordering contract.

Re-implements (from scratch, over a virtual clock) the semantics of
pyspider/scheduler/task_queue.py:

- ready entries (exetime == 0) order by **priority DESC, then sequence
  ASC** (strict FIFO inside a priority level); delayed entries order by
  **exetime ASC, then sequence** (``InQueueTask.__cmp__``,
  task_queue.py:55-66);
- putting an id that is already queued *merges*: ``priority = max``,
  ``exetime = min``, keeping the original sequence, re-heapifying only
  when the merge improved the entry's position
  (``PriorityTaskQueue._put``, task_queue.py:83-95);
- three sub-queues: ready heap, time heap (future exetime), processing
  heap keyed by a deadline of ``now + processing_timeout`` (default
  600 s, task_queue.py:135); ``check_update`` promotes due / timed-out
  entries back to the ready heap (task_queue.py:160-188);
- a put for an id currently *processing* is dropped
  (task_queue.py:214-217);
- ``get()`` is gated by a token bucket and moves the popped entry to the
  processing heap (task_queue.py:227-242).

Golden tests ported from tests/test_task_queue.py and
tests/test_scheduler.py:20-74 run against this class.
"""

from __future__ import annotations

import heapq
from typing import Callable, Optional

from .clock import SequenceSource, wall_clock
from .token_bucket import TokenBucket


class QueueEntry:
    __slots__ = ("taskid", "priority", "exetime", "sequence", "dead")

    def __init__(self, taskid: str, priority: int = 0, exetime: float = 0,
                 sequence: int = 0):
        self.taskid = taskid
        self.priority = priority
        self.exetime = exetime
        self.sequence = sequence
        self.dead = False  # tombstone for lazy heap deletion

    def __lt__(self, other: "QueueEntry") -> bool:
        if self.exetime == 0 and other.exetime == 0:
            if self.priority != other.priority:
                return self.priority > other.priority
        elif self.exetime != other.exetime:
            return self.exetime < other.exetime
        return self.sequence < other.sequence

    def __repr__(self):
        return (f"QueueEntry({self.taskid!r}, pri={self.priority}, "
                f"exe={self.exetime}, seq={self.sequence})")


class MergingHeap:
    """Heap + id index where same-id puts merge instead of duplicating."""

    def __init__(self):
        self._heap: list[QueueEntry] = []
        self._by_id: dict[str, QueueEntry] = {}

    def __len__(self):
        return len(self._by_id)

    def __contains__(self, taskid: str) -> bool:
        return taskid in self._by_id

    def __getitem__(self, taskid: str) -> QueueEntry:
        return self._by_id[taskid]

    def put(self, entry: QueueEntry) -> None:
        existing = self._by_id.get(entry.taskid)
        if existing is not None:
            improved = entry < existing
            existing.priority = max(existing.priority, entry.priority)
            existing.exetime = min(existing.exetime, entry.exetime)
            if improved:
                heapq.heapify(self._heap)
        else:
            heapq.heappush(self._heap, entry)
            self._by_id[entry.taskid] = entry

    def pop(self) -> Optional[QueueEntry]:
        while self._heap:
            entry = heapq.heappop(self._heap)
            if entry.dead or self._by_id.get(entry.taskid) is not entry:
                continue
            del self._by_id[entry.taskid]
            return entry
        return None

    def peek(self) -> Optional[QueueEntry]:
        while self._heap and self._heap[0].dead:
            heapq.heappop(self._heap)
        return self._heap[0] if self._heap else None

    def discard(self, taskid: str) -> bool:
        entry = self._by_id.pop(taskid, None)
        if entry is None:
            return False
        entry.dead = True
        return True

    def entries(self) -> list[QueueEntry]:
        return list(self._by_id.values())

    def peek_n(self, n: int) -> list[QueueEntry]:
        """Top-n live entries in heap order WITHOUT removing them:
        lazily pop n live entries (purging tombstones on the way) and
        push them back — O(n log size) per call, never a full scan of
        the ready set."""
        popped: list[QueueEntry] = []
        heap = self._heap
        while heap and len(popped) < n:
            e = heapq.heappop(heap)
            if e.dead or self._by_id.get(e.taskid) is not e:
                continue  # tombstone/stale: drop permanently
            popped.append(e)
        for e in popped:
            heapq.heappush(heap, e)
        return popped


class TaskQueue:
    """Per-project (or per-shard) frontier queue: ready + delayed +
    processing, rate-limited by a token bucket."""

    processing_timeout = 10 * 60

    def __init__(self, rate: float = 0, burst: float = 0,
                 clock: Callable[[], float] = wall_clock,
                 sequence: SequenceSource | None = None):
        self._clock = clock
        self._seq = sequence or SequenceSource()
        self.ready = MergingHeap()
        self.delayed = MergingHeap()
        self.processing = MergingHeap()
        self.bucket = TokenBucket(rate=rate, burst=burst, clock=clock)

    # rate/burst passthrough (scheduler updates these on project change,
    # scheduler.py:120-124)
    @property
    def rate(self) -> float:
        return self.bucket.rate

    @rate.setter
    def rate(self, value: float) -> None:
        self.bucket.rate = value

    @property
    def burst(self) -> float:
        return self.bucket.burst

    @burst.setter
    def burst(self, value: float) -> None:
        self.bucket.burst = value

    def put(self, taskid: str, priority: int = 0, exetime: float = 0,
            sequence: int | None = None) -> None:
        now = self._clock()
        seq = self._seq.next() if sequence is None else sequence
        entry = QueueEntry(taskid, priority, exetime, seq)
        if taskid in self.ready:
            self.ready.put(entry)
        elif taskid in self.delayed:
            self.delayed.put(entry)
        elif taskid in self.processing:
            pass  # modifying an in-flight task is disallowed (task_queue.py:214-217)
        elif exetime and exetime > now:
            self.delayed.put(entry)
        else:
            entry.exetime = 0
            self.ready.put(entry)

    def check_update(self) -> None:
        self._promote_due()
        self._requeue_timed_out()

    def _promote_due(self) -> None:
        now = self._clock()
        while True:
            top = self.delayed.peek()
            if top is None or top.exetime >= now:
                break
            entry = self.delayed.pop()
            entry.exetime = 0
            self.ready.put(entry)

    def _requeue_timed_out(self) -> None:
        now = self._clock()
        while True:
            top = self.processing.peek()
            if top is None or top.exetime >= now:
                break
            entry = self.processing.pop()
            entry.exetime = 0
            self.ready.put(entry)

    def get(self) -> Optional[str]:
        """Pop the next ready taskid if a politeness token is available;
        the entry moves to processing with a timeout deadline."""
        if self.bucket.get() < 1:
            return None
        entry = self.ready.pop()
        if entry is None:
            return None
        self.bucket.desc()
        entry.exetime = self._clock() + self.processing_timeout
        self.processing.put(entry)
        return entry.taskid

    def peek_ready(self, n: int) -> list[tuple[str, int, int]]:
        """Top-n ready entries as (taskid, priority, sequence) WITHOUT
        popping — the shard half of a cross-shard k-way merge select.
        Does not consume politeness tokens.  O(n log ready), not
        O(ready): at a 10^6-entry ready heap the select round stays
        O(budget)."""
        return [(e.taskid, e.priority, e.sequence)
                for e in self.ready.peek_n(n)]

    def take(self, taskid: str) -> bool:
        """Pop a specific ready entry (chosen by the coordinator's merge)
        into processing.  Token accounting happens at the coordinator's
        project-level bucket, mirroring the reference's single
        per-project bucket (task_queue.py:227-242)."""
        if taskid not in self.ready:
            return False
        old = self.ready[taskid]
        self.ready.discard(taskid)  # leaves a tombstone in the ready heap
        moved = QueueEntry(taskid, old.priority,
                           self._clock() + self.processing_timeout,
                           old.sequence)
        self.processing.put(moved)
        return True

    def done(self, taskid: str) -> bool:
        return self.processing.discard(taskid)

    def delete(self, taskid: str) -> bool:
        if taskid in self.ready:
            return self.ready.discard(taskid)
        if taskid in self.delayed:
            return self.delayed.discard(taskid)
        if taskid in self.processing:
            return self.done(taskid)
        return False

    def is_processing(self, taskid: str) -> bool:
        return taskid in self.processing

    def size(self) -> int:
        return len(self.ready) + len(self.delayed) + len(self.processing)

    def __len__(self) -> int:
        return self.size()

    def __contains__(self, taskid: str) -> bool:
        return (taskid in self.ready or taskid in self.delayed
                or taskid in self.processing)

    # -- checkpoint support -------------------------------------------------
    def snapshot(self) -> dict:
        def dump(h: MergingHeap):
            return [(e.taskid, e.priority, e.exetime, e.sequence)
                    for e in h.entries()]
        return {"ready": dump(self.ready), "delayed": dump(self.delayed),
                "processing": dump(self.processing),
                "bucket": self.bucket.snapshot(),
                "processing_timeout": self.processing_timeout}

    @classmethod
    def restore(cls, snap: dict, clock: Callable[[], float] = wall_clock,
                sequence: SequenceSource | None = None) -> "TaskQueue":
        tq = cls(clock=clock, sequence=sequence)
        tq.bucket = TokenBucket.restore(snap["bucket"], clock)
        tq.processing_timeout = snap["processing_timeout"]
        for name in ("ready", "delayed", "processing"):
            heap = getattr(tq, name)
            for taskid, priority, exetime, seq in snap[name]:
                heap.put(QueueEntry(taskid, priority, exetime, seq))
        return tq

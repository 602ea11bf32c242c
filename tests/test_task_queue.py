"""Golden ordering scenarios ported from the reference test-suite
(tests/test_scheduler.py:20-92 and tests/test_task_queue.py), run on a
virtual clock instead of wall-clock sleeps."""

import queue as Queue

import pytest

from pyspider_ray.state import TaskQueue, TokenBucket, VirtualClock

T0 = 1_700_000_000.0


def make_tq(rate=100000, burst=100000, timeout=0.5):
    clock = VirtualClock(T0)
    tq = TaskQueue(rate=rate, burst=burst, clock=clock)
    tq.processing_timeout = timeout
    return tq, clock


class TestTaskQueueScenario:
    """tests/test_scheduler.py:20-74 — exact pop order under mixed
    priority / exetime / processing-timeout."""

    def test_scenario(self):
        tq, clock = make_tq()
        # test_10_put
        tq.put("a3", 0, clock.now() + 0.5)
        tq.put("a4", 3, clock.now() + 0.2)
        tq.put("a2", 0)
        tq.put("a1", 1)
        assert tq.size() == 4
        # test_20_update: merge-on-put
        tq.put("a2", 4)          # a2 already ready -> priority max(0,4)=4
        assert tq.size() == 4
        tq.put("a3", 2, 0)       # a3 delayed -> exetime min -> promoted order
        assert tq.size() == 4
        # test_30: a2 wins (priority 4)
        assert tq.get() == "a2"
        assert tq.size() == 4
        # test_40: a3's exetime became min(t+0.5, 0)=0 but it sits in the
        # delayed heap until check_update promotes it
        tq.check_update()
        assert tq.get() == "a3"
        assert tq.size() == 4
        # test_50: +0.3s -> a4 (exetime t+0.2) promotes; a4 pri 3 > a1 pri 1
        clock.advance(0.3)
        tq.check_update()
        assert tq.get() == "a4"
        assert tq.get() == "a1"
        assert tq.size() == 4
        # test_60: past the 0.5 s processing timeout all four requeue
        # (promotion is strict `deadline < now`, so step past the boundary)
        clock.advance(0.5 + 1e-6)
        tq.check_update()
        assert tq.get() == "a2"
        assert len(tq) == 4
        assert tq.get() == "a4"
        assert tq.get() == "a3"
        assert tq.get() == "a1"
        assert len(tq) == 4
        # test_70_done
        assert tq.done("a2")
        assert tq.done("a1")
        assert len(tq) == 2
        assert tq.done("a4")
        assert tq.done("a3")
        assert len(tq) == 0


class TestPriorityFifo:
    """tests/test_task_queue.py:18-49 — 100 tasks, priority = i//10:
    dequeue priority 9..0, FIFO within each priority."""

    def test_in_time_order(self):
        tq, _ = make_tq(rate=300, burst=1000)
        fifo_per_priority = {}
        for i in range(100):
            pri = i // 10
            tq.put(str(i), pri, 0)
            fifo_per_priority.setdefault(pri, Queue.Queue()).put(str(i))
        for i in range(100):
            taskid = tq.get()
            expected_pri = 9 - i // 10
            assert taskid == fifo_per_priority[expected_pri].get()
        assert tq.size() == 100
        assert len(tq.ready) == 0
        assert len(tq.processing) == 100


class TestTimeQueue:
    """tests/test_task_queue.py:55-117 — exetime ordering + promotion."""

    def test_time_order_and_promotion(self):
        tq, clock = make_tq(rate=300, burst=1000)
        interval = 5.0 / 1000
        fifo = Queue.Queue()
        for i in range(20):
            exetime = clock.now() + (i + 1) * interval
            tq.put(str(i), i // 10, exetime)
            fifo.put(str(i))
        assert len(tq.ready) == 0 and len(tq.processing) == 0
        assert len(tq.delayed) == 20
        # raw delayed-heap order is pure exetime order == insertion order here
        for _ in range(20):
            assert tq.delayed.pop().taskid == fifo.get()
        assert len(tq.delayed) == 0

        # refill, advance past all exetimes, promote: then pops follow
        # priority DESC + FIFO(sequence) within priority
        per_priority = {}
        for i in range(20):
            pri = i // 10
            tq.put(str(i), pri, clock.now() + (i + 1) * interval)
            per_priority.setdefault(pri, Queue.Queue()).put(str(i))
        assert len(tq.delayed) == 20
        clock.advance(21 * interval)
        tq.check_update()
        assert len(tq.ready) == 20 and len(tq.delayed) == 0
        got = [tq.get() for _ in range(20)]
        expected = [per_priority[1].get() for _ in range(10)] + \
                   [per_priority[0].get() for _ in range(10)]
        assert got == expected
        assert len(tq.processing) == 20


class TestBucket:
    """tests/test_scheduler.py:80-92, exact on the virtual clock."""

    def test_refill(self):
        clock = VirtualClock(T0)
        bucket = TokenBucket(100, 1000, clock=clock)
        assert bucket.get() == 1000
        clock.advance(0.1)
        assert bucket.get() == 1000          # capped at burst
        bucket.desc(100)
        assert bucket.get() == 900           # <1 token accrued since stamp reset
        clock.advance(0.1)
        assert bucket.get() == pytest.approx(910)
        clock.advance(0.1)
        assert bucket.get() == pytest.approx(920)

    def test_gating_in_queue(self):
        tq, clock = make_tq(rate=1, burst=2)
        for i in range(5):
            tq.put(f"t{i}")
        assert tq.get() == "t0"
        assert tq.get() == "t1"
        assert tq.get() is None              # bucket exhausted
        clock.advance(2.0)
        assert tq.get() == "t2"              # refilled 2 tokens


class TestMergeSemantics:
    def test_merge_keeps_sequence_and_improves(self):
        tq, _ = make_tq()
        tq.put("x", 0)
        tq.put("y", 5)
        tq.put("x", 9)   # merge: x now priority 9, but original (earlier) seq
        assert tq.size() == 2
        assert tq.get() == "x"   # 9 > 5
        assert tq.get() == "y"

    def test_put_while_processing_is_dropped(self):
        tq, _ = make_tq()
        tq.put("x", 0)
        assert tq.get() == "x"
        tq.put("x", 9)           # ignored: in processing
        assert tq.get() is None
        assert tq.is_processing("x")

    def test_delete(self):
        tq, clock = make_tq()
        tq.put("a", 0)
        tq.put("b", 0, clock.now() + 100)
        assert tq.delete("a") and tq.delete("b")
        assert not tq.delete("zzz")
        assert tq.size() == 0

    def test_snapshot_restore(self):
        tq, clock = make_tq()
        tq.put("a", 1)
        tq.put("b", 2, clock.now() + 5)
        assert tq.get() == "a"
        snap = tq.snapshot()
        tq2 = TaskQueue.restore(snap, clock=clock)
        assert tq2.size() == 2
        assert tq2.is_processing("a")
        clock.advance(6)
        tq2.check_update()
        assert tq2.get() == "b"

"""Differential ordering test: our TaskQueue vs the reference
implementation executed in-process as the oracle (BASELINE.md
"crawl-order fidelity" criterion).

The reference queue runs on wall-clock (pyspider/scheduler/
task_queue.py:205, token_bucket.py:31); to make the comparison exact we
drive both through a scripted scenario with exetime==0 puts only (no
sleeps involved) plus explicit check_update points, and compare every
pop.  Skipped automatically if the reference tree or its ``six``
dependency is unavailable.
"""

import random
import sys

import pytest

try:
    import collections
    import collections.abc
    import importlib
    import types
    if not hasattr(collections, "Mapping"):   # reference is py2/early-py3
        collections.Mapping = collections.abc.Mapping
    # import the scheduler package directly, bypassing pyspider/__init__
    # (which drags in chardet/tornado etc. that this container lacks)
    _pkg = types.ModuleType("refsched")
    _pkg.__path__ = ["/root/reference/pyspider/scheduler"]
    sys.modules.setdefault("refsched", _pkg)
    RefTaskQueue = importlib.import_module("refsched.task_queue").TaskQueue
    HAVE_REF = True
except Exception:
    HAVE_REF = False

from pyspider_ray.state import TaskQueue, VirtualClock

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference pyspider not importable")


def make_pair():
    ours = TaskQueue(rate=1e9, burst=1e9, clock=VirtualClock(1.7e9))
    ref = RefTaskQueue(rate=1e9, burst=1e9)
    return ours, ref


class TestDifferential:
    def test_random_put_get_order(self):
        rng = random.Random(42)
        ours, ref = make_pair()
        live = set()
        for step in range(3000):
            op = rng.random()
            if op < 0.55 or not live:
                taskid = f"t{rng.randrange(600)}"
                priority = rng.randrange(6)
                ours.put(taskid, priority, 0)
                ref.put(taskid, priority, 0)
                live.add(taskid)
            elif op < 0.85:
                a, b = ours.get(), ref.get()
                assert a == b, f"divergence at step {step}: {a} != {b}"
                if a is not None:
                    live.discard(a)
            else:
                taskid = rng.choice(sorted(live)) if live else "zz"
                assert ours.done(taskid) == ref.done(taskid)
        # drain completely — total order must agree
        while True:
            a, b = ours.get(), ref.get()
            assert a == b
            if a is None:
                break

    def test_merge_on_put_parity(self):
        ours, ref = make_pair()
        rng = random.Random(7)
        for _ in range(500):
            taskid = f"m{rng.randrange(40)}"
            priority = rng.randrange(10)
            ours.put(taskid, priority, 0)
            ref.put(taskid, priority, 0)
        order_ours, order_ref = [], []
        while True:
            a, b = ours.get(), ref.get()
            if a is None and b is None:
                break
            order_ours.append(a)
            order_ref.append(b)
        assert order_ours == order_ref
        assert len(order_ours) <= 40

    def test_delete_and_requeue_parity(self):
        ours, ref = make_pair()
        for i in range(50):
            ours.put(f"d{i}", i % 3, 0)
            ref.put(f"d{i}", i % 3, 0)
        for i in range(0, 50, 5):
            assert ours.delete(f"d{i}") == ref.delete(f"d{i}")
        order = []
        while True:
            a, b = ours.get(), ref.get()
            assert a == b
            if a is None:
                break
            order.append(a)
        assert len(order) == 40


class TestTokenBucketDifferential:
    def test_refill_parity_random_walk(self, monkeypatch):
        """T3: our TokenBucket vs the reference Bucket
        (token_bucket.py:15-56) over 2,000 random get/desc/advance steps
        on the same mocked clock — levels must agree to float precision
        at every step, including the >1-whole-token lazy-refill rule and
        negative levels after over-consumption."""
        import importlib
        ref_tb = importlib.import_module("refsched.token_bucket")
        from pyspider_ray.state.token_bucket import TokenBucket

        now = [1.7e9]
        monkeypatch.setattr(ref_tb.time, "time", lambda: now[0])
        for rate, burst in ((3.0, None), (0.5, 2.0), (100.0, 10.0)):
            ref = ref_tb.Bucket(rate=rate, burst=burst)
            ours = TokenBucket(rate=rate, burst=burst,
                               clock=lambda: now[0])
            rng = random.Random(42)
            for step in range(2000):
                op = rng.random()
                if op < 0.45:
                    now[0] += rng.choice([0.01, 0.3, 1.0, 7.5])
                elif op < 0.8:
                    assert ours.get() == pytest.approx(ref.get(), abs=1e-9), \
                        (rate, burst, step)
                else:
                    n = rng.choice([1, 1, 2, 5])
                    ref.desc(n)
                    ours.desc(n)
            assert ours.get() == pytest.approx(ref.get(), abs=1e-9)

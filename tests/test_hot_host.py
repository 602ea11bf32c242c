"""North-rule skew path: sharded politeness with hot-host splitting —
aggregate per-host rate preserved, hot-host admissions spread across
shard owners, cold hosts identical to the plain gate."""

import numpy as np

from pyspider_ray.functions.urls import urlhash64
from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline
from pyspider_ray.stages.politeness import (HostPolicy, PolitenessGate,
                                            ShardedPolitenessGate)
from pyspider_ray.state import VirtualClock


def mk_tasks(host, n, start=0):
    return [{"taskid": f"t{start+i}", "host": host,
             "url": f"http://{host}/p/{start+i}",
             "urlhash": urlhash64(f"http://{host}/p/{start+i}")}
            for i in range(n)]


class TestHotHostSplitting:
    def test_cold_hosts_match_plain_gate(self):
        """Below the hot threshold the sharded gate admits exactly what
        the plain gate admits, in the same order."""
        tasks = []
        for h in range(6):
            tasks += mk_tasks(f"h{h}.test", 20, start=h * 100)
        results = []
        for cls, kw in ((PolitenessGate, {}),
                        (ShardedPolitenessGate,
                         {"n_shards": 4, "hot_threshold": 256})):
            clock = VirtualClock(1000.0)
            gate = cls(default_policy=HostPolicy(rate=5, burst=10),
                       clock=clock, **kw)
            admitted, deferred, blocked = gate.admit(list(tasks))
            results.append(([t["taskid"] for t in admitted],
                            [t["taskid"] for t in deferred]))
        assert results[0] == results[1]

    def test_hot_host_detected_and_split(self):
        clock = VirtualClock(1000.0)
        gate = ShardedPolitenessGate(
            default_policy=HostPolicy(rate=100, burst=100),
            clock=clock, n_shards=8, hot_threshold=50, split_factor=4)
        gate.admit(mk_tasks("hot.test", 500))
        assert gate.split_hosts == {"hot.test": 4}
        # sub-buckets spread across more than one shard owner
        owners = {gate._shard_of(f"hot.test#{j}") for j in range(4)}
        assert len(owners) > 1

    def test_aggregate_rate_preserved_after_split(self):
        """Over a long window the hot host's admitted/sec equals the
        configured rate whether split or not (k x rate/k)."""
        def run(split: bool) -> int:
            clock = VirtualClock(1000.0)
            gate = ShardedPolitenessGate(
                default_policy=HostPolicy(rate=40, burst=40),
                clock=clock, n_shards=8,
                hot_threshold=(50 if split else 10**9), split_factor=4)
            total = 0
            start = 0
            for _ in range(20):          # 20 virtual seconds
                admitted, _, _ = gate.admit(mk_tasks("hot.test", 200,
                                                     start=start))
                start += 200
                total += len(admitted)
                clock.advance(1.0)
            return total
        unsplit = run(False)
        split = run(True)
        # both within one burst of rate*window
        assert abs(unsplit - split) <= 40
        assert abs(split - 40 * 20) <= 40

    def test_skewed_crawl_e2e(self, tmp_path):
        """Zipf-skewed host layout through the sharded gate: full
        coverage, hot host split, admissions spread across shards."""
        cfg = CrawlConfig(total=400, n_seeds=10, n_shards=4, n_hosts=8,
                          skew=True, use_ray=False, loop_limit=1000,
                          out_dir=str(tmp_path / "skew"),
                          gate_shards=8, hot_host_threshold=64,
                          host_rate=1e9, host_burst=1e9)
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        pipe.run(max_rounds=100)
        ids = pipe.results_table()["image_id"].to_pylist()
        assert len(ids) == len(set(ids)) == 400
        assert pipe.gate.split_hosts            # the dominant host split
        spread = [c for c in pipe.gate.shard_admits if c > 0]
        assert len(spread) >= 2

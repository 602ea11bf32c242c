"""T4 — fetched+parsed robots.txt cache with TTL
(tornado_fetcher.py:289-324 parity on a virtual clock)."""

from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline
from pyspider_ray.stages.robots import RobotsCache
from pyspider_ray.state import VirtualClock


class TestRobotsCache:
    def test_parse_and_allow(self):
        clock = VirtualClock(1000.0)
        rc = RobotsCache(lambda host: "User-agent: *\nDisallow: /private\n",
                         ttl=3600, clock=clock)
        assert rc.allowed("h.test", "http://h.test/public/x")
        assert not rc.allowed("h.test", "http://h.test/private/y")

    def test_fetch_once_per_ttl_window(self):
        clock = VirtualClock(1000.0)
        rc = RobotsCache(lambda host: "User-agent: *\nDisallow:\n",
                         ttl=100, clock=clock)
        for _ in range(50):
            rc.allowed("h.test", "http://h.test/a")
        assert rc.fetch_count == 1          # cached within the TTL
        clock.advance(101)
        rc.allowed("h.test", "http://h.test/a")
        assert rc.fetch_count == 2          # refetched after expiry

    def test_rule_change_takes_effect_after_ttl(self):
        clock = VirtualClock(1000.0)
        rules = {"body": "User-agent: *\nDisallow:\n"}
        rc = RobotsCache(lambda host: rules["body"], ttl=60, clock=clock)
        assert rc.allowed("h.test", "http://h.test/secret/x")
        rules["body"] = "User-agent: *\nDisallow: /secret\n"
        # still allowed: the old parse is cached
        assert rc.allowed("h.test", "http://h.test/secret/x")
        clock.advance(61)
        assert not rc.allowed("h.test", "http://h.test/secret/x")

    def test_fetch_error_allows_all(self):
        clock = VirtualClock(1000.0)

        def boom(host):
            raise OSError("unreachable")
        rc = RobotsCache(boom, ttl=60, clock=clock)
        assert rc.allowed("h.test", "http://h.test/anything")

    def test_clear_expired(self):
        clock = VirtualClock(1000.0)
        rc = RobotsCache(lambda h: "", ttl=60, clock=clock)
        rc.allowed("a.test", "http://a.test/")
        clock.advance(61)
        rc.allowed("b.test", "http://b.test/")
        rc.clear_expired()
        assert list(rc._cache) == ["b.test"]


class TestSnapshotRestore:
    def test_restore_rebuilds_rules_without_refetch(self):
        """Checkpoint symmetry: restore seeds parsers from persisted
        bodies at their original fetch times — a resumed crawl enforces
        the same rules with ZERO refetches until the TTL expires."""
        clock = VirtualClock(1000.0)
        rc = RobotsCache(lambda h: "User-agent: *\nDisallow: /private\n",
                         ttl=3600, clock=clock)
        assert not rc.allowed("h.test", "http://h.test/private/x")
        snap = rc.snapshot()

        def boom(host):
            raise AssertionError("refetched after restore")
        rc2 = RobotsCache.restore(snap, boom, clock=clock)
        clock.advance(100)   # inside the TTL window
        assert not rc2.allowed("h.test", "http://h.test/private/x")
        assert rc2.allowed("h.test", "http://h.test/public/y")
        assert rc2.fetch_count == 0
        # after expiry the refetch schedule resumes normally
        clock.advance(3600)
        rc3 = RobotsCache.restore(snap, lambda h: "", clock=clock)
        assert rc3.allowed("h.test", "http://h.test/private/x")
        assert rc3.fetch_count == 1

    def test_legacy_time_only_snapshot_refetches_on_demand(self):
        """A legacy snapshot entry with no stored body must NOT become
        an allow-all parser pinned at the old fetch time — the safe
        behavior is to skip the cache entry and refetch on first use."""
        clock = VirtualClock(1000.0)
        snap = {"hosts": {"h.test": 999.0}, "ttl": 3600}
        rc = RobotsCache.restore(
            snap, lambda h: "User-agent: *\nDisallow: /private\n",
            clock=clock)
        assert "h.test" not in rc._cache
        assert not rc.allowed("h.test", "http://h.test/private/x")
        assert rc.fetch_count == 1


class TestCrawlWithFetchedRobots:
    def test_crawl_matches_static_rules(self, tmp_path):
        """robots_fetch=True serves synthetic robots.txt bodies through
        the TTL cache; blocked set identical to the static config."""
        cfg = CrawlConfig(total=100, n_seeds=10, n_shards=4,
                          loop_limit=100, use_ray=False,
                          retry_delay={"": 1},
                          robots_disallow={"site0.test": ["/page/7"]},
                          robots_fetch=True,
                          out_dir=str(tmp_path / "robfetch"))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        pipe.run(max_rounds=200)
        fetched = {int(i.split("-")[1])
                   for i in pipe.results_table()["image_id"].to_pylist()}
        assert fetched == set(range(100)) - {70, 75}
        # each host's robots.txt fetched once per TTL window, not per URL
        assert pipe.gate.robots_cache.fetch_count <= cfg.n_hosts


class TestRobotsCheckpointWiring:
    def test_gate_snapshot_carries_robots_and_resume_skips_refetch(self):
        """The politeness gate's checkpoint must carry the robots
        cache: a restored gate answers from the persisted bodies
        WITHOUT refetching (fetch_fn raising proves it) and keeps the
        original TTL schedule; past TTL it refetches as usual."""
        from pyspider_ray.stages.politeness import PolitenessGate
        from pyspider_ray.stages.robots import RobotsCache

        now = [1000.0]
        clock = lambda: now[0]
        rc = RobotsCache(lambda h: "User-agent: *\nDisallow: /priv",
                         ttl=600, clock=clock)
        gate = PolitenessGate(clock=clock, robots_cache=rc)
        assert gate.robots_allowed("h1.test", "http://h1.test/ok")
        assert not gate.robots_allowed("h1.test", "http://h1.test/priv/x")
        snap = gate.snapshot()
        assert "robots" in snap

        calls = []
        rc2 = RobotsCache(lambda h: calls.append(h) or "",
                          ttl=999, clock=clock)
        gate2 = PolitenessGate(clock=clock, robots_cache=rc2)
        gate2.restore_buckets(snap)
        assert rc2.ttl == 600                      # original schedule
        assert gate2.robots_allowed("h1.test", "http://h1.test/ok")
        assert not gate2.robots_allowed("h1.test",
                                        "http://h1.test/priv/x")
        assert calls == []                         # no refetch on resume
        # past the ORIGINAL TTL the refetch fires as usual
        now[0] += 601
        gate2.robots_allowed("h1.test", "http://h1.test/ok")
        assert calls == ["h1.test"]

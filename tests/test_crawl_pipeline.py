"""End-to-end crawl loop tests: coverage, exact dedup, payload
invariants (PSNR >= 40 dB + caption equality, BASELINE.json input_hint),
politeness, robots, checkpoint/resume, and Ray-actor mode."""

import shutil

import numpy as np
import pytest

from pyspider_ray.functions import synthweb
from pyspider_ray.functions.imaging import decode_image, psnr
from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline


def fresh(cfg_kw, tmp_path, name):
    out = str(tmp_path / name)
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(out_dir=out, use_ray=False, **cfg_kw)
    return CrawlPipeline(cfg)


BASE = dict(total=300, n_seeds=10, n_shards=4, loop_limit=100)


class TestCrawlE2E:
    def test_full_coverage_and_exact_dedup(self, tmp_path):
        pipe = fresh(BASE, tmp_path, "cov")
        pipe.seed()
        summary = pipe.run(max_rounds=100)
        t = pipe.results_table()
        ids = t["image_id"].to_pylist()
        # every reachable id fetched exactly once (D4 exact dedup)
        assert len(ids) == len(set(ids)) == 300
        assert len(pipe.seen_taskids()) == 300
        assert summary["rounds"] < 100

    def test_payload_invariant(self, tmp_path):
        """Per-row: decoded pixels PSNR>=40dB (inf for png) vs the
        reference generator + exact caption equality."""
        pipe = fresh(dict(BASE, total=60, n_seeds=6), tmp_path, "inv")
        pipe.seed()
        pipe.run(max_rounds=50)
        t = pipe.results_table()
        assert t.num_rows == 60
        for row in t.slice(0, 60).to_pylist():
            url_id = int(row["image_id"].split("-")[1])
            expect = synthweb.page_pixels(url_id)
            got = decode_image(row["bytes"])
            score = psnr(expect, got)
            if row["fmt"] == "png":
                assert score == float("inf")
            else:
                assert score >= 40.0
            assert row["caption"] == synthweb.page_caption(url_id)
            assert (row["h"], row["w"], 3) == expect.shape

    def test_deterministic_rerun(self, tmp_path):
        runs = []
        for i in range(2):
            pipe = fresh(BASE, tmp_path, f"det{i}")
            pipe.seed()
            pipe.run(max_rounds=100)
            runs.append((pipe.emitted_order(), pipe.seen_taskids()))
        assert runs[0][0] == runs[1][0]       # bit-for-bit fetch order
        assert runs[0][1] == runs[1][1]       # identical URL-seen set

    def test_politeness_budget_defers(self, tmp_path):
        # tight host budget: rate 2/s, burst 2 over 5 hosts throttles rounds
        pipe = fresh(dict(BASE, total=100, host_rate=2, host_burst=2),
                     tmp_path, "pol")
        pipe.seed()
        summary = pipe.run(max_rounds=300)
        deferred_total = sum(m["deferred"] for m in pipe.metrics)
        assert deferred_total > 0             # budget actually binds
        t = pipe.results_table()
        ids = t["image_id"].to_pylist()
        assert len(ids) == len(set(ids)) == 100   # still complete, no dupes
        # per-round admitted per host never exceeds burst
        for m in pipe.metrics:
            assert m["admitted"] <= 2 * 5 + 1  # 5 hosts * burst (+control)

    def test_robots_blocking(self, tmp_path):
        # disallow /page/7* on host 0 -> ids 70 and 75 are robots-blocked;
        # the rest keep succeeding so the pause FSM never engages and the
        # blocked pair walks the 403 -> retry ladder -> FAILED path
        pipe = fresh(dict(BASE, total=100, retry_delay={"": 1},
                          robots_disallow={"site0.test": ["/page/7"]}),
                     tmp_path, "rob")
        pipe.seed()
        pipe.run(max_rounds=200)
        fetched = {int(i.split("-")[1])
                   for i in pipe.results_table()["image_id"].to_pylist()}
        assert fetched == set(range(100)) - {70, 75}
        assert sum(m["blocked"] for m in pipe.metrics) >= 8
        from pyspider_ray.model import FAILED
        failed_urls = sorted(
            task["url"] for shard in pipe.shards
            for task in shard.store.values() if task.get("status") == FAILED)
        assert failed_urls == ["http://site0.test/page/70",
                               "http://site0.test/page/75"]

    def test_retry_ladder_with_failures(self, tmp_path):
        pipe = fresh(dict(BASE, total=80, fail_permille=150,
                          retry_delay={"": 1}), tmp_path, "fail")
        pipe.seed()
        pipe.run(max_rounds=400)
        t = pipe.results_table()
        ids = t["image_id"].to_pylist()
        # transient 503s recover deterministically on the first retry
        assert len(ids) == len(set(ids)) == 80

    def test_checkpoint_resume_no_refetch(self, tmp_path):
        out = str(tmp_path / "ck")
        cfg = CrawlConfig(out_dir=out, use_ray=False, **BASE)
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        for _ in range(4):
            pipe.run_round()
        pipe.checkpoint()
        fetched_before = sum(m["fetched"] for m in pipe.metrics)
        full_order = list(pipe.emitted_order())
        # keep running the original to completion as the oracle
        pipe.run(max_rounds=100)
        oracle_order = pipe.emitted_order()
        oracle_ids = sorted(pipe.results_table()["image_id"].to_pylist())

        # "kill" and resume from the checkpoint; finished partitions stay
        resumed = CrawlPipeline.resume(CrawlConfig(out_dir=out, use_ray=False,
                                                   **BASE))
        # the post-checkpoint result partitions were written by the oracle
        # run; drop them to simulate the kill (they're not in the manifest)
        import json, os
        with open(os.path.join(resumed.ckpt_dir, "round=00004",
                               "manifest.json")) as f:
            manifest = json.load(f)
        for d in os.listdir(resumed.results_dir):
            if d not in manifest["completed_result_dirs"]:
                shutil.rmtree(os.path.join(resumed.results_dir, d))
        assert resumed.round_idx == 4
        assert sum(m["fetched"] for m in resumed.metrics) == fetched_before
        resumed.run(max_rounds=100)
        # same final frontier and same results, with no re-fetch of the
        # pre-checkpoint partitions (emission continues, not restarts)
        assert resumed.emitted_order() == oracle_order[len(full_order):]
        assert sorted(resumed.results_table()["image_id"].to_pylist()) == \
            oracle_ids
        assert resumed.seen_taskids() == pipe.seen_taskids()

    def test_conditional_recrawl_304(self, tmp_path):
        """J5/M8 — an age-based re-crawl of an unchanged page answers 304
        (etag match), succeeds, and produces no duplicate result row."""
        pipe = fresh(dict(BASE, total=50), tmp_path, "etag")
        pipe.seed()
        pipe.run(max_rounds=60)
        assert pipe.results_table().num_rows == 50
        # force an age-0 restart of one crawled URL
        from pyspider_ray.stages.canonicalize import canonicalize_urls
        c = canonicalize_urls(["http://site2.test/page/7"])
        pipe._pending_new.append({
            "taskid": c["taskid"][0], "urlhash": int(c["urlhash"][0]),
            "project": "bench", "url": c["url"][0], "host": c["host"][0],
            "schedule": {"age": 0, "priority": 5},
            "process": {"callback": "on_page"},
        })
        m = pipe.run_round()
        assert m["admitted"] == 1
        pipe.run(max_rounds=pipe.round_idx + 5)
        # no duplicate result (304 skipped the payload), task still SUCCESS
        ids = pipe.results_table()["image_id"].to_pylist()
        assert len(ids) == len(set(ids)) == 50
        from pyspider_ray.model import SUCCESS
        shard = pipe.shards[pipe.coord.route({"taskid": c["taskid"][0],
                                              "url": c["url"][0]})]
        task = shard.get_task("bench", c["taskid"][0])
        assert task["status"] == SUCCESS
        assert task["etag"].startswith("W/")

    def test_metrics_and_active_tasks(self, tmp_path):
        pipe = fresh(dict(BASE, total=120), tmp_path, "met")
        pipe.seed()
        pipe.run(max_rounds=100)
        allc = pipe.metrics_hub.to_dict("all")["bench"]
        assert allc["success"] == 120
        assert allc["pending"] == 0          # every pending resolved
        recent = pipe.coord.get_active_tasks(limit=10)
        assert len(recent) == 10
        times = [t for t, _ in recent]
        assert times == sorted(times, reverse=True)

    def test_hot_host_skew_still_completes(self, tmp_path):
        pipe = fresh(dict(BASE, total=200, skew=True, host_rate=5,
                          host_burst=5), tmp_path, "skew")
        pipe.seed()
        pipe.run(max_rounds=300)
        ids = pipe.results_table()["image_id"].to_pylist()
        assert len(ids) == len(set(ids)) == 200

    def test_hot_host_does_not_starve_others(self, tmp_path):
        """Skew fairness: while the hot host (~50% of URLs under the skew
        fixture) is budget-limited and deferring, the other hosts keep
        being admitted — per-host buckets isolate the hot key."""
        pipe = fresh(dict(BASE, total=400, skew=True, host_rate=3,
                          host_burst=3), tmp_path, "fair")
        pipe.seed()
        saw_concurrent_progress = 0
        for _ in range(60):
            m = pipe.run_round()
            if m["deferred"] > 0 and m["admitted"] > 3:
                # host0 exhausted its 3-token budget yet >3 tasks were
                # admitted => non-hot hosts proceeded this round
                saw_concurrent_progress += 1
        assert saw_concurrent_progress >= 5
        ids = pipe.results_table()["image_id"].to_pylist()
        assert len(ids) == len(set(ids))


class TestMultiProjectQuota:
    def test_fair_share_select(self):
        """O4 — weight-proportional per-project select quotas, clamped to
        [limit/10, limit/3] (scheduler.py:500-522) across two projects of
        very different frontier sizes."""
        from pyspider_ray.state import (Coordinator, FrontierShard,
                                        ProjectConfig, VirtualClock)
        clock = VirtualClock(1.7e9)
        shards = [FrontierShard(i, 2, clock=clock) for i in range(2)]
        coord = Coordinator(shards, clock=clock, loop_limit=100)
        for name in ("big", "small"):
            coord.update_project(ProjectConfig(name, rate=1e9, burst=1e9))
        tasks = []
        for i in range(300):
            tasks.append({"taskid": f"b{i}", "project": "big",
                          "url": f"u{i}"})
        for i in range(20):
            tasks.append({"taskid": f"s{i}", "project": "small",
                          "url": f"v{i}"})
        coord.dispatch_requests(tasks)
        batch = coord.select()
        per = {}
        for t in batch:
            per[t["project"]] = per.get(t["project"], 0) + 1
        # big: weight 300/320 -> limit*0.94 clamped to limit/3 = 33
        # small: weight 20/320 -> 6 -> clamped up to limit/10 = 10
        assert per["big"] == 33
        assert per["small"] == 10


@pytest.mark.usefixtures("ray_session")
class TestCrawlRayMode:
    def test_ray_checkpoint_resume(self, tmp_path):
        """M4 in Ray-actor mode: checkpoint, rebuild actors, resume; no
        re-fetch of finished partitions and identical final results."""
        out = str(tmp_path / "rayck")
        cfg = CrawlConfig(out_dir=out, use_ray=True, batch_size=64,
                          concurrency=2, **dict(BASE, total=150))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        for _ in range(3):
            pipe.run_round()
        pipe.checkpoint()
        fetched_mid = sum(m["fetched"] for m in pipe.metrics)
        resumed = CrawlPipeline.resume(cfg)
        assert resumed.round_idx == pipe.round_idx
        assert sum(m["fetched"] for m in resumed.metrics) == fetched_mid
        resumed.run(max_rounds=100)
        ids = resumed.results_table()["image_id"].to_pylist()
        assert len(ids) == len(set(ids)) == 150

    def test_ray_frontier_export(self, tmp_path):
        """Portable frontier export in Ray-actor mode: shards write their
        own partitions; the merged table reloads as a taskdb."""
        out = str(tmp_path / "rayexp")
        cfg = CrawlConfig(out_dir=out, use_ray=True, batch_size=64,
                          concurrency=2, **dict(BASE, total=120))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        pipe.run(max_rounds=100)
        fdir = pipe.export_frontier()
        from pyspider_ray.sources import load_frontier
        table = load_frontier(fdir)
        assert table.num_rows == 120
        from pyspider_ray.model import SUCCESS
        assert set(table["status"].to_pylist()) == {SUCCESS}
        assert pipe.coord.pause_status() == {"bench": False}

    def test_ray_actor_mode_matches_local(self, tmp_path):
        local = fresh(dict(BASE, total=200), tmp_path, "raylocal")
        local.seed()
        local.run(max_rounds=100)

        out = str(tmp_path / "rayray")
        cfg = CrawlConfig(out_dir=out, use_ray=True, batch_size=64,
                          concurrency=2, **dict(BASE, total=200))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        pipe.run(max_rounds=100)
        assert pipe.emitted_order() == local.emitted_order()
        assert pipe.seen_taskids() == local.seen_taskids()
        a = sorted(pipe.results_table()["image_id"].to_pylist())
        b = sorted(local.results_table()["image_id"].to_pylist())
        assert a == b == [f"img-{i:012d}" for i in range(200)]


class TestWorkerFaultTolerance:
    def test_worker_death_mid_crawl(self, tmp_path, ray_session):
        """A data-plane worker killed mid-crawl is replaced and its
        chunk re-dispatched; the crawl still reaches full coverage with
        exact dedup (payload part files publish via atomic rename, so
        the retry is idempotent)."""
        import ray
        out = str(tmp_path / "fault")
        cfg = CrawlConfig(out_dir=out, use_ray=True, batch_size=64,
                          concurrency=3, **dict(BASE, total=200))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        pipe.run_round()
        pipe.run_round()
        # murder one worker while its next chunks are pending
        victim = pipe._worker_pool()[0]
        ray.kill(victim, no_restart=True)
        pipe.run(max_rounds=100)
        ids = pipe.results_table()["image_id"].to_pylist()
        assert len(ids) == len(set(ids)) == 200
        assert victim not in pipe._workers   # replaced, not reused


class TestOutQueueBackpressure:
    def test_send_buffer_halts_select_until_drained(self, tmp_path):
        """W8 (scheduler.py:334-346, 465-475): admitted tasks beyond
        out_queue_limit hold in a driver-side send buffer; the next
        round dispatches FROM THE BUFFER with select halted; the crawl
        still completes exactly."""
        from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline
        cfg = CrawlConfig(total=120, n_seeds=12, n_shards=2,
                          loop_limit=100, out_queue_limit=7,
                          use_ray=False,
                          out_dir=str(tmp_path / "backpressure"))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        pipe.run(max_rounds=300)
        t = pipe.results_table()
        assert len(set(t["image_id"].to_pylist())) == 120
        buffered = [m["send_buffered"] for m in pipe.metrics]
        assert max(buffered) > 0                  # backpressure engaged
        # no round ever handed more than the limit to the data plane
        assert all(m["fetched"] <= 7 for m in pipe.metrics)
        # a buffered round is followed by a drain round whose emitted
        # count equals the buffer (select halted, no fresh selection)
        for i, m in enumerate(pipe.metrics[:-1]):
            if m["send_buffered"]:
                assert pipe.metrics[i + 1]["emitted"] == m["send_buffered"]
        assert not pipe._send_buffer              # fully drained at end

    def test_drain_bypasses_gate_and_cron_keeps_ticking(self, tmp_path):
        """Buffered tasks consumed their politeness token when FIRST
        admitted; the drain round must not re-rate them (the reference
        force-sends _send_buffer without re-rating, scheduler.py:465-475)
        — so no taskid ever passes gate.admit twice — and cron ticks on
        drain rounds too (_check_cronjob runs every loop)."""
        from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline
        cfg = CrawlConfig(total=60, n_seeds=12, n_shards=2,
                          loop_limit=100, out_queue_limit=5,
                          use_ray=False,
                          out_dir=str(tmp_path / "drain"))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        gated: list[str] = []
        orig_admit = pipe.gate.admit
        pipe.gate.admit = lambda batch: (
            gated.extend(t["taskid"] for t in batch) or orig_admit(batch))
        ticks = {"n": 0, "drain": 0}
        orig_tick = pipe.coord.tick_cronjobs

        def spy_tick():
            ticks["n"] += 1
            if pipe._send_buffer:
                ticks["drain"] += 1
            return orig_tick()
        pipe.coord.tick_cronjobs = spy_tick
        pipe.run(max_rounds=300)
        t = pipe.results_table()
        assert len(set(t["image_id"].to_pylist())) == 60
        assert max(m["send_buffered"] for m in pipe.metrics) > 0
        # no task rated twice: forced drain batches bypassed the gate
        assert len(gated) == len(set(gated))
        # cron ticked on every round, including the drain rounds
        assert ticks["n"] == len(pipe.metrics)
        assert ticks["drain"] > 0


class TestWorkerSubBatching:
    def test_sub_batched_chunk_matches_single_batch(self, tmp_path):
        """process_chunk slices its chunk into batch_rows sub-batches to
        bound the worker's live set; the control table and the union of
        written payload parts must be identical to the one-batch path."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import numpy as np
        from pyspider_ray.functions import synthweb
        from pyspider_ray.pipelines.crawl import _WorkerActor

        ids = np.arange(100, 170, dtype=np.uint64)
        urls = synthweb.urls_of(ids, 5)
        table = pa.table({
            "taskid": [f"t{int(i):x}" for i in ids],
            "url": urls,
            "project": ["bench"] * len(ids),
            "priority": pa.array([0] * len(ids), pa.int32()),
            "retried": pa.array([0] * len(ids), pa.int32()),
        })
        pk = {"total": 10 ** 6, "show": 20, "n_hosts": 5}
        outs = {}
        for name, rows in (("one", 10_000), ("sub", 16)):
            w = _WorkerActor({}, pk, persist_payload=True, batch_rows=rows)
            rd = str(tmp_path / name)
            ctrl = w.process_chunk(table, rd, 3)
            w.flush()
            parts = sorted((tmp_path / name).glob("part-*.parquet"))
            payload = pa.concat_tables([pq.read_table(p) for p in parts])
            outs[name] = (ctrl, payload)
        one_ctrl, one_payload = outs["one"]
        sub_ctrl, sub_payload = outs["sub"]
        assert len(list((tmp_path / "one").glob("part-*.parquet"))) == 1
        assert len(list((tmp_path / "sub").glob("part-*.parquet"))) == 5
        assert one_ctrl.sort_by("taskid").equals(sub_ctrl.sort_by("taskid"))
        assert one_payload.sort_by("image_id").equals(
            sub_payload.sort_by("image_id"))

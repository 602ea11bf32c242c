"""Scheduler end-to-end semantics, ported from the reference
tests/test_scheduler.py:105-736 scenario sequence (the north-rule
ordering contract), on a virtual clock over sharded frontiers.

The reference runs with INQUEUE_LIMIT=10 and DEFAULT_RETRY_DELAY={'':5}
(test_scheduler.py:141-143); same here."""

import numpy as np
import pytest

from pyspider_ray.model import ACTIVE, BAD, FAILED, SUCCESS
from pyspider_ray.state import (Coordinator, CuckooFilter, FrontierShard,
                                ProjectConfig, ProjectRuntime, VirtualClock)

T0 = 1_700_000_000.0
RETRY_DELAY = {"": 5}


def make_coord(n_shards=1, inqueue_limit=10):
    clock = VirtualClock(T0)
    shards = [FrontierShard(i, n_shards, clock=clock,
                            inqueue_limit=inqueue_limit)
              for i in range(n_shards)]
    coord = Coordinator(shards, clock=clock)
    return coord, clock


def task(taskid, project="test_project", url="url", schedule=None, **kw):
    t = {"taskid": taskid, "project": project, "url": url}
    if schedule is not None:
        t["schedule"] = schedule
    t.update(kw)
    return t


def status(taskid, ok, project="test_project", schedule=None):
    p = {"taskid": taskid, "project": project, "url": "url",
         "track": {"fetch_ok": True, "process_ok": ok}}
    if schedule is not None:
        p["schedule"] = schedule
    return p


def ids(batch):
    return [t["taskid"] for t in batch]


@pytest.mark.parametrize("n_shards", [1, 4])
class TestSchedulerScenario:
    def test_full_sequence(self, n_shards):
        coord, clock = make_coord(n_shards)
        coord.update_project(ProjectConfig(
            "test_project", rate=1.0, burst=10, retry_delay=RETRY_DELAY))

        # test_10: unknown project is dropped
        out = coord.round(new_tasks=[task("taskid", project="nope")])
        assert out == [] and coord.total_size() == 0

        # test_35: new task -> selected
        out = coord.round(new_tasks=[task(
            "taskid", schedule={"age": 0}, fetch={"data": "abc"})])
        assert ids(out) == ["taskid"]
        assert out[0]["fetch"]["data"] == "abc"
        assert coord.total_size() == 1          # in processing

        # test_37: force_update while processing -> postponed
        clock.advance(0.2)
        stats = coord.dispatch_requests([task(
            "taskid", url="url_force_update",
            schedule={"age": 10, "force_update": True})])
        assert stats["postponed"] == 1

        # test_40/50: bad packs don't change anything
        coord.dispatch_status([status("taskid", True, project="no_project")])
        coord.dispatch_status([{"taskid": "taskid",
                                "project": "test_project", "url": "url"}])
        assert coord.total_size() == 1

        # test_60: failure -> retry (+5 s ladder); postponed force_update
        # then replays and restarts the task immediately
        clock.advance(0.1)
        coord.dispatch_status([status("taskid", False)])
        out = coord.round()
        assert ids(out) == ["taskid"]

        # test_70: done
        clock.advance(0.1)
        coord.dispatch_status([status("taskid", True)])
        assert coord.total_size() == 0
        shard = coord.shards[coord.route({"taskid": "taskid", "url": "url"})]
        assert shard.get_task("test_project", "taskid")["status"] == SUCCESS

        # test_75: on_finished after FAIL_PAUSE_NUM empty rounds
        fired = []
        for _ in range(12):
            clock.advance(0.1)
            fired += ids(coord.round())
        assert fired == ["on_finished"]
        coord.dispatch_status([status("on_finished", True)])
        assert coord.total_size() == 0

        # test_80: age=30 -> ignored (recent success)
        out = coord.round(new_tasks=[task("taskid", schedule={"age": 30})])
        assert out == [] and coord.total_size() == 0

        # test_90: itag change -> restart
        out = coord.round(new_tasks=[task(
            "taskid", schedule={"itag": "abc", "retries": 1})])
        assert ids(out) == ["taskid"]
        clock.advance(0.1)
        coord.dispatch_status([status("taskid", True)])
        fired = []
        for _ in range(12):
            clock.advance(0.1)
            fired += ids(coord.round())
        assert fired == ["on_finished"]
        coord.dispatch_status([status("on_finished", True)])

        # test_a10: restart by age=0
        clock.advance(1)
        out = coord.round(new_tasks=[task(
            "taskid", schedule={"age": 0, "retries": 1})])
        assert ids(out) == ["taskid"]

        # test_a20: fail -> one retry (ladder 5 s) -> fail -> FAILED
        clock.advance(0.5)
        coord.dispatch_status([status("taskid", False,
                                      schedule={"age": 0, "retries": 1})])
        clock.advance(5.1)
        out = coord.round()
        assert ids(out) == ["taskid"]
        coord.dispatch_status([status("taskid", False,
                                      schedule={"age": 0, "retries": 1,
                                                "retried": 1})])
        assert shard.get_task("test_project", "taskid")["status"] == FAILED
        fired = []
        for _ in range(12):
            clock.advance(0.1)
            fired += ids(coord.round())
        assert fired == ["on_finished"]
        coord.dispatch_status([status("on_finished", True)])

        # test_a30: task_verify rejections
        stats = coord.dispatch_requests([
            {"project": "test_project", "url": "url"},
            {"taskid": "t#", "url": "url"},
            {"taskid": "t#", "project": "test_project"},
            task("t#", project="not_exist"),
        ])
        assert stats["invalid"] == 4
        coord.dispatch_requests([task("taskid#")])
        assert coord.total_size() == 1

        # test_a40: auto_recrawl success loops the task
        out = coord.round(new_tasks=[task(
            "taskid", schedule={"age": 0, "retries": 1, "auto_recrawl": True})])
        assert set(ids(out)) == {"taskid#", "taskid"}
        assert ids(out)[0] == "taskid#"       # earlier sequence, same priority
        clock.advance(0.1)
        coord.dispatch_status([status(
            "taskid", True,
            schedule={"age": 0, "retries": 1, "auto_recrawl": True})])
        out = coord.round()
        assert ids(out) == ["taskid"]         # re-crawled via auto_recrawl

        # test_a50: auto_recrawl failure also loops (delay capped by age)
        for _ in range(3):
            clock.advance(0.1)
            coord.dispatch_status([status(
                "taskid", False,
                schedule={"age": 0, "retries": 1, "auto_recrawl": True})])
            out = coord.round()
            assert ids(out) == ["taskid"]

        # test_a60: dropping auto_recrawl ends the loop
        clock.advance(0.1)
        coord.dispatch_status([status("taskid", True,
                                      schedule={"age": 0, "retries": 1})])
        out = coord.round()
        assert out == []

        # test_38: cancel removes a scheduled task
        pre = coord.total_size()
        coord.round(new_tasks=[task(
            "taskid_to_cancel",
            schedule={"age": 0, "exetime": clock.now() + 30})])
        assert coord.total_size() == pre + 1
        coord.round(new_tasks=[task(
            "taskid_to_cancel",
            schedule={"force_update": True, "age": 0, "cancel": True})])
        assert coord.total_size() == pre
        assert shard_of(coord, "taskid_to_cancel").get_task(
            "test_project", "taskid_to_cancel")["status"] == BAD


def shard_of(coord, taskid, url="url"):
    return coord.shards[coord.route({"taskid": taskid, "url": url})]


class TestInqueueLimit:
    def test_x10_limit(self):
        # reference: INQUEUE_LIMIT=10, 20 puts -> 10 admitted
        coord, clock = make_coord(n_shards=1, inqueue_limit=10)
        coord.update_project(ProjectConfig("inq", rate=0, burst=0))
        tasks = [task(f"taskid{i}", project="inq",
                      schedule={"age": 3000, "force_update": True})
                 for i in range(20)]
        stats = coord.dispatch_requests(tasks)
        assert stats["overflow"] == 10
        assert coord.total_size() == 10
        # rate 0 -> nothing selectable
        assert coord.round() == []


class TestPauseFSM:
    """T6 — scheduler.py:51-102 transitions (reference TestProject)."""

    def fail_pack(self):
        return {"track": {"process_ok": False}}

    def ok_pack(self):
        return {"track": {"process_ok": True}}

    def test_pause_and_recover(self):
        clock = VirtualClock(T0)
        rt = ProjectRuntime(ProjectConfig("p"), clock)
        assert not rt.paused
        for _ in range(10):
            rt.active_tasks.appendleft((clock.now(), self.fail_pack()))
        assert rt.paused                       # 10 consecutive fails
        # stays paused during PAUSE_TIME
        clock.advance(100)
        assert rt.paused
        # after PAUSE_TIME -> checking (not paused) -> 3 probes fail -> paused
        clock.advance(201)
        assert not rt.paused                   # 'checking' admits probes
        for _ in range(3):
            rt.active_tasks.appendleft((clock.now(), self.fail_pack()))
        assert rt.paused
        # next window: a success unpauses
        clock.advance(301)
        assert not rt.paused
        rt.active_tasks.appendleft((clock.now(), self.ok_pack()))
        assert not rt.paused
        for _ in range(10):
            rt.active_tasks.appendleft((clock.now(), self.fail_pack()))
        assert rt.paused                       # re-pauses on new fail streak


class TestCronjob:
    def test_w2_ticks(self):
        coord, clock = make_coord()
        coord.update_project(ProjectConfig("cron", rate=10, burst=10,
                                           min_tick=3))
        assert coord.tick_cronjobs() == []     # no full second elapsed
        clock.advance(3.0)
        out = coord.tick_cronjobs()
        assert len(out) == 1 and out[0]["taskid"] == "_on_cronjob"
        clock.advance(6.0)
        assert len(coord.tick_cronjobs()) == 2  # ticks 6 and 9... every 3rd


class TestCuckoo:
    def test_no_false_negatives(self):
        cf = CuckooFilter(5000)
        keys = np.arange(0, 4000, dtype=np.int64) * 7919 - 2_000_000
        for k in keys:
            assert cf.add(int(k))
        assert cf.contains_many(keys).all()
        # false-positive rate on disjoint keys is tiny
        other = np.arange(1, 4001, dtype=np.int64) * 7919 - 1
        fp = float(cf.contains_many(other).mean())
        assert fp < 0.05
        # snapshot/restore preserves membership
        cf2 = CuckooFilter.restore(cf.snapshot())
        assert cf2.contains_many(keys).all()


class TestShardedParity:
    def test_emission_order_matches_single_shard(self):
        """The 4-shard merge select must reproduce the 1-shard (reference
        single-heap) emission order under identical inputs."""
        logs = []
        for n in (1, 4):
            coord, clock = make_coord(n_shards=n)
            coord.update_project(ProjectConfig("p", rate=1e9, burst=1e9))
            rng = np.random.default_rng(7)
            batch = [task(f"t{i}", project="p",
                          schedule={"priority": int(rng.integers(0, 4))})
                     for i in range(200)]
            emitted = []
            out = coord.round(new_tasks=batch)
            emitted += ids(out)
            # complete them, add more with delays, drain fully
            clock.advance(1)
            packs = [status(t, True, project="p") for t in emitted]
            out = coord.round(status_packs=packs, new_tasks=[
                task(f"u{i}", project="p",
                     schedule={"priority": i % 3,
                               "exetime": clock.now() + (i % 5)})
                for i in range(50)])
            emitted += ids(out)
            clock.advance(10)
            emitted += ids(coord.round())
            logs.append(emitted)
        assert logs[0] == logs[1]


class TestSharedTableFanout:
    """The columnar control plane (dispatch_status_tables /
    dispatch_follow_tables) sends ONE shared table to every shard;
    each shard filters its own hash range locally (_own_rows).  Pin:
    (a) 4-shard emission parity with the single-heap reference order,
    (b) strict per-shard ownership after ingestion, (c) _own_rows
    idempotence on a pre-routed sub-table."""

    def _ctrl_table(self, emitted):
        import pyarrow as pa
        from pyspider_ray.functions.urls import urlhash64
        rows = {"taskid": [], "urlhash": [], "project": [], "url": [],
                "host": [], "status_code": [], "fetch_time": [],
                "process_ok": [], "process_time": [], "follows": [],
                "follows_taskid": [], "follows_urlhash": [],
                "follows_host": []}
        for t in emitted:
            rows["taskid"].append(t["taskid"])
            rows["urlhash"].append(t["urlhash"])
            rows["project"].append(t["project"])
            rows["url"].append(t["url"])
            rows["host"].append("h")
            rows["status_code"].append(200)
            rows["fetch_time"].append(0.01)
            rows["process_ok"].append(True)
            rows["process_time"].append(0.01)
            links = [f"{t['url']}/f{j}" for j in range(3)]
            rows["follows"].append(links)
            rows["follows_taskid"].append([f"{t['taskid']}:f{j}"
                                           for j in range(3)])
            rows["follows_urlhash"].append([urlhash64(u) for u in links])
            rows["follows_host"].append(["h"] * 3)
        return pa.table({
            **{k: pa.array(v) for k, v in rows.items()
               if not k.startswith("follows")},
            "follows": pa.array(rows["follows"], pa.list_(pa.string())),
            "follows_taskid": pa.array(rows["follows_taskid"],
                                       pa.list_(pa.string())),
            "follows_urlhash": pa.array(rows["follows_urlhash"],
                                        pa.list_(pa.int64())),
            "follows_host": pa.array(rows["follows_host"],
                                     pa.list_(pa.string())),
        })

    def _drive(self, n_shards):
        coord, clock = make_coord(n_shards=n_shards, inqueue_limit=0)
        coord.update_project(ProjectConfig("p", rate=1e9, burst=1e9))
        seeds = [task(f"s{i}", project="p", url=f"http://h{i % 7}.test/p{i}")
                 for i in range(80)]
        emitted = coord.round(new_tasks=seeds)
        clock.advance(1)
        ctrl = self._ctrl_table(emitted)
        coord.dispatch_status_tables([ctrl])
        coord.dispatch_follow_tables([ctrl], "p", 0)
        clock.advance(1)
        emitted2 = coord.round()
        return coord, ids(emitted) + ids(emitted2)

    def test_parity_and_ownership(self):
        coord1, log1 = self._drive(1)
        coord4, log4 = self._drive(4)
        assert log1 == log4
        assert len(log4) == 80 + 240
        for shard in coord4.shards:
            for (project, taskid), t in shard.store.items():
                assert t["urlhash"] % 4 == shard.shard_id

    def test_own_rows_idempotent(self):
        import pyarrow as pa
        from pyspider_ray.state import FrontierShard, VirtualClock
        clock = VirtualClock(T0)
        shard = FrontierShard(2, 4, clock=clock)
        t = pa.table({"urlhash": pa.array(list(range(100)), pa.int64())})
        once = shard._own_rows(t)
        twice = shard._own_rows(once)
        assert once.equals(twice)
        assert once["urlhash"].to_pylist() == [h for h in range(100)
                                               if h % 4 == 2]

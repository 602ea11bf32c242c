"""Crawl coordinator: the driver-side half of pyspider's scheduler loop.

One ``round()`` is one iteration of the reference's ``run_once``
(scheduler.py:661-671): drain status packs → drain new tasks → cronjob
ticks → select under quotas.  Shards may be plain ``FrontierShard``
objects (tests, differential oracle) or Ray actor handles (the crawl
pipeline wraps calls and ``ray.get``s them); the coordinator only owns
the *sequential* state the reference keeps per project:

- select quotas  — weight-proportional, clamped to [limit/10, limit/3]
  (scheduler.py:500-522, O4);
- project token bucket — the reference has ONE bucket per project
  (task_queue.py:142), so rate limiting lives here, not per shard;
- ``on_finished`` emission — FAIL_PAUSE_NUM empty-select rounds after
  drain (scheduler.py:541-561, W3);
- pause FSM — 10-consecutive-fail pause / 5-min re-check / 3-probe
  unpause (scheduler.py:51-102, T6);
- cronjob ticks — 1 Hz virtual ticks, ``_on_cronjob`` every
  ``min_tick`` seconds (scheduler.py:419-449, W2).

Cross-shard ordering: every shard returns its top candidates
``(taskid, priority, sequence)``; the coordinator k-way merges by
(priority DESC, sequence ASC) — the exact single-heap comparator
(task_queue.py:55-66) — so the emitted fetch order is bit-for-bit the
reference's under the same seed list and budget.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable

from ..functions.urls import urlhash64
from ..model import FAIL_PAUSE_NUM, LOOP_LIMIT, PAUSE_TIME, UNPAUSE_CHECK_NUM
from .clock import wall_clock
from .frontier import FrontierShard, ProjectConfig
from .token_bucket import TokenBucket

TASK_PACK = 1


class ProjectRuntime:
    """Per-project sequential state (reference ``Project``, scheduler.py:26-137)."""

    def __init__(self, cfg: ProjectConfig, clock: Callable[[], float]):
        self.cfg = cfg
        self._clock = clock
        self.bucket = TokenBucket(rate=cfg.rate, burst=cfg.burst, clock=clock)
        self.active_tasks: deque = deque(maxlen=100)
        self.selected_tasks = False
        self.finished_event_wait = 0
        self._paused: bool | str = False
        self._paused_time = 0.0
        self._unpause_last_seen = None

    @property
    def paused(self) -> bool:
        """Pause FSM, transition-for-transition per scheduler.py:51-102."""
        if FAIL_PAUSE_NUM <= 0:
            return False
        now = self._clock()
        if not self._paused:
            fail_cnt = 0
            for _, task in self.active_tasks:
                if task.get("type") == TASK_PACK:
                    continue
                if task["track"]["process_ok"]:
                    break
                fail_cnt += 1
                if fail_cnt >= FAIL_PAUSE_NUM:
                    break
            if fail_cnt >= FAIL_PAUSE_NUM:
                self._paused = True
                self._paused_time = now
        elif self._paused is True and self._paused_time + PAUSE_TIME < now:
            self._paused = "checking"
            self._unpause_last_seen = (self.active_tasks[0][1]
                                       if self.active_tasks else None)
        elif self._paused == "checking":
            cnt = fail_cnt = 0
            for _, task in self.active_tasks:
                if task is self._unpause_last_seen:
                    break
                if task.get("type") == TASK_PACK:
                    continue
                cnt += 1
                if task["track"]["process_ok"]:
                    cnt = max(cnt, UNPAUSE_CHECK_NUM)
                    break
                fail_cnt += 1
            if cnt >= UNPAUSE_CHECK_NUM:
                if fail_cnt == cnt:
                    self._paused = True
                    self._paused_time = now
                else:
                    self._paused = False
        return self._paused is True


class Coordinator:
    def __init__(self, shards: list[FrontierShard],
                 clock: Callable[[], float] = wall_clock,
                 loop_limit: int = LOOP_LIMIT):
        self.shards = shards
        self.n_shards = len(shards)
        self._clock = clock
        self.loop_limit = loop_limit
        self.projects: dict[str, ProjectRuntime] = {}
        self._last_tick = int(clock())
        self._pending_control: list[dict] = []  # on_finished etc, next round
        self.emitted_log: list[tuple[str, str]] = []  # (project, taskid)
        self._seq = 0  # global enqueue-sequence counter (AtomInt parity)
        self._status_handles: list = []  # async status fan-outs in flight
        self._follow_handles: list = []  # async follow fan-outs in flight

    def _next_seq(self) -> int:
        self._seq += 1
        return self._seq

    # -- plumbing (overridden by the Ray-actor coordinator) ------------------
    def _call(self, shard, method: str, *args):
        return getattr(shard, method)(*args)

    def _call_all(self, method: str, *args) -> list:
        return [self._call(s, method, *args) for s in self.shards]

    # -- projects ------------------------------------------------------------
    def update_project(self, cfg: ProjectConfig) -> None:
        if cfg.name in self.projects:
            self.projects[cfg.name].cfg = cfg
            rt = self.projects[cfg.name]
            rt.bucket.rate, rt.bucket.burst = cfg.rate, cfg.burst
        else:
            self.projects[cfg.name] = ProjectRuntime(cfg, self._clock)
        self._call_all("update_project", cfg)

    def shard_of(self, taskid_hash: int) -> FrontierShard:
        return self.shards[taskid_hash % self.n_shards]

    def route(self, task: dict) -> int:
        h = task.get("urlhash")
        if h is None:
            h = urlhash64(task.get("url") or task["taskid"])
            task["urlhash"] = h
        return h % self.n_shards

    # -- round phases ---------------------------------------------------------
    def dispatch_status(self, packs: Iterable[dict]) -> dict:
        """Route status packs to owning shards (J3) + feed active_tasks ring
        with only the shard-accepted packs (scheduler.py:889-911)."""
        packs = list(packs)
        per_shard: list[list[dict]] = [[] for _ in self.shards]
        for pack in packs:
            pack["seq"] = self._next_seq()  # sequence for a potential re-put
            per_shard[self.route(pack)].append(pack)
        totals: dict[str, int] = {}
        now = self._clock()
        results = self._submit_per_shard("on_status_batch", per_shard)
        for batch, stats in zip(per_shard, results):
            if stats is None:
                continue
            for i in stats.pop("accepted", []):
                rt = self.projects.get(batch[i].get("project"))
                if rt is not None:
                    rt.active_tasks.appendleft((now, batch[i]))
            for k, v in stats.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def dispatch_requests(self, tasks: Iterable[dict]) -> dict:
        """Per-batch dedup (D2: FIRST-wins unless a later duplicate
        carries force_update, which takes the slot — matching the
        reference's run_once drain, scheduler.py:387-412) then shard
        routing."""
        merged: dict[tuple[str, str], dict] = {}
        for task in list(self._pending_control) + list(tasks):
            key = (task.get("project", ""), task.get("taskid", ""))
            if key in merged and not (task.get("schedule") or {}).get("force_update"):
                continue
            merged[key] = task
        self._pending_control = []
        per_shard: list[list[dict]] = [[] for _ in self.shards]
        for task in merged.values():
            task["seq"] = self._next_seq()
            per_shard[self.route(task)].append(task)
        totals: dict[str, int] = {}
        # every shard participates even with an empty batch: postponed
        # force_updates replay on each pass (scheduler.py:374-385)
        for stats in self._submit_per_shard("on_request_batch", per_shard,
                                            always=True):
            if stats is None:
                continue
            for k, v in stats.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def _submit(self, method: str, args_per_shard: list) -> list:
        """Fan per-shard calls out concurrently (overridden for Ray
        actors); ``args_per_shard[i] is None`` skips shard i."""
        return [self._call(shard, method, *args) if args is not None else None
                for shard, args in zip(self.shards, args_per_shard)]

    def _submit_per_shard(self, method: str, per_shard: list[list],
                          always: bool = False) -> list:
        return self._submit(method, [(batch,) if (batch or always) else None
                                     for batch in per_shard])

    def _fanout_shared(self, method: str, table, *extra) -> list:
        """Send ONE shared table to every shard; each shard filters its
        own hash range locally (``urlhash % n_shards == shard_id``).
        In-process this is just N direct calls on the same object; the
        Ray coordinator overrides it to a single ``ray.put`` so the
        driver serializes the round's control stream once instead of
        once per shard (and the per-column list conversion runs in the
        shards, in parallel, instead of on the driver)."""
        return self._fanout_gather(self._fanout_submit(method, table, *extra))

    def _fanout_submit(self, method: str, table, *extra) -> list:
        """Submit half of ``_fanout_shared``; in-process calls are
        synchronous so the 'handles' ARE the results.  The Ray
        coordinator returns actor-call refs so shard ingestion overlaps
        the driver's next chunk dispatch (actor calls from one driver
        run in submission order, so deferring the gather changes no
        shard-visible ordering)."""
        return [self._call(s, method, table, *extra) for s in self.shards]

    def _fanout_gather(self, handles: list) -> list:
        return handles

    def dispatch_status_tables(self, tables: list) -> dict:
        """Columnar status fan-out: build + submit + gather in one call."""
        self.begin_status_tables(tables)
        return self.finish_status_tables()

    def begin_status_tables(self, tables: list) -> None:
        """Async columnar status fan-out: driver-side seq assignment and
        submission happen now (in chunk-arrival order — deterministic);
        result gathering is deferred to ``finish_status_tables()``,
        which the round loop calls before select, so pause-FSM /
        active-ring semantics are identical to the synchronous path."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        tables = [t for t in tables if len(t)]
        if not tables:
            return
        t = pa.concat_tables(tables, promote_options="default")
        if "not_send_status" in t.column_names:
            # @not_send_status callbacks (cronjob/message plumbing) emit
            # no status pack (processor.py:174-176)
            t = t.filter(pc.invert(t["not_send_status"].combine_chunks()))
            if not len(t):
                return
        n = len(t)
        cols = {
            "taskid": t["taskid"], "urlhash": t["urlhash"],
            "project": t["project"], "url": t["url"],
            "status_code": t["status_code"], "fetch_time": t["fetch_time"],
            "process_ok": t["process_ok"], "process_time": t["process_time"],
            "n_follows": pc.list_value_length(t["follows"]).cast(pa.int32()),
            "seq": pa.array(np.arange(1, n + 1, dtype=np.int64) + self._seq),
        }
        if "etag" in t.column_names:
            cols["etag"] = t["etag"]
        if "last_modified" in t.column_names:
            cols["last_modified"] = t["last_modified"]
        status = pa.table(cols)
        self._seq += n
        self._status_handles.extend(
            self._fanout_submit("on_status_table", status))

    def finish_status_tables(self) -> dict:
        """Gather every pending async status fan-out (begin_status_tables)
        and fold the stats into the active-task rings."""
        handles, self._status_handles = self._status_handles, []
        totals: dict[str, int] = {}
        now = self._clock()
        for stats in self._fanout_gather(handles):
            if stats is None:
                continue
            for project, ok in stats.pop("tail", ()):
                rt = self.projects.get(project)
                if rt is not None:
                    rt.active_tasks.appendleft(
                        (now, {"track": {"process_ok": ok}}))
            for k, v in stats.items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def dispatch_follow_tables(self, tables: list, project: str,
                               priority: int = 0) -> dict:
        """Columnar follow fan-out: build + submit + gather in one call."""
        self.begin_follow_tables(tables, project, priority)
        return self.finish_follow_tables()

    def begin_follow_tables(self, tables: list, project: str,
                            priority: int = 0) -> None:
        """Flatten the processor's canonicalized follow columns and route
        them with numpy; D2 first-wins dedup runs on the int64 urlhash
        (64-bit md5 low bits — collision odds are negligible and a lost
        duplicate would only skip one redundant shard check).

        Async half: seq assignment + submission happen now; the gather is
        deferred to ``finish_follow_tables()``.  Per-actor mailbox FIFO
        means every shard ingests the follows before any later select
        fan-out it receives, so deferring the gather changes no ordering."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        tables = [t for t in tables if len(t)]
        if not tables:
            return
        t = pa.concat_tables(tables, promote_options="default")
        taskids = pc.list_flatten(t["follows_taskid"])
        if not len(taskids):
            return
        hashes = pc.list_flatten(t["follows_urlhash"]).to_numpy()
        urls = pc.list_flatten(t["follows"])
        hosts = pc.list_flatten(t["follows_host"])
        # handler-driven crawls attach per-follow callback/save/priority
        has_cb = "follows_callback" in t.column_names
        cbs = pc.list_flatten(t["follows_callback"]) if has_cb else None
        svs = pc.list_flatten(t["follows_save"]) if has_cb else None
        prios = pc.list_flatten(t["follows_priority"]).to_numpy() \
            if has_cb else None
        _, first_idx = np.unique(hashes, return_index=True)
        first_idx.sort()
        seqs = np.arange(1, len(first_idx) + 1, dtype=np.int64) + self._seq
        self._seq += len(first_idx)
        kept_hashes = hashes[first_idx]
        idx_arr = pa.array(first_idx)
        fcols = {"taskid": pc.take(taskids, idx_arr),
                 "urlhash": pa.array(kept_hashes),
                 "url": pc.take(urls, idx_arr),
                 "host": pc.take(hosts, idx_arr),
                 "seq": pa.array(seqs)}
        if has_cb:
            fcols["callback"] = pc.take(cbs, idx_arr)
            fcols["save"] = pc.take(svs, idx_arr)
            fcols["priority"] = pa.array(prios[first_idx])
        follows = pa.table(fcols)
        self._follow_handles.extend(
            self._fanout_submit("on_follow_table", follows, project, priority))

    def finish_follow_tables(self) -> dict:
        """Gather every pending async follow fan-out."""
        handles, self._follow_handles = self._follow_handles, []
        totals: dict[str, int] = {}
        for stats in self._fanout_gather(handles):
            for k, v in (stats or {}).items():
                totals[k] = totals.get(k, 0) + v
        return totals

    def tick_cronjobs(self) -> list[dict]:
        """W2: virtual 1 Hz ticks; emit _on_cronjob control rows."""
        out = []
        now = self._clock()
        while now - self._last_tick >= 1:
            self._last_tick += 1
            for name, rt in self.projects.items():
                mt = int(rt.cfg.min_tick or 0)
                if not rt.cfg.active or mt == 0 or self._last_tick % mt:
                    continue
                out.append({
                    "taskid": "_on_cronjob", "project": name,
                    "url": "data:,_on_cronjob",
                    # the save dict format is load-bearing: the handler's
                    # _on_cronjob fires NOTHING without {'tick': N}
                    # (scheduler.py:437-444)
                    "fetch": {"save": {"tick": self._last_tick}},
                    "process": {"callback": "_on_cronjob"},
                    "type": TASK_PACK,
                })
        return out

    def select(self) -> list[dict]:
        """_check_select (scheduler.py:463-566) over sharded frontiers."""
        weights: dict[str, int] = {}
        # one fused fan-out instead of check_update + queue_sizes back-to-back
        sizes_by_shard = self._call_all("check_update_sizes")
        for name, rt in self.projects.items():
            if not rt.cfg.active or rt.paused \
                    or getattr(rt.cfg, "paused", False):
                continue
            weights[name] = sum(s.get(name, 0) for s in sizes_by_shard)
        total_weight = sum(weights.values())
        limit = self.loop_limit
        min_limit, max_limit = int(limit / 10.0), int(limit / 3.0)

        selected: list[dict] = []
        cnt = 0
        for name, weight in weights.items():
            if cnt >= limit:
                break
            rt = self.projects[name]
            if total_weight < 1 or weight < 1:
                project_limit = min_limit
            else:
                project_limit = int(1.0 * weight / total_weight * limit)
                project_limit = min(max(project_limit, min_limit), max_limit)
            budget = min(project_limit, limit - cnt)
            # single per-project politeness bucket (reference semantics)
            tokens = int(rt.bucket.get())
            budget = min(budget, max(tokens, 0))
            project_cnt = 0
            if budget > 0:
                candidates = []  # (priority, sequence, shard_idx, taskid)
                for idx, peeked in enumerate(
                        self._call_all("peek_ready", name, budget)):
                    for taskid, priority, seq in peeked:
                        candidates.append((-priority, seq, idx, taskid))
                candidates.sort()
                # 'on_finished' control tasks ride for free: they do not
                # consume the per-project budget (scheduler.py:525-533)
                chosen = []
                non_ctrl = 0
                for cand in candidates:
                    if non_ctrl >= budget:
                        break
                    chosen.append(cand)
                    if cand[3] != "on_finished":
                        non_ctrl += 1
                per_shard: dict[int, list[str]] = {}
                for _, _, idx, taskid in chosen:
                    per_shard.setdefault(idx, []).append(taskid)
                args = [(name, per_shard[i]) if i in per_shard else None
                        for i in range(len(self.shards))]
                got: dict[str, dict] = {}
                for taken in self._submit("take", args):
                    for task in taken or ():
                        got[task["taskid"]] = task
                for _, _, _, taskid in chosen:
                    task = got.get(taskid)
                    if task is None:
                        continue
                    rt.bucket.desc()
                    selected.append(self._on_select_task(task, rt))
                    if taskid != "on_finished":
                        project_cnt += 1
                    cnt += 1
            if project_cnt:
                rt.selected_tasks = True
                rt.finished_event_wait = 0

            # on_finished quiescence (W3)
            if not project_cnt and weights.get(name, 0) == 0 and rt.selected_tasks:
                if rt.finished_event_wait < FAIL_PAUSE_NUM:
                    rt.finished_event_wait += 1
                else:
                    rt.selected_tasks = False
                    rt.finished_event_wait = 0
                    self._pending_control.append({
                        "project": name,
                        "taskid": "on_finished",
                        "url": "data:,on_finished",
                        "process": {"callback": "on_finished"},
                        "schedule": {"age": 0, "priority": 9,
                                     "force_update": True},
                    })
        return selected

    def _on_select_task(self, task: dict, rt: ProjectRuntime) -> dict:
        """on_select_task (scheduler.py:990-1008): crawl_config join (J6)
        + active-task ring append."""
        task = dict(task)
        task["type"] = TASK_PACK
        if rt.cfg.crawl_config:
            fetch = dict(rt.cfg.crawl_config.get("fetch") or {})
            fetch.update(task.get("fetch") or {})
            if fetch:
                task["fetch"] = fetch
            process = dict(rt.cfg.crawl_config.get("process") or {})
            process.update(task.get("process") or {})
            if process:
                task["process"] = process
        rt.active_tasks.appendleft((self._clock(), task))
        self.emitted_log.append((task["project"], task["taskid"]))
        return task

    def round(self, status_packs: list[dict] | None = None,
              new_tasks: list[dict] | None = None) -> list[dict]:
        """One scheduler loop pass; returns the fetch batch in emission
        order (status → requests → cronjob → select, run_once order)."""
        self.dispatch_status(status_packs or [])
        self.dispatch_requests(new_tasks or [])
        control = [self._on_select_task(t, self.projects[t["project"]])
                   for t in self.tick_cronjobs()]
        return control + self.select()

    def pause_status(self) -> dict[str, bool]:
        """get_projects_pause_status analogue (scheduler.py:782-787)."""
        return {name: rt.paused for name, rt in self.projects.items()}

    def drain_counters(self) -> dict[tuple[str, str], int]:
        """Gather + merge the per-shard counter partials (A3 final step)."""
        totals: dict[tuple[str, str], int] = {}
        for part in self._call_all("drain_counters"):
            for key, v in part.items():
                key = tuple(key)
                totals[key] = totals.get(key, 0) + v
        return totals

    def get_active_tasks(self, project: str | None = None,
                         limit: int = 100) -> list[tuple[float, dict]]:
        """A5 — merged recent-task feed across project rings, newest
        first (scheduler.py:738-780)."""
        import heapq
        rings = [rt.active_tasks for name, rt in self.projects.items()
                 if project is None or name == project]
        merged = heapq.merge(*rings, key=lambda item: item[0], reverse=True)
        return list(__import__("itertools").islice(merged, limit))

    def total_size(self) -> int:
        return sum(self._call_all("queue_size", None))

    def is_quiescent(self) -> bool:
        return all(self._call_all("is_quiescent")) and not self._pending_control

    # -- checkpoint (coordinator's own sequential state; shard snapshots
    # are taken separately per partition) ------------------------------------
    def snapshot(self) -> dict:
        return {
            "seq": self._seq,
            "last_tick": self._last_tick,
            "pending_control": list(self._pending_control),
            "emitted": len(self.emitted_log),
            "projects": {
                name: {
                    "bucket": rt.bucket.snapshot(),
                    "selected_tasks": rt.selected_tasks,
                    "finished_event_wait": rt.finished_event_wait,
                    "paused": rt._paused,
                    "paused_time": rt._paused_time,
                    "active_tasks": list(rt.active_tasks),
                } for name, rt in self.projects.items()
            },
        }

    def restore_state(self, snap: dict) -> None:
        self._seq = snap["seq"]
        self._last_tick = snap["last_tick"]
        self._pending_control = list(snap["pending_control"])
        for name, pstate in snap["projects"].items():
            rt = self.projects.get(name)
            if rt is None:
                continue
            rt.bucket = TokenBucket.restore(pstate["bucket"], self._clock)
            rt.selected_tasks = pstate["selected_tasks"]
            rt.finished_event_wait = pstate["finished_event_wait"]
            rt._paused = pstate["paused"]
            rt._paused_time = pstate["paused_time"]
            rt.active_tasks.extend(pstate["active_tasks"])

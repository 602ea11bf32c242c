"""Generic processor stage driven by a user ``BaseHandler`` subclass —
the T5 script-cache role: the handler is constructed ONCE per actor
(map_batches callable class / persistent worker), then dispatches each
batch row through ``run_task`` (M13/M14, processor/processor.py:102-203).

Output is a compact Arrow CONTROL table shaped for the coordinator's
columnar fan-outs:

- status columns   → ``Coordinator.dispatch_status_tables`` (rows with
  ``not_send_status`` are filtered there, processor.py:174-176 parity);
- *simple* follows — tasks whose only kwargs are priority / callback /
  save — ride the vectorized ``follows_*`` list columns straight into
  ``FrontierShard.on_follow_batch`` (the 100 TB-scale path: link fan-out
  never serializes through the driver);
- *rich* follows (age / itag / force_update / auto_recrawl / exetime /
  cancel / extra fetch kwargs) are JSON in ``follows_extra_json`` and
  take the reference's own dict path (``dispatch_requests``) — these
  are rare by construction (re-crawl policy changes, not link fan-out);
- messages → ``messages_json`` (J7);
- result payloads → ``result`` JSON strings, filtered into the Parquet
  sink worker-side (wide data never returns to the driver).

Follow routing key: ``urlhash64(url)`` — consistent with
``Coordinator.route``.  A custom ``get_taskid`` that maps two URLs to
one taskid may route them to different shards; dedup then happens at
the shard store, costing one redundant fetch (the reference's
thread-routing by taskid hash has the mirror-image property for
URL-keyed politeness).
"""

from __future__ import annotations

import json
import time

import pyarrow as pa

from ..functions.urls import url_host, urlhash64
from ..handler import BaseHandler, Response

SIMPLE_SCHEDULE = {"priority"}
SIMPLE_FETCH = {"save"}
SIMPLE_PROCESS = {"callback"}

HANDLER_CONTROL_COLUMNS = [
    "taskid", "urlhash", "project", "url", "host", "status_code",
    "fetch_time", "process_ok", "process_time", "not_send_status", "etag",
    "last_modified",
    "follows", "follows_taskid", "follows_urlhash", "follows_host",
    "follows_callback", "follows_save", "follows_priority",
    "follows_extra_json", "messages_json", "result", "has_result",
]


def _is_simple(task: dict) -> bool:
    return (set(task.get("schedule") or ()) <= SIMPLE_SCHEDULE
            and set(task.get("fetch") or ()) <= SIMPLE_FETCH
            and set(task.get("process") or ()) <= SIMPLE_PROCESS)


def _resp_header(headers_json: str, name: str) -> str:
    """Case-insensitive header lookup in a resp_headers JSON blob."""
    if not headers_json:
        return ""
    try:
        h = json.loads(headers_json)
    except (TypeError, ValueError):
        return ""
    for k, v in h.items():
        if k.lower() == name:
            return v or ""
    return ""


def _save_str(save) -> str:
    if save is None:
        return ""
    if isinstance(save, str):
        return save
    return json.dumps(save, default=str)


class HandlerProcessorStage:
    def __init__(self, handler_cls: type[BaseHandler], project: str):
        self.handler = handler_cls(project_name=project)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {name: batch[name].to_pylist()
                for name in ("taskid", "urlhash", "project", "url", "host",
                             "status_code", "content", "fetch_error",
                             "fetch_time", "callback", "save", "retried",
                             "process_time_limit", "resp_headers")
                if name in batch.column_names}
        resp_headers = cols.get("resp_headers", [""] * n)
        callbacks = cols.get("callback", [None] * n)
        saves = cols.get("save", [None] * n)
        limits = cols.get("process_time_limit", [0.0] * n)

        process_ok, process_time, not_send, results, has_result = \
            [], [], [], [], []
        f_url, f_taskid, f_hash, f_host, f_cb, f_save, f_prio = \
            [], [], [], [], [], [], []
        extra_json, messages = [], []

        for i in range(n):
            task = {
                "taskid": cols["taskid"][i],
                "project": cols["project"][i],
                "url": cols["url"][i],
                "process": {"callback": callbacks[i] or "__call__"},
            }
            if limits[i]:
                task["process"]["process_time_limit"] = limits[i]
            save = saves[i]
            if save:
                try:
                    save = json.loads(save)
                except (TypeError, ValueError):
                    pass
            else:
                save = None
            response = Response(
                status_code=cols.get("status_code", [200] * n)[i],
                url=cols["url"][i],
                content=cols.get("content", [b""] * n)[i] or b"",
                headers=(json.loads(resp_headers[i])
                         if resp_headers[i] else {}),
                error=(cols.get("fetch_error", [None] * n)[i] or None),
                save=save,
                time=cols.get("fetch_time", [0.0] * n)[i])
            t0 = time.perf_counter()
            out = self.handler.run_task(task, response)
            process_time.append(time.perf_counter() - t0)
            process_ok.append(out.ok)
            not_send.append(out.not_send_status)
            res = (json.dumps(out.result, default=str)
                   if out.result is not None else "")
            results.append(res)
            has_result.append(bool(res))

            urls_i, tids_i, hashes_i, hosts_i = [], [], [], []
            cbs_i, saves_i, prios_i, extra_i = [], [], [], []
            for follow in out.follows:
                if _is_simple(follow):
                    u = follow["url"]
                    urls_i.append(u)
                    tids_i.append(follow["taskid"])
                    hashes_i.append(urlhash64(u))
                    hosts_i.append("" if u.startswith("data:")
                                   else url_host(u))
                    cbs_i.append((follow.get("process") or {})
                                 .get("callback") or "__call__")
                    saves_i.append(_save_str((follow.get("fetch") or {})
                                             .get("save")))
                    prios_i.append(int((follow.get("schedule") or {})
                                       .get("priority") or 0))
                else:
                    extra_i.append(follow)
            f_url.append(urls_i)
            f_taskid.append(tids_i)
            f_hash.append(hashes_i)
            f_host.append(hosts_i)
            f_cb.append(cbs_i)
            f_save.append(saves_i)
            f_prio.append(prios_i)
            extra_json.append(json.dumps(extra_i, default=str)
                              if extra_i else "")
            messages.append(json.dumps([
                {"project": p, "msg": m, "url": u}
                for p, m, u in out.messages], default=str)
                if out.messages else "")

        # J5 — the response's validators flow back to the stored task so
        # auto_recrawl/age re-crawls send If-None-Match/If-Modified-Since
        # (the reference reuses track.fetch.headers the same way)
        etag_out, lm_out = [], []
        for i in range(n):
            etag_out.append(_resp_header(resp_headers[i], "etag"))
            lm_out.append(_resp_header(resp_headers[i], "last-modified"))

        out_t = batch.drop_columns(
            [c for c in ("content", "callback", "save", "retried",
                         "process_time_limit", "fetch_error", "etag",
                         "last_modified", "fetch_type", "fetch_json",
                         "resp_headers")
             if c in batch.column_names])
        return (out_t
                .append_column("process_ok", pa.array(process_ok, pa.bool_()))
                .append_column("process_time", pa.array(process_time,
                                                        pa.float64()))
                .append_column("not_send_status", pa.array(not_send,
                                                           pa.bool_()))
                .append_column("etag", pa.array(etag_out, pa.string()))
                .append_column("last_modified", pa.array(lm_out,
                                                         pa.string()))
                .append_column("follows", pa.array(f_url,
                                                   pa.list_(pa.string())))
                .append_column("follows_taskid",
                               pa.array(f_taskid, pa.list_(pa.string())))
                .append_column("follows_urlhash",
                               pa.array(f_hash, pa.list_(pa.int64())))
                .append_column("follows_host",
                               pa.array(f_host, pa.list_(pa.string())))
                .append_column("follows_callback",
                               pa.array(f_cb, pa.list_(pa.string())))
                .append_column("follows_save",
                               pa.array(f_save, pa.list_(pa.string())))
                .append_column("follows_priority",
                               pa.array(f_prio, pa.list_(pa.int64())))
                .append_column("follows_extra_json",
                               pa.array(extra_json, pa.string()))
                .append_column("messages_json", pa.array(messages,
                                                         pa.string()))
                .append_column("result", pa.array(results, pa.string()))
                .append_column("has_result", pa.array(has_result,
                                                      pa.bool_())))


HANDLER_RESULT_COLUMNS = ["taskid", "project", "url", "result"]


def handler_result_table(batch: pa.Table) -> pa.Table:
    """Project result rows for the Parquet sink (resultdb.save parity)."""
    mask = batch["has_result"]
    cols = [c for c in HANDLER_RESULT_COLUMNS if c in batch.column_names]
    return batch.filter(mask).select(cols)


def handler_control_table(batch: pa.Table) -> pa.Table:
    return batch.select([c for c in HANDLER_CONTROL_COLUMNS
                         if c in batch.column_names])


def message_tasks(messages_json: str, from_project: str) -> list[dict]:
    """J7 delivery: synthesize ``_on_message`` tasks for target projects
    (processor.py:177-193 + base_handler.py:429-434)."""
    import hashlib
    out = []
    for m in json.loads(messages_json or "[]"):
        mkey = hashlib.md5(
            f"{m['project']}:{m['msg']}".encode()).hexdigest()[:8]
        out.append({
            "taskid": f"_on_message:{mkey}",
            "project": m["project"],
            "url": m.get("url", "data:,on_message"),
            "process": {"callback": "_on_message"},
            "fetch": {"save": json.dumps([from_project, m["msg"]])},
            "schedule": {"priority": 9, "force_update": True},
        })
    return out

"""Generic processor stage driven by a user ``BaseHandler`` subclass —
the T5 script-cache role: the handler is constructed ONCE per actor
(map_batches callable class / persistent worker), then dispatches each
batch row through ``run_task`` (M13/M14).

Output is a compact Arrow control table: status fields + JSON-encoded
follows / messages / results, so arbitrary user callbacks ride the
same crawl loop as the built-in synthetic link handler.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..handler import BaseHandler, Response


class HandlerProcessorStage:
    def __init__(self, handler_cls: type[BaseHandler], project: str):
        self.handler = handler_cls(project_name=project)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {name: batch[name].to_pylist()
                for name in ("taskid", "urlhash", "project", "url", "host",
                             "status_code", "content", "fetch_error",
                             "fetch_time") if name in batch.column_names}
        process_ok, not_send, results, follows, messages = \
            [], [], [], [], []
        callbacks = batch["callback"].to_pylist() \
            if "callback" in batch.column_names else [None] * n
        saves = batch["save"].to_pylist() \
            if "save" in batch.column_names else [None] * n
        for i in range(n):
            task = {
                "taskid": cols["taskid"][i],
                "project": cols["project"][i],
                "url": cols["url"][i],
                "process": {"callback": callbacks[i] or "__call__"},
            }
            save = saves[i]
            if save:
                try:
                    save = json.loads(save)
                except (TypeError, ValueError):
                    pass
            response = Response(
                status_code=cols.get("status_code", [200] * n)[i],
                url=cols["url"][i],
                content=cols.get("content", [b""] * n)[i] or b"",
                error=(cols.get("fetch_error", [None] * n)[i] or None),
                save=save,
                time=cols.get("fetch_time", [0.0] * n)[i])
            out = self.handler.run_task(task, response)
            process_ok.append(out.ok)
            not_send.append(out.not_send_status)
            results.append(json.dumps(out.result, default=str)
                           if out.result is not None else "")
            follows.append(json.dumps(out.follows, default=str))
            messages.append(json.dumps([
                {"project": p, "msg": m, "url": u}
                for p, m, u in out.messages], default=str))
        out_t = batch.drop_columns(
            [c for c in ("content",) if c in batch.column_names])
        return (out_t
                .append_column("process_ok", pa.array(process_ok, pa.bool_()))
                .append_column("not_send_status", pa.array(not_send,
                                                           pa.bool_()))
                .append_column("result", pa.array(results, pa.string()))
                .append_column("follows_json", pa.array(follows, pa.string()))
                .append_column("messages_json", pa.array(messages,
                                                         pa.string())))


def message_tasks(messages_json: str, from_project: str) -> list[dict]:
    """J7 delivery: synthesize ``_on_message`` tasks for target projects
    (processor.py:177-193 + base_handler.py:429-434)."""
    out = []
    for m in json.loads(messages_json or "[]"):
        out.append({
            "taskid": f"_on_message:{hash((m['project'], str(m['msg']))) & 0xffffffff:x}",
            "project": m["project"],
            "url": m.get("url", "data:,on_message"),
            "process": {"callback": "_on_message"},
            "fetch": {"save": json.dumps([from_project, m["msg"]])},
            "schedule": {"priority": 9, "force_update": True},
        })
    return out

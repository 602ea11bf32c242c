"""Debugger-lite: the reference webui's single-task debug surface
(``pyspider/webui/debug.py`` — POST a script + one task, run exactly
one fetch + callback, inspect follows/result/logs) re-expressed over
this engine's own pieces: ``sources.projectdb.build_handler`` (script
→ handler class), ``stages.http_fetcher.HttpFetcher`` (one real fetch,
data: URLs included) and ``handler.BaseHandler.run_task`` (the M13/M14
dispatch harness with stdout capture + cooperative time budget).

Nothing here touches a running crawl: the debug handler is a fresh
instance per call, exactly like the reference's one-shot
``ProjectManager.get`` + ``fetcher.fetch`` + ``processor`` chain in
debug mode.  The webapi exposes this as ``POST /debug``.
"""

from __future__ import annotations

import json
import time
from typing import Any

from .functions.urls import md5_taskid, url_host
from .handler import BaseHandler, Response
from .sources.projectdb import build_handler, parse_script_meta


def default_task(url: str, project: str = "__debug__",
                 callback: str = "on_start") -> dict:
    """The debug UI's default task for a URL (webui/debug.py seeds
    ``on_start`` against the project's start url)."""
    return {
        "taskid": md5_taskid(url),
        "project": project,
        "url": url,
        "process": {"callback": callback},
    }


def _fetch(task: dict, fetcher=None) -> dict:
    """One fetch through the real fetch stage; returns the raw fetch
    dict (code/content/headers/error/time)."""
    from .stages.http_fetcher import HttpFetcher
    f = fetcher if fetcher is not None else HttpFetcher()
    return f._fetch_one(task["url"], task)


def debug_run(script: str, url: str | None = None,
              task: dict | None = None, project: str = "__debug__",
              fetcher=None) -> dict:
    """Run ONE task of ``script`` end-to-end and return everything the
    debug UI shows: the fetch summary, the callback's result, follows,
    messages, captured logs and the exception (if any).

    ``task`` wins over ``url``; with only ``url`` the default
    ``on_start`` task is built.  Never raises for script/fetch/callback
    problems — they come back in the payload, the way the debug UI
    renders tracebacks instead of 500ing.
    """
    t0 = time.perf_counter()
    try:
        handler_cls = build_handler(
            {"name": project, "script": script})
    except Exception as exc:
        return {"ok": False, "exception": f"script error: {exc!r}",
                "fetch": None, "result": None, "follows": [],
                "messages": [], "logs": "",
                "time": time.perf_counter() - t0}
    if task is None:
        if not url:
            return {"ok": False, "exception": "need url or task",
                    "fetch": None, "result": None, "follows": [],
                    "messages": [], "logs": "", "time": 0.0}
        task = default_task(url, project)
    task.setdefault("project", project)
    task.setdefault("taskid", md5_taskid(task.get("url", "")))
    handler = handler_cls(project_name=project)
    # project-level crawl_config merges in with per-task precedence
    # (M7/J6), as the live data plane does before fetching
    task = BaseHandler.task_join_crawl_config(
        task, getattr(handler_cls, "crawl_config", {}) or {})

    fr = _fetch(task, fetcher=fetcher)
    save: Any = (task.get("fetch") or {}).get("save")
    if isinstance(save, str):
        try:
            save = json.loads(save)
        except (TypeError, ValueError):
            pass
    response = Response(
        status_code=fr.get("code", 599),
        url=task.get("url", ""),
        content=fr.get("content", b"") or b"",
        headers=fr.get("headers") or {},
        error=fr.get("error") or None,
        save=save,
        time=fr.get("time", 0.0))
    out = handler.run_task(task, response)
    return {
        "ok": out.ok,
        "exception": out.exception,
        "fetch": {"status_code": response.status_code,
                  "url": response.url,
                  "headers": response.headers,
                  "content_length": len(response.content),
                  "error": response.error,
                  "time": response.time},
        "result": out.result,
        "follows": out.follows,
        "messages": out.messages,
        "logs": out.logs,
        "time": time.perf_counter() - t0,
    }


def script_meta(script: str) -> dict:
    """The debug UI's script side-panel info: parsed header comment
    (rate/burst) + detected handler class name, without running it."""
    meta = dict(parse_script_meta(script))
    try:
        meta["handler_class"] = build_handler(
            {"name": "__meta__", "script": script}).__name__
    except Exception as exc:
        meta["error"] = repr(exc)
    return meta

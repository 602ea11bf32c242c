"""User-extension surface (SURVEY.md §2.10): the handler protocol.

A from-scratch re-expression of pyspider's ``BaseHandler`` API
(pyspider/libs/base_handler.py) so reference scripts port with renames
only:

- ``self.crawl(url, **kwargs)`` — the 30-kwarg task constructor
  (base_handler.py:255-340/:347-398): per-callback ``@config`` defaults,
  params/data packing, schedule/fetch/process kwarg splitting,
  ``get_taskid`` identity (md5(url), :342-344), in-callback follows
  dedup (D1, :336-339);
- ``@config`` / ``@every`` / ``@catch_status_code_error`` /
  ``@not_send_status`` decorators (:26-119), with the metaclass
  collecting cronjobs and computing the GCD ``min_tick``;
- ``run_task`` harness (M13/M14, :145-218): callback dispatch by
  ``process.callback``, 304 skip, ``raise_for_status`` gate, generator
  expansion, exception capture → ``ProcessorResult``;
- hooks: ``on_result`` / ``on_message`` / ``on_finished`` /
  ``send_message`` (J7) (:404-427).

Differences by design: no per-task SIGALRM timeout (actor pools are
multi-threaded; a cooperative budget check replaces it), and responses
are Arrow rows rehydrated into a lazy ``Response`` (libs/response.py
analogue) with lxml-backed views gated behind import-try.
"""

from __future__ import annotations

import inspect
import json
import math
from dataclasses import dataclass, field
from typing import Any
from urllib.parse import urlencode

from .functions.urls import (build_url, curl_to_arguments, md5_taskid,
                             quote_non_ascii)


def catch_status_code_error(func):
    """Let the callback see non-2xx responses (base_handler.py:26-32)."""
    func._catch_status_code_error = True
    return func


def not_send_status(func):
    func._not_send_status = True
    return func


def config(_config=None, **kwargs):
    """Default ``crawl`` kwargs for tasks with this callback."""
    if _config is None:
        _config = {}
    _config.update(kwargs)

    def wrapper(func):
        func._config = _config
        return func
    return wrapper


class _NOTSET:
    pass


def every(minutes=_NOTSET, seconds=_NOTSET):
    """Mark a callback as a cronjob firing every interval (W2)."""
    def wrapper(func):
        func.is_cronjob = True
        func.tick = m * 60 + s
        return func

    if inspect.isfunction(minutes):  # bare @every
        func, m, s = minutes, 1, 0
        return wrapper(func)
    m = 0 if minutes is _NOTSET else minutes
    s = 0 if seconds is _NOTSET else seconds
    if minutes is _NOTSET and seconds is _NOTSET:
        m = 1
    return wrapper


class HTTPError(Exception):
    def __init__(self, status_code: int, message: str = ""):
        self.status_code = status_code
        super().__init__(f"HTTP {status_code} {message}")


class ProcessTimeout(Exception):
    """Cooperative stand-in for the reference's SIGALRM
    ``process_time_limit`` (base_handler.py:145-218, utils.py:168-210).
    Actor pools are multi-threaded so signals can't interrupt a
    callback; instead the budget is checked at every ``self.crawl``
    call (the natural yield point of handler code) and once more when
    the callback returns — an over-budget callback fails its TASK (and
    takes the retry ladder), never the actor."""


class Response:
    """Lazy fetch-result views (pyspider/libs/response.py:22-163)."""

    def __init__(self, status_code: int = 200, url: str = "",
                 orig_url: str = "", content: bytes = b"",
                 headers: dict | None = None, error: str | None = None,
                 save: Any = None, time: float = 0.0):
        self.status_code = status_code
        self.url = url
        self.orig_url = orig_url or url
        self.content = content
        self.headers = headers or {}
        self.error = error
        self.save = save
        self.time = time
        self._text: str | None = None
        self._doc = None

    @property
    def encoding(self) -> str:
        """M11 — charset sniffing (response.py:61-95/:211-234): Content-
        Type header param, then <meta charset>, then the statistical
        detector (functions/encoding.py — the reference's chardet slot);
        declared charsets are dropped when the bytes contradict them
        (valid multibyte UTF-8 beats a stale gb2312 label, and a label
        that can't strict-decode the body falls through to detection).
        gb2312 widens to gb18030 as in the reference."""
        enc = None
        ctype = ""
        for k, v in self.headers.items():
            if k.lower() == "content-type":
                ctype = v or ""
        if "charset=" in ctype:
            enc = ctype.split("charset=", 1)[1].split(";")[0].strip()
        if not enc and isinstance(self.content, bytes):
            head = self.content[:1024].decode("latin-1", "replace").lower()
            for marker in ('charset="', "charset='", "charset="):
                if marker in head:
                    tail = head.split(marker, 1)[1]
                    enc = tail.split('"')[0].split("'")[0] \
                        .split(">")[0].split(";")[0].strip()
                    break
        enc = (enc or "").lower() or None
        if enc == "gb2312":
            enc = "gb18030"
        from .functions.encoding import sniff_encoding
        return sniff_encoding(self.content, enc)

    @property
    def text(self) -> str:
        if self._text is None:
            if isinstance(self.content, bytes):
                try:
                    self._text = self.content.decode(self.encoding, "replace")
                except LookupError:
                    self._text = self.content.decode("utf-8", "replace")
            else:
                self._text = str(self.content)
        return self._text

    @property
    def json(self) -> Any:
        return json.loads(self.text)

    @property
    def cookies(self) -> dict:
        """Session cookies from the response's Set-Cookie headers
        (T8; libs/response.py cookies property analogue)."""
        from .functions.cookies import extract_cookies
        return extract_cookies(self.headers)

    @property
    def doc(self):
        """Parsed document with links absolutized (response.py:139-163).
        PyQuery when lxml is installed; otherwise the stdlib-parser
        MiniDoc substitute (same ``doc('a[href]')`` call shape)."""
        if self._doc is None:
            try:
                # any pyquery failure (absent, stubbed, lxml parse
                # error) falls back to the stdlib parser
                from pyquery import PyQuery
                d = PyQuery(self.text)
                d.make_links_absolute(self.url)
                self._doc = d
            except Exception:
                from .functions.htmldoc import MiniDoc
                self._doc = MiniDoc(self.text, base_url=self.url)
        return self._doc

    @property
    def etree(self):
        try:
            from lxml import etree as _etree
        except ImportError as exc:
            raise NotImplementedError("lxml not available") from exc
        return _etree.fromstring(self.content)

    def raise_for_status(self) -> None:
        """M15 — response.py:165-184: 304 passes, errors/4xx/5xx raise."""
        if self.status_code == 304:
            return
        if self.error:
            raise HTTPError(self.status_code, self.error)
        if self.status_code < 200 or self.status_code >= 400:
            raise HTTPError(self.status_code)

    @property
    def ok(self) -> bool:
        try:
            self.raise_for_status()
            return True
        except HTTPError:
            return False


@dataclass
class ProcessorResult:
    """processor.py:43-98 analogue."""
    result: Any = None
    follows: list = field(default_factory=list)
    messages: list = field(default_factory=list)
    logs: str = ""                      # captured callback stdout (M14)
    exception: str | None = None
    not_send_status: bool = False

    @property
    def ok(self) -> bool:
        return self.exception is None


class HandlerMeta(type):
    def __new__(mcls, name, bases, attrs):
        cron_jobs = []
        min_tick = 0
        for value in attrs.values():
            if inspect.isfunction(value) and getattr(value, "is_cronjob",
                                                     False):
                cron_jobs.append(value)
                min_tick = math.gcd(int(min_tick), int(value.tick))
        cls = super().__new__(mcls, name, bases, attrs)
        # inherit parent cronjobs — deduped BY NAME, subclass wins: an
        # overridden @every method must not also fire the stale parent
        # implementation (an override that drops @every disables the
        # job, matching normal method-resolution expectations)
        own = {j.__name__ for j in cron_jobs}
        own |= {k for k, v in attrs.items() if inspect.isfunction(v)}
        inherited = []
        for base in bases:
            for job in getattr(base, "_cron_jobs", ()):
                if job.__name__ in own:
                    continue
                own.add(job.__name__)
                inherited.append(job)
                min_tick = math.gcd(int(min_tick), int(job.tick))
        cls._cron_jobs = inherited + cron_jobs
        cls._min_tick = min_tick
        return cls


class BaseHandler(metaclass=HandlerMeta):
    crawl_config: dict = {}
    retry_delay: dict = {}
    project_name: str | None = None

    SCHEDULE_FIELDS = ("priority", "retries", "exetime", "age", "itag",
                       "force_update", "auto_recrawl", "cancel")
    FETCH_FIELDS = ("method", "headers", "user_agent", "data", "timeout",
                    "connect_timeout", "allow_redirects", "cookies", "proxy",
                    "etag", "last_modified", "save", "fetch_type", "use_gzip",
                    "validate_cert", "max_redirects", "robots_txt")
    PROCESS_FIELDS = ("callback", "process_time_limit")

    def __init__(self, project_name: str | None = None):
        if project_name:
            self.project_name = project_name
        self._reset()

    def _reset(self) -> None:
        self._follows: list[dict] = []
        self._follows_keys: set[str] = set()
        self._messages: list[tuple] = []
        self.task: dict | None = None
        self.response: Response | None = None
        self._budget_deadline: float | None = None

    def check_time_budget(self) -> None:
        """Raise ProcessTimeout once the task's ``process_time_limit``
        budget is spent; called automatically by ``self.crawl`` and
        available to long loops that don't crawl."""
        import time
        if self._budget_deadline is not None \
                and time.monotonic() > self._budget_deadline:
            raise ProcessTimeout(
                f"process_time_limit exceeded in "
                f"{(self.task or {}).get('taskid', '?')}")

    # -- the crawl API -------------------------------------------------------
    def crawl(self, url, **kwargs):
        self.check_time_budget()
        if isinstance(url, str) and url.startswith("curl "):
            curl_kwargs = curl_to_arguments(url)
            url = curl_kwargs.pop("urls")
            for k, v in curl_kwargs.items():
                kwargs.setdefault(k, v)
        if isinstance(url, str):
            return self._crawl(url, **kwargs)
        return [self._crawl(u, **kwargs) for u in url]

    def _crawl(self, url: str, **kwargs) -> dict:
        assert len(url) < 1024, "Maximum (1024) URL length error."
        callback = kwargs.get("callback")
        if callback is not None:
            if callable(callback):
                kwargs["callback"] = callback.__name__
            name = kwargs["callback"]
            if not hasattr(self, name):
                raise NotImplementedError(f"self.{name}() not implemented!")
            func = getattr(self, name)
            for k, v in getattr(func, "_config", {}).items():
                if isinstance(v, dict) and isinstance(kwargs.get(k), dict):
                    kwargs[k].update(v)
                else:
                    kwargs.setdefault(k, v)

        url = quote_non_ascii(build_url(url.strip(), kwargs.pop("params",
                                                                None)))
        if kwargs.get("data") and not isinstance(kwargs["data"], str):
            kwargs["data"] = urlencode(kwargs["data"])
        if kwargs.get("data"):
            kwargs.setdefault("method", "POST")
        if kwargs.get("user_agent"):
            # the reference KEEPS user_agent as a fetch field besides
            # injecting the header (base_handler.py:298-300)
            kwargs.setdefault("headers", {})
            kwargs["headers"]["User-Agent"] = kwargs["user_agent"]

        task: dict = {"project": self.project_name, "url": url}
        schedule = {}
        for key in self.SCHEDULE_FIELDS:
            if key in kwargs:
                schedule[key] = kwargs.pop(key)
            elif key in self.crawl_config:
                schedule[key] = self.crawl_config[key]
        task["schedule"] = schedule
        task["fetch"] = {k: kwargs.pop(k) for k in list(kwargs)
                         if k in self.FETCH_FIELDS}
        task["process"] = {k: kwargs.pop(k) for k in list(kwargs)
                           if k in self.PROCESS_FIELDS}
        task["taskid"] = kwargs.pop("taskid", None) or self.get_taskid(task)
        if kwargs:
            raise TypeError(f"crawl() got unexpected keyword argument: "
                            f"{list(kwargs)}")
        cache_key = f"{task['project']}:{task['taskid']}"
        if cache_key not in self._follows_keys:   # D1
            self._follows_keys.add(cache_key)
            self._follows.append(task)
        return task

    def get_taskid(self, task: dict) -> str:
        """md5(url) by default; override for custom identity (M6)."""
        return md5_taskid(task["url"])

    @staticmethod
    def task_join_crawl_config(task: dict, crawl_config: dict) -> dict:
        """M7/J6 — merge project-level crawl_config into task fetch /
        process dicts with per-task precedence; nested dicts merge with
        task values winning (base_handler.py:227-253)."""
        task_fetch = task.get("fetch", {})
        for k in BaseHandler.FETCH_FIELDS:
            if k in crawl_config:
                v = crawl_config[k]
                if isinstance(v, dict) and isinstance(task_fetch.get(k), dict):
                    merged = dict(v)
                    merged.update(task_fetch[k])
                    task_fetch[k] = merged
                else:
                    task_fetch.setdefault(k, v)
        if task_fetch:
            task["fetch"] = task_fetch
        task_process = task.get("process", {})
        for k in BaseHandler.PROCESS_FIELDS:
            if k in crawl_config:
                v = crawl_config[k]
                if isinstance(v, dict) and isinstance(task_process.get(k),
                                                      dict):
                    task_process[k].update(v)
                else:
                    task_process.setdefault(k, v)
        if task_process:
            task["process"] = task_process
        return task

    # -- dispatch harness ----------------------------------------------------
    def run_task(self, task: dict, response: Response | dict) -> ProcessorResult:
        import time
        if isinstance(response, dict):
            response = Response(**response)
        self._reset()
        self.task = task
        self.response = response
        limit = (task.get("process") or {}).get("process_time_limit")
        t0 = time.monotonic()
        if limit:
            self._budget_deadline = t0 + float(limit)
        out = ProcessorResult()
        # M14 — stdout capture: callback prints land in result.logs
        # (the reference's SaveLogHandler/ListO buffer role)
        import contextlib
        import io
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                result = self._dispatch(task, response)
                if inspect.isgenerator(result):
                    for r in result:
                        self.check_time_budget()
                        self.on_result(r)
                else:
                    self.on_result(result)
                    out.result = result
            # M14 — cooperative budget: a callback that ran past its
            # limit fails even though it returned (the SIGALRM analogue)
            if limit and time.monotonic() - t0 > float(limit):
                raise ProcessTimeout(
                    f"process_time_limit={limit}s exceeded "
                    f"({time.monotonic() - t0:.3f}s)")
        except Exception as exc:  # never raise out of the harness (M13)
            out.exception = repr(exc)
            out.result = None  # a failed task ships no result row
        out.logs = buf.getvalue()
        callback = (task.get("process") or {}).get("callback", "__call__")
        func = getattr(self, callback, None)
        out.not_send_status = bool(getattr(func, "_not_send_status", False))
        out.follows = self._follows
        out.messages = self._messages
        self.task = None
        self.response = None
        return out

    def _dispatch(self, task: dict, response: Response):
        callback = (task.get("process") or {}).get("callback", "__call__")
        if not hasattr(self, callback):
            raise NotImplementedError(f"self.{callback}() not implemented!")
        func = getattr(self, callback)
        catches = getattr(func, "_catch_status_code_error", False)
        if response.status_code == 304 and not catches:
            return None
        if not catches:
            response.raise_for_status()
        sig = inspect.signature(func)
        if len(sig.parameters) >= 2:
            return func(response, task)
        return func(response)

    # -- hooks ---------------------------------------------------------------
    def send_message(self, project: str, msg: Any,
                     url: str = "data:,on_message") -> None:
        """J7 — route a message task to another project."""
        self._messages.append((project, msg, url))

    def on_message(self, project: str, msg: Any):
        pass

    def on_result(self, result: Any) -> None:
        pass  # collected by the processor stage; override to intercept

    def on_start(self, response):
        pass

    def on_finished(self, response, task=None):
        pass

    @not_send_status
    def _on_message(self, response):
        project, msg = response.save
        return self.on_message(project, msg)

    @not_send_status
    def _on_cronjob(self, response):
        """Fire every @every job whose interval divides the scheduler's
        tick.  A trigger without a ``{'tick': N}`` save dict fires
        NOTHING (base_handler.py:435-446) — firing all jobs on tick=0
        would collapse every interval to the GCD min_tick."""
        save = response.save
        if not isinstance(save, dict) or "tick" not in save:
            return
        tick = int(save["tick"])
        for job in self._cron_jobs:
            if tick % int(job.tick) != 0:
                continue
            self._run_bound(job, response)

    def _run_bound(self, func, response):
        sig = inspect.signature(func)
        n = len(sig.parameters)
        if n >= 2:
            return func(self, response)
        return func(self)

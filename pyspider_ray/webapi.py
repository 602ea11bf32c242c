"""Results/metrics HTTP API + browser UI — the data surface of the
reference's webui (result browser ``webui/result.py:20-54``, the
dashboard's counter/active-task feeds ``webui/index.py``) on stdlib
``http.server``; JSON in/out, plus two self-contained HTML pages
(webui_pages.py) over the same JSON endpoints.

Endpoints
---------
- ``GET /``                dashboard page (webui/index.py +
  templates/index.html parity: project rows w/ pause/rate controls,
  counters, queue sizes, recent rounds, active tasks, result preview)
- ``GET /debug``           script editor/debugger page (webui/debug.py
  + templates/debug.html parity: edit → run one task → save/hot-swap)
- ``GET /debug/script``    the editor's initial script content
- ``GET /results?project=&offset=&limit=``   paged result rows + count
  (resultdb.select semantics: offset/limit paging over saved results)
- ``GET /results/dump/<project>.json|.txt|.csv?offset=&limit=``
  streamed export through functions/export.py (S10 result_dump parity;
  csv infers common columns the same way)
- ``GET /counters?window=5m|1h|1d|all``      MetricsHub counter tree
- ``GET /active_tasks?project=``             the T9 ring, newest first
- ``GET /metrics``                           per-round pipeline metrics
- ``GET /projects``                          project config + runtime rows
- ``GET /queues``                            per-project frontier sizes
- ``GET /task?project=&taskid=``             point task lookup (track view)

Runtime control (the reference scheduler's xmlrpc verbs,
scheduler.py:693-736, + run.py:808-835 send_message) — POSTs enqueue
onto ``CrawlPipeline.control_inbox`` and apply at the next round
boundary, the loop-polled semantics of the reference:

- ``POST /projects/<name>/pause`` / ``/unpause``  halt / resume select
- ``POST /projects/<name>/rate``  body {"rate":, "burst":}
- ``POST /newtask``               body = task dict (taskid, url, ...)
- ``POST /messages``              body {"project":, "message":}
- ``POST /debug``                 body {"script":, "url": | "task":}
  one-shot fetch + callback through the handler harness
  (webui/debug.py parity) — returns follows/result/logs/exception

WebDAV script mount (webdav.py here; reference ``webui/webdav.py``):
``/dav/`` lists the crawl's scripts as ``<name>.py``; GET reads, PUT
saves (registered script → validated save + hot-swap), PROPFIND/LOCK
for editor mounts.

Auth (reference ``webui/login.py`` before_request): ``serve(...,
username=, password=, need_auth=True)`` requires HTTP Basic
credentials on EVERY endpoint — JSON, pages, and DAV alike; failures
get the reference's 401 ``need auth.`` challenge.

The server reads parquet result partitions fragment-by-fragment for
paging, so a page request never loads the whole result set; at
cluster scale this endpoint fronts the same partitioned store every
worker writes to.  Serving runs on a daemon thread; handlers only
READ pipeline state (the pause FSM, counters and the results dir are
safe to observe concurrently)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

from . import webdav
from .functions.export import dump_as_csv, dump_as_json, dump_as_txt


class PipelineProvider:
    """Read adapter over a CrawlPipeline (or anything shaped like one)."""

    def __init__(self, pipe):
        self.pipe = pipe

    # -- results ------------------------------------------------------------
    def _fragments(self):
        import os
        import pyarrow.dataset as pads
        d = self.pipe.results_dir
        if not os.path.isdir(d) or not any(
                f for f in os.listdir(d) if not f.endswith(".tmp")):
            return None
        return pads.dataset(d)

    def results_count(self, project: str | None) -> int:
        ds = self._fragments()
        if ds is None:
            return 0
        if not project:
            return ds.count_rows()
        import pyarrow.dataset as pads
        return ds.count_rows(filter=pads.field("project") == project)

    @staticmethod
    def _decode_row(row: dict) -> dict:
        if isinstance(row.get("result"), str):
            try:
                row["result"] = json.loads(row["result"])
            except (TypeError, ValueError):
                pass
        if isinstance(row.get("bytes"), bytes):
            row["bytes"] = f"<{len(row['bytes'])} bytes>"
        return row

    def iter_results(self, project: str | None, offset: int,
                     limit: int | None):
        """Fragment-wise row generator: stream record batches, skip
        ``offset`` rows, stop after ``limit`` (None = all) — holds at
        most one record batch in memory at a time."""
        ds = self._fragments()
        if ds is None:
            return
        import pyarrow.dataset as pads
        flt = (pads.field("project") == project) if project else None
        to_skip = max(0, offset)
        remaining = limit
        for batch in ds.to_batches(filter=flt):
            if not batch.num_rows:
                continue
            if to_skip >= batch.num_rows:
                to_skip -= batch.num_rows
                continue
            take = batch.slice(to_skip) if remaining is None \
                else batch.slice(to_skip, remaining)
            to_skip = 0
            for row in take.to_pylist():
                yield self._decode_row(row)
            if remaining is not None:
                remaining -= take.num_rows
                if remaining <= 0:
                    return

    def results_page(self, project: str | None, offset: int,
                     limit: int) -> list[dict]:
        return list(self.iter_results(project, offset, limit))

    # -- metrics ------------------------------------------------------------
    def counters(self, window: str) -> dict:
        hub = self.pipe.metrics_hub
        if window not in hub.WINDOWS:
            raise KeyError(window)
        with self.pipe.ctl_lock:
            return hub.to_dict(window)

    def active_tasks(self, project: str | None) -> list:
        out = []
        with self.pipe.ctl_lock:
            for name, rt in list(self.pipe.coord.projects.items()):
                if project and name != project:
                    continue
                for ts, task in rt.active_tasks:
                    out.append([ts, task])
        out.sort(key=lambda e: -e[0])
        return out

    def round_metrics(self) -> list[dict]:
        with self.pipe.ctl_lock:
            return list(self.pipe.metrics)

    # -- runtime control (reference scheduler xmlrpc, scheduler.py:693-736
    #    update_project/newtask/send_task + run.py:808-835 send_message) ----
    def control(self, cmd: dict) -> dict:
        """Queue one control command for the round loop; it applies at
        the next round boundary (``CrawlPipeline.apply_controls``) —
        the same loop-polled semantics as the reference's projectdb
        re-read after an xmlrpc update_project."""
        self.pipe.control_inbox.put(cmd)
        return {"queued": True, "op": cmd.get("op"),
                "project": cmd.get("project")}

    def projects(self) -> list[dict]:
        """Dashboard project rows (webui/index.py): config + runtime."""
        out = []
        with self.pipe.ctl_lock:
            for name, rt in list(self.pipe.coord.projects.items()):
                # raw FSM flag, not the ``paused`` property: the
                # property RUNS transitions, which belong to the round
                # loop's thread
                out.append({"name": name, "active": rt.cfg.active,
                            "paused": (rt._paused is True
                                       or getattr(rt.cfg, "paused",
                                                  False)),
                            "rate": rt.cfg.rate, "burst": rt.cfg.burst,
                            "min_tick": rt.cfg.min_tick})
        return out

    def queue_sizes(self) -> dict:
        """Per-project frontier sizes summed over shards (the xmlrpc
        ``size`` call).  ``queue_sizes`` is the pure read — no
        check_update side effects."""
        total: dict[str, int] = {}
        with self.pipe.ctl_lock:
            for sizes in self.pipe.coord._call_all("queue_sizes"):
                for name, n in sizes.items():
                    total[name] = total.get(name, 0) + int(n)
        return total

    def get_task(self, project: str, taskid: str) -> dict | None:
        """Point task lookup across shards (webui/task.py track view)."""
        with self.pipe.ctl_lock:
            for t in self.pipe.coord._call_all("get_task", project,
                                               taskid):
                if t:
                    return t
        return None

    def get_script(self) -> dict:
        """The debug editor's initial content: the crawl's registered
        script file when the crawl is script-driven, else the sample
        scaffold (webui/index.py 'create' semantics)."""
        path = getattr(self.pipe.cfg, "script_path", None)
        if path:
            with open(path) as f:
                return {"script": f.read(), "path": path}
        from .webui_pages import SAMPLE_SCRIPT
        return {"script": SAMPLE_SCRIPT, "path": None}

    def save_script(self, script: str) -> dict:
        """The script editor's save (webui/debug.py save → projectdb
        update): validate the script BUILDS, write it atomically to the
        crawl's registered script file, and queue the hot-swap (handler
        class + rate/burst + worker pool) for the next round boundary.
        409 when the crawl isn't script-driven."""
        import os
        path = getattr(self.pipe.cfg, "script_path", None)
        if not path:
            raise LookupError("crawl is not script-driven "
                              "(no --script path registered)")
        from .sources.projectdb import build_handler
        build_handler({"name": "__save_check__", "script": script,
                       "path": path})   # raises on a broken script
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(script)
        os.replace(tmp, path)
        self.pipe.control_inbox.put({"op": "update_script"})
        return {"saved": True, "path": path, "queued": True}


class _Handler(BaseHTTPRequestHandler):
    provider: PipelineProvider = None   # set by serve()
    dav = None                          # ScriptDav | None, set by serve()
    auth: tuple | None = None           # (username, password) when need_auth
    protocol_version = "HTTP/1.1"       # chunked transfer for dumps

    def log_message(self, *a):   # quiet
        pass

    def _gate(self) -> bool:
        """HTTP Basic gate (webui/login.py:56-77): True = proceed.
        Applied to every verb when the server was started with
        ``need_auth`` credentials."""
        if self.auth is None:
            return True
        header = self.headers.get("Authorization") or ""
        if header.startswith("Basic "):
            import base64
            try:
                user, _, pw = base64.b64decode(
                    header[len("Basic "):]).decode("utf-8").partition(":")
                if (user, pw) == self.auth:
                    return True
            except Exception:
                pass
        body = b"need auth."
        self.send_response(401)
        self.send_header("WWW-Authenticate",
                         'Basic realm="Login Required"')
        self.send_header("Content-Type", "text/plain; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        return False

    def _json(self, obj, code: int = 200) -> None:
        body = json.dumps(obj, ensure_ascii=False, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _stream(self, chunks, mime: str) -> None:
        """Chunked transfer encoding, one wire chunk per ~64 KB of
        export output — a full-store dump never accumulates in driver
        memory (the generator chain pulls one record batch at a time)."""
        # pull the first chunk BEFORE the headers: an immediate
        # generator failure (bad store path, corrupt first fragment)
        # still surfaces as a clean JSON 500 via the caller's handler
        it = iter(chunks)
        try:
            first: str | None = next(it)
        except StopIteration:
            first = None
        self.send_response(200)
        self.send_header("Content-Type", f"{mime}; charset=utf-8")
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        buf: list[str] = []
        size = 0

        def flush() -> None:
            nonlocal buf, size
            if size:
                data = "".join(buf).encode()
                self.wfile.write(f"{len(data):x}\r\n".encode()
                                 + data + b"\r\n")
                buf, size = [], 0
        try:
            for c in ([first] if first is not None else []):
                buf.append(c)
                size += len(c)
            for c in it:
                buf.append(c)
                size += len(c)
                if size >= 65536:
                    flush()
        except Exception as exc:
            # the 200 + chunked headers are already on the wire — a
            # late generator failure must ABORT the connection (no
            # terminal 0-chunk), never inject a JSON 500 into the open
            # chunk stream.  The truncated stream is the error signal.
            import logging
            logging.getLogger("pyspider_ray.webapi").error(
                "dump stream aborted mid-body: %s", exc)
            self.close_connection = True
            try:
                self.wfile.flush()
            except Exception:
                pass
            return
        flush()
        self.wfile.write(b"0\r\n\r\n")

    def _html(self, body: str) -> None:
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):   # noqa: C901 — a dispatch table in if-form
        if not self._gate():
            return
        p = self.provider
        u = urlsplit(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        try:
            if self.dav is not None and webdav.handle_get(self, self.dav):
                pass
            elif u.path in ("/", "/index.html"):
                from .webui_pages import INDEX_HTML
                self._html(INDEX_HTML)
            elif u.path == "/debug":
                from .webui_pages import DEBUG_HTML
                self._html(DEBUG_HTML)
            elif u.path == "/debug/script":
                self._json(p.get_script())
            elif u.path == "/results":
                project = q.get("project")
                offset = int(q.get("offset", 0))
                limit = min(int(q.get("limit", 20)), 1000)
                self._json({
                    "count": p.results_count(project),
                    "offset": offset, "limit": limit,
                    "results": p.results_page(project, offset, limit)})
            elif u.path.startswith("/results/dump/"):
                name = u.path[len("/results/dump/"):]
                if "." not in name:
                    self._json({"error": "use <project>.<json|txt|csv>"},
                               400)
                    return
                project, fmt = name.rsplit(".", 1)
                offset = int(q.get("offset", 0))
                limit = int(q.get("limit", 0)) or None   # None = stream all
                rows = p.iter_results(project or None, offset, limit)
                if fmt == "json":
                    self._stream(dump_as_json(rows), "application/json")
                elif fmt == "txt":
                    self._stream(dump_as_txt(rows), "text/plain")
                elif fmt == "csv":
                    self._stream(dump_as_csv(rows), "text/csv")
                else:
                    self._json({"error": f"unknown format {fmt!r}"}, 400)
            elif u.path == "/counters":
                try:
                    self._json(p.counters(q.get("window", "5m")))
                except KeyError:
                    self._json({"error": "window must be one of "
                                         "5m/1h/1d/all"}, 400)
            elif u.path == "/active_tasks":
                self._json(p.active_tasks(q.get("project")))
            elif u.path == "/metrics":
                self._json(p.round_metrics())
            elif u.path == "/projects":
                self._json(p.projects())
            elif u.path == "/queues":
                self._json(p.queue_sizes())
            elif u.path == "/task":
                project, taskid = q.get("project"), q.get("taskid")
                if not project or not taskid:
                    self._json({"error": "need project= and taskid="},
                               400)
                    return
                task = p.get_task(project, taskid)
                self._json(task if task is not None
                           else {"error": "not found"},
                           200 if task is not None else 404)
            else:
                self._json({"error": "not found", "endpoints": [
                    "/ (dashboard)", "/debug (script editor)",
                    "/debug/script",
                    "/results", "/results/dump/<project>.<fmt>",
                    "/counters", "/active_tasks", "/metrics",
                    "/projects", "/queues", "/task",
                    "POST /projects/<name>/pause|unpause|rate|script",
                    "POST /newtask", "POST /messages",
                    "POST /debug",
                    "/dav/ (WebDAV script mount)"]}, 404)
        except BrokenPipeError:
            pass
        except Exception as exc:   # read-only surface: surface, don't die
            self._json({"error": str(exc)}, 500)

    def _read_body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if n > (8 << 20):
            raise ValueError("body too large")
        raw = self.rfile.read(n) if n else b""
        if not raw:
            return {}
        body = json.loads(raw)
        if not isinstance(body, dict):
            raise ValueError("JSON object body required")
        return body

    # -- WebDAV verbs (webdav.py; reference webui/webdav.py) ------------------
    def _dav_or_404(self):
        """The ScriptDav when the path is under the mount, else None
        (after answering 404/405)."""
        is_dav = self.path.split("?", 1)[0].rstrip("/") == webdav.MOUNT \
            or self.path.startswith(webdav.MOUNT + "/")
        if self.dav is None or not is_dav:
            self._json({"error": "not found"}, 404)
            return None
        return self.dav

    def do_OPTIONS(self):
        if not self._gate():
            return
        webdav.handle_options(self)

    def do_HEAD(self):
        if not self._gate():
            return
        if self.dav is None or not webdav.handle_get(self, self.dav,
                                                     head=True):
            self._json({"error": "not found"}, 404)

    def do_PROPFIND(self):
        if not self._gate():
            return
        dav = self._dav_or_404()
        if dav is not None:
            webdav.handle_propfind(self, dav)

    def do_PUT(self):
        if not self._gate():
            return
        dav = self._dav_or_404()
        if dav is not None:
            try:
                webdav.handle_put(self, dav)
            except BrokenPipeError:
                pass
            except Exception as exc:
                self._json({"error": str(exc)}, 500)

    def do_LOCK(self):
        if not self._gate():
            return
        if self._dav_or_404() is not None:
            webdav.handle_lock(self)

    def do_UNLOCK(self):
        if not self._gate():
            return
        if self._dav_or_404() is not None:
            webdav.handle_unlock(self)

    def do_DELETE(self):
        if not self._gate():
            return
        if self._dav_or_404() is not None:
            webdav.handle_forbidden(self)

    do_MKCOL = do_MOVE = do_COPY = do_PROPPATCH = do_DELETE

    def do_POST(self):
        """Runtime control (the reference scheduler's xmlrpc verbs) +
        the single-task debugger (webui/debug.py)."""
        if not self._gate():
            return
        p = self.provider
        u = urlsplit(self.path)
        try:
            body = self._read_body()
            parts = [s for s in u.path.split("/") if s]
            if len(parts) == 3 and parts[0] == "projects" \
                    and parts[2] in ("pause", "unpause"):
                self._json(p.control({"op": parts[2],
                                      "project": parts[1]}))
            elif len(parts) == 3 and parts[0] == "projects" \
                    and parts[2] == "script":
                if not body.get("script"):
                    self._json({"error": "need script"}, 400)
                    return
                try:
                    self._json(p.save_script(body["script"]))
                except LookupError as exc:
                    self._json({"error": str(exc)}, 409)
                except (SyntaxError, ValueError) as exc:
                    self._json({"error": f"script error: {exc}"}, 400)
            elif len(parts) == 3 and parts[0] == "projects" \
                    and parts[2] == "rate":
                if body.get("rate") is None and body.get("burst") is None:
                    self._json({"error": "need rate and/or burst"}, 400)
                    return
                self._json(p.control({
                    "op": "update_rate", "project": parts[1],
                    "rate": body.get("rate"), "burst": body.get("burst")}))
            elif u.path == "/newtask":
                if not body.get("taskid") or not body.get("url"):
                    self._json({"error": "task needs taskid and url"},
                               400)
                    return
                self._json(p.control({"op": "newtask", "task": body,
                                      "project": body.get("project")}))
            elif u.path == "/messages":
                if "message" not in body:
                    self._json({"error": "need message"}, 400)
                    return
                self._json(p.control({
                    "op": "message", "project": body.get("project"),
                    "message": body["message"]}))
            elif u.path == "/debug":
                if not body.get("script"):
                    self._json({"error": "need script"}, 400)
                    return
                from .debugger import debug_run
                self._json(debug_run(
                    body["script"], url=body.get("url"),
                    task=body.get("task"),
                    project=body.get("project") or "__debug__"))
            else:
                self._json({"error": "not found"}, 404)
        except (ValueError, KeyError) as exc:
            self._json({"error": str(exc)}, 400)
        except BrokenPipeError:
            pass
        except Exception as exc:
            self._json({"error": str(exc)}, 500)


def serve(pipe, host: str = "127.0.0.1", port: int = 0,
          username: str | None = None, password: str | None = None,
          need_auth: bool = False, dav_root: str | None = None):
    """Start the API on a daemon thread; returns the HTTPServer (its
    ``server_address`` carries the bound port; ``shutdown()`` stops it).

    ``need_auth`` + ``username``/``password``: HTTP Basic on every
    endpoint (webui/login.py parity).  ``dav_root``: directory for the
    ``/dav`` script mount; defaults to the registered script's
    directory when the crawl is script-driven, else the mount is off.
    """
    provider = PipelineProvider(pipe)
    dav = webdav.ScriptDav(provider, dav_root)
    handler = type("_BoundHandler", (_Handler,), {
        "provider": provider,
        "dav": dav if dav.enabled else None,
        "auth": (username or "", password or "") if need_auth else None,
    })
    srv = ThreadingHTTPServer((host, port), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv

"""Script-file project loader (S6) — the reference's local projectdb +
project-module loader re-expressed for the Ray engine:

- ``LocalProjectDB(files)``: glob script files, parse ``# rate:`` /
  ``# burst:`` comment headers, track status / updatetime
  (database/local/projectdb.py:20-73);
- ``build_handler(project)``: exec the script text as a module, find
  the ``BaseHandler`` subclass (``__handler_cls__`` override wins),
  return the class (processor/project_module.py:30-87);
- ``ScriptProcessorStage``: the T5 script-cache actor stage with
  version-keyed hot reload — each batch stats the script file and
  rebuilds the handler instance in place when md5/updatetime changed
  (project_module.py:96-154 ``_need_update``/``check_update``), so a
  script edit changes crawl behavior WITHOUT an actor restart.

Reference scripts beginning ``from pyspider.libs.base_handler import *``
load unmodified: a compat alias module mapping that import path onto
``pyspider_ray.handler`` is registered at exec time (only when no real
pyspider package is importable).
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
import sys
import types

# project statuses (database/base/projectdb.py:12-25)
STATUSES = ("TODO", "STOP", "CHECKING", "DEBUG", "RUNNING")
ACTIVE_STATUSES = ("DEBUG", "RUNNING")

_RATE_RE = re.compile(r"^\s*#\s*rate.*?(\d+(\.\d+)?)", re.I | re.M)
_BURST_RE = re.compile(r"^\s*#\s*burst.*?(\d+(\.\d+)?)", re.I | re.M)
_STATUS_RE = re.compile(r"^\s*#\s*status.*?\b(TODO|STOP|CHECKING|DEBUG|"
                        r"RUNNING)\b", re.I | re.M)


def parse_script_meta(script: str) -> dict:
    """# rate: / # burst: / # status: comment headers → dict."""
    m = _RATE_RE.search(script)
    rate = float(m.group(1)) if m else 1.0
    m = _BURST_RE.search(script)
    burst = float(m.group(1)) if m else 3.0
    m = _STATUS_RE.search(script)
    status = m.group(1).upper() if m else "RUNNING"
    return {"rate": rate, "burst": burst, "status": status}


def _build_project(filename: str) -> dict | None:
    try:
        with open(filename) as fp:
            script = fp.read()
    except OSError:
        return None
    meta = parse_script_meta(script)
    return {
        "name": os.path.splitext(os.path.basename(filename))[0],
        "group": None,
        "status": meta["status"],
        "script": script,
        "path": filename,
        "comments": None,
        "rate": meta["rate"],
        "burst": meta["burst"],
        "updatetime": os.path.getmtime(filename),
        "md5sum": hashlib.md5(script.encode()).hexdigest(),
    }


class LocalProjectDB:
    """Projects from script files; re-globbing picks up edits/adds/
    deletes (database/local/projectdb.py:25-44 semantics)."""

    def __init__(self, files: list[str]):
        self.files = list(files)
        self.projects: dict[str, dict] = {}
        self.load_scripts()

    def load_scripts(self) -> None:
        stale = set(self.projects)
        for path in self.files:
            for filename in glob.glob(path):
                name = os.path.splitext(os.path.basename(filename))[0]
                stale.discard(name)
                known = self.projects.get(name)
                if known is None or \
                        os.path.getmtime(filename) > known["updatetime"]:
                    project = _build_project(filename)
                    if project:
                        self.projects[name] = project
        for name in stale:
            del self.projects[name]

    def get(self, name: str) -> dict | None:
        return self.projects.get(name)

    def get_all(self):
        return list(self.projects.values())

    def check_update(self, timestamp: float):
        """Projects whose script changed after ``timestamp``."""
        self.load_scripts()
        return [p for p in self.projects.values()
                if p["updatetime"] > timestamp]


_ALIAS_KEYS = ("pyspider", "pyspider.libs", "pyspider.libs.base_handler")


def _make_compat_modules() -> dict:
    """Module triple mapping the reference's import path onto OUR
    handler API, so unmodified reference scripts exec against this
    engine's BaseHandler."""
    from .. import handler as _h
    pkg = types.ModuleType("pyspider")
    libs = types.ModuleType("pyspider.libs")
    bh = types.ModuleType("pyspider.libs.base_handler")
    for name in dir(_h):
        if not name.startswith("_"):
            setattr(bh, name, getattr(_h, name))
    pkg.libs = libs
    libs.base_handler = bh
    return {"pyspider": pkg, "pyspider.libs": libs,
            "pyspider.libs.base_handler": bh}


def build_handler(project: dict):
    """Exec the project script, return its BaseHandler subclass
    (project_module.py:30-87; ``__handler_cls__`` override wins).

    The compat alias is FORCED for the duration of the exec (and the
    previous sys.modules entries restored after): a script must always
    subclass THIS engine's BaseHandler, even if something else — e.g.
    the differential tests importing the real reference module — has
    already claimed the ``pyspider.libs.base_handler`` name."""
    from ..handler import BaseHandler
    saved = {k: sys.modules.get(k) for k in _ALIAS_KEYS}
    sys.modules.update(_make_compat_modules())
    try:
        module = types.ModuleType(project["name"])
        module.__dict__["__name__"] = project["name"]
        code = compile(project["script"],
                       project.get("path", project["name"]), "exec")
        exec(code, module.__dict__)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    cls = module.__dict__.get("__handler_cls__")
    if cls is None:
        for value in module.__dict__.values():
            if isinstance(value, type) and value is not BaseHandler \
                    and issubclass(value, BaseHandler):
                cls = value
    if cls is None:
        raise ValueError(f"need BaseHandler subclass in project "
                         f"{project['name']}")
    return cls


class ScriptProcessorStage:
    """Handler data plane driven by a script FILE with hot reload:
    construction loads the script once (T5); every batch stats the
    file and rebuilds the handler when its md5/mtime changed — a
    script edit takes effect mid-crawl with no actor restart."""

    def __init__(self, script_path: str, project: str | None = None):
        self.script_path = script_path
        self.project_name = project or os.path.splitext(
            os.path.basename(script_path))[0]
        self._mtime = 0.0
        self._md5 = ""
        self._stage = None
        self._reload_if_changed()

    @property
    def meta(self) -> dict:
        return self._meta

    def _reload_if_changed(self) -> None:
        try:
            mtime = os.path.getmtime(self.script_path)
        except OSError:
            return
        if self._stage is not None and mtime <= self._mtime:
            return
        project = _build_project(self.script_path)
        if project is None or project["md5sum"] == self._md5:
            self._mtime = mtime
            return
        from ..stages.handler_processor import HandlerProcessorStage
        cls = build_handler(project)
        self._stage = HandlerProcessorStage(cls, self.project_name)
        self._mtime = mtime
        self._md5 = project["md5sum"]
        self._meta = {"rate": project["rate"], "burst": project["burst"],
                      "status": project["status"],
                      "md5sum": project["md5sum"]}

    def __call__(self, batch):
        self._reload_if_changed()
        return self._stage(batch)

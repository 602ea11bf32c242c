"""WebDAV script mount — the reference's ``webui/webdav.py`` (a
wsgidav app exposing every project as ``<name>.py`` at ``/dav/``, GET
to read, PUT to save with the scheduler picking the edit up) rebuilt
on the stdlib HTTP server webapi.py already runs; no wsgidav, no WSGI.

Semantics (reference parity, file:line cited per method):

- the mount lists ``*.py`` scripts in the crawl's script directory —
  the LocalProjectDB glob model (sources/projectdb.py) stands in for
  the reference's projectdb collection (webdav.py:133-162
  ``RootCollection.getMemberList``);
- ``GET /dav/<name>.py`` returns the script text
  (webdav.py:99-100 ``ScriptResource.getContent``);
- ``PUT /dav/<name>.py`` saves: the crawl's REGISTERED script goes
  through the validated save + hot-swap queue (the same path as the
  editor's save endpoint — webdav.py:109-130 ``endWrite`` →
  projectdb.update → scheduler reload), any other ``.py`` name is a
  new-project script written beside it (webdav.py:64-76 new_project
  insert); non-``.py`` names are refused (HTTP_FORBIDDEN parity);
- ``PROPFIND`` (depth 0/1) answers the usual live props so davfs /
  cadaver / editor mounts browse it;
- ``LOCK``/``UNLOCK`` hand out a stub exclusive token (class-2
  editors refuse to save without one; there is no concurrent-editor
  coordination to protect — the round loop serializes the swap);
- ``DELETE``/``MKCOL``/``MOVE``/``COPY`` are 403: projects are files
  on the user's disk here, removal stays an explicit filesystem act.

Auth: when the server runs with ``need_auth`` (webapi.serve), every
DAV verb — like every other endpoint — requires HTTP Basic
credentials (webui/login.py:73-77 ``before_request`` +
webdav.py:182-200 ``NeedAuthController`` collapsed into one gate).
"""

from __future__ import annotations

import os
from email.utils import formatdate
from urllib.parse import unquote
from xml.sax.saxutils import escape

MOUNT = "/dav"


class ScriptDav:
    """Filesystem-backed DAV provider over the crawl's script dir."""

    def __init__(self, provider, root_dir: str | None = None):
        self.p = provider
        script = getattr(provider.pipe.cfg, "script_path", None)
        self.script_path = os.path.abspath(script) if script else None
        if root_dir is None and self.script_path:
            root_dir = os.path.dirname(self.script_path)
        self.root = os.path.abspath(root_dir) if root_dir else None

    @property
    def enabled(self) -> bool:
        return self.root is not None

    # -- resources -----------------------------------------------------------
    def members(self) -> list[str]:
        """``*.py`` basenames in the mount (RootCollection parity)."""
        try:
            names = sorted(f for f in os.listdir(self.root)
                           if f.endswith(".py")
                           and os.path.isfile(os.path.join(self.root, f)))
        except OSError:
            return []
        return names

    def resolve(self, name: str) -> str | None:
        """Member name → absolute path, confined to the mount dir."""
        if "/" in name or "\\" in name or name in ("", ".", ".."):
            return None
        path = os.path.abspath(os.path.join(self.root, name))
        if os.path.dirname(path) != self.root:
            return None
        return path

    def stat(self, name: str):
        path = self.resolve(name)
        if path is None or not os.path.isfile(path):
            return None
        st = os.stat(path)
        return {"size": st.st_size, "mtime": st.st_mtime}

    def read(self, name: str) -> bytes | None:
        path = self.resolve(name)
        if path is None or not os.path.isfile(path):
            return None
        with open(path, "rb") as f:
            return f.read()

    def write(self, name: str, content: bytes) -> tuple[int, dict]:
        """PUT: (status_code, json-able detail).  The registered script
        takes the validated save + hot-swap path; other ``.py`` names
        are new/sibling project scripts (plain atomic write)."""
        if not name.endswith(".py"):
            return 403, {"error": "only .py scripts live here"}
        path = self.resolve(name)
        if path is None:
            return 403, {"error": "bad resource name"}
        existed = os.path.isfile(path)
        if self.script_path and path == self.script_path:
            try:
                out = self.p.save_script(content.decode("utf-8"))
            except (SyntaxError, ValueError, UnicodeDecodeError) as exc:
                return 403, {"error": f"script error: {exc}"}
            except LookupError as exc:      # not script-driven
                return 409, {"error": str(exc)}
            return (204 if existed else 201), out
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(content)
        os.replace(tmp, path)
        return (204 if existed else 201), {"saved": True, "path": path}

    # -- PROPFIND ------------------------------------------------------------
    def _prop_xml(self, href: str, displayname: str, is_dir: bool,
                  size: int = 0, mtime: float | None = None) -> str:
        rtype = "<D:resourcetype><D:collection/></D:resourcetype>" \
            if is_dir else "<D:resourcetype/>"
        extra = "" if is_dir else (
            f"<D:getcontentlength>{size}</D:getcontentlength>"
            "<D:getcontenttype>text/plain</D:getcontenttype>")
        lm = "" if mtime is None else (
            "<D:getlastmodified>"
            f"{formatdate(mtime, usegmt=True)}</D:getlastmodified>")
        return (
            "<D:response>"
            f"<D:href>{escape(href)}</D:href>"
            "<D:propstat><D:prop>"
            f"<D:displayname>{escape(displayname)}</D:displayname>"
            f"{rtype}{extra}{lm}"
            "</D:prop><D:status>HTTP/1.1 200 OK</D:status></D:propstat>"
            "</D:response>")

    def propfind(self, name: str | None, depth: str) -> str | None:
        """Multistatus body for the mount root (name None) or one
        member; None = 404."""
        parts = []
        if name is None:
            st = None
            try:
                st = os.stat(self.root)
            except OSError:
                pass
            parts.append(self._prop_xml(
                MOUNT + "/", "dav", True,
                mtime=st.st_mtime if st else None))
            if depth != "0":
                for member in self.members():
                    s = self.stat(member)
                    if s:
                        parts.append(self._prop_xml(
                            f"{MOUNT}/{member}", member, False,
                            s["size"], s["mtime"]))
        else:
            s = self.stat(name)
            if s is None:
                return None
            parts.append(self._prop_xml(
                f"{MOUNT}/{name}", name, False, s["size"], s["mtime"]))
        return ('<?xml version="1.0" encoding="utf-8"?>'
                '<D:multistatus xmlns:D="DAV:">'
                + "".join(parts) + "</D:multistatus>")


# -- HTTP method implementations (called from webapi._Handler) ---------------

def _xml(handler, body: str, code: int = 207) -> None:
    data = body.encode()
    handler.send_response(code)
    handler.send_header("Content-Type", 'application/xml; charset="utf-8"')
    handler.send_header("Content-Length", str(len(data)))
    handler.end_headers()
    handler.wfile.write(data)


def _split(path: str) -> tuple[bool, str | None]:
    """path → (is_dav, member-or-None).  ``/dav`` and ``/dav/`` are
    the collection; ``/dav/<name>`` a member."""
    if path == MOUNT or path == MOUNT + "/":
        return True, None
    if path.startswith(MOUNT + "/"):
        # clients percent-encode member names; decode BEFORE the
        # resolve() confinement check so ..%2F can't smuggle a slash
        return True, unquote(path[len(MOUNT) + 1:])
    return False, None


def handle_options(handler) -> None:
    handler.send_response(200)
    handler.send_header("DAV", "1,2")
    handler.send_header("Allow", "OPTIONS, PROPFIND, GET, HEAD, PUT, "
                                 "LOCK, UNLOCK")
    handler.send_header("MS-Author-Via", "DAV")   # Windows mini-redirector
    handler.send_header("Content-Length", "0")
    handler.end_headers()


def handle_propfind(handler, dav: ScriptDav) -> None:
    _, member = _split(handler.path.split("?", 1)[0])
    depth = handler.headers.get("Depth", "1")
    # drain any request body (some clients send a prop list)
    n = int(handler.headers.get("Content-Length") or 0)
    if n:
        handler.rfile.read(n)
    body = dav.propfind(member, depth)
    if body is None:
        handler._json({"error": "not found"}, 404)
        return
    _xml(handler, body)


def handle_get(handler, dav: ScriptDav, head: bool = False) -> bool:
    """GET/HEAD for /dav paths; returns False when not a DAV path."""
    is_dav, member = _split(handler.path.split("?", 1)[0])
    if not is_dav:
        return False
    if member is None:      # collection listing, humans + curl
        handler._json({"mount": MOUNT, "scripts": dav.members()})
        return True
    data = dav.read(member)
    if data is None:
        handler._json({"error": "not found"}, 404)
        return True
    handler.send_response(200)
    handler.send_header("Content-Type", "text/plain; charset=utf-8")
    handler.send_header("Content-Length", str(len(data)))
    handler.end_headers()
    if not head:
        handler.wfile.write(data)
    return True


def handle_put(handler, dav: ScriptDav) -> None:
    _, member = _split(handler.path.split("?", 1)[0])
    if member is None:
        handler._json({"error": "PUT needs a file path"}, 403)
        return
    n = int(handler.headers.get("Content-Length") or 0)
    if n > (8 << 20):
        handler._json({"error": "body too large"}, 413)
        return
    content = handler.rfile.read(n) if n else b""
    code, detail = dav.write(member, content)
    handler._json(detail, code if code != 204 else 200)


def handle_lock(handler) -> None:
    """Stub class-2 lock: hand back an opaque exclusive token so
    lock-requiring editors proceed; writes are serialized by the
    round loop, not the token."""
    n = int(handler.headers.get("Content-Length") or 0)
    if n:
        handler.rfile.read(n)
    token = "opaquelocktoken:pyspider-ray-stub"
    body = ('<?xml version="1.0" encoding="utf-8"?>'
            '<D:prop xmlns:D="DAV:"><D:lockdiscovery><D:activelock>'
            '<D:locktype><D:write/></D:locktype>'
            '<D:lockscope><D:exclusive/></D:lockscope>'
            '<D:depth>0</D:depth><D:timeout>Second-3600</D:timeout>'
            f'<D:locktoken><D:href>{token}</D:href></D:locktoken>'
            '</D:activelock></D:lockdiscovery></D:prop>')
    data = body.encode()
    handler.send_response(200)
    handler.send_header("Content-Type", 'application/xml; charset="utf-8"')
    handler.send_header("Lock-Token", f"<{token}>")
    handler.send_header("Content-Length", str(len(data)))
    handler.end_headers()
    handler.wfile.write(data)


def handle_unlock(handler) -> None:
    handler.send_response(204)
    handler.send_header("Content-Length", "0")
    handler.end_headers()


def handle_forbidden(handler) -> None:
    handler._json({"error": "read-only mount: DELETE/MKCOL/MOVE/COPY "
                            "are not supported"}, 403)

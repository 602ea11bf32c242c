"""WebDAV script mount (webdav.py) + HTTP Basic auth (webapi.serve
need_auth) — the reference's webui/webdav.py edit-scripts-over-DAV
workflow and webui/login.py before_request gate."""

import base64
import json
import urllib.error
import urllib.request
import xml.etree.ElementTree as ET

import pytest

from pyspider_ray import webapi
from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline
from pyspider_ray.sources.projectdb import LocalProjectDB, build_handler

SCRIPT_V1 = """# rate: 100
# burst: 100
from pyspider.libs.base_handler import *

class Handler(BaseHandler):
    def on_start(self, response):
        self.crawl('data:,seed1', callback=self.page)

    def page(self, response):
        return {'version': 1}
"""


def _req(base, path, method="GET", data=None, headers=None):
    req = urllib.request.Request(base + path, data=data, method=method,
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=15) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


@pytest.fixture()
def dav_served(tmp_path):
    script = tmp_path / "davproj.py"
    script.write_text(SCRIPT_V1)
    (tmp_path / "other.py").write_text("# rate: 1\nX = 1\n")
    (tmp_path / "notes.txt").write_text("not a script")
    project = LocalProjectDB([str(script)]).get_all()[0]
    cfg = CrawlConfig(total=10, n_shards=2, loop_limit=50,
                      use_ray=False, out_dir=str(tmp_path / "out"),
                      handler_cls=build_handler(project),
                      project=project["name"],
                      rate=project["rate"], burst=project["burst"],
                      script_path=str(script))
    pipe = CrawlPipeline(cfg)
    pipe.seed()
    pipe.run_round()
    srv = webapi.serve(pipe)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, pipe, script
    srv.shutdown()


class TestDav:
    def test_options_advertises_dav(self, dav_served):
        base, _, _ = dav_served
        code, headers, _ = _req(base, "/dav/", method="OPTIONS")
        assert code == 200
        assert "1" in headers.get("DAV", "")
        assert "PROPFIND" in headers.get("Allow", "")

    def test_propfind_lists_scripts(self, dav_served):
        base, _, _ = dav_served
        code, headers, body = _req(base, "/dav/", method="PROPFIND",
                                   headers={"Depth": "1"})
        assert code == 207
        assert headers["Content-Type"].startswith("application/xml")
        root = ET.fromstring(body)     # valid multistatus XML
        hrefs = [e.text for e in root.iter("{DAV:}href")]
        assert "/dav/" in hrefs
        assert "/dav/davproj.py" in hrefs
        assert "/dav/other.py" in hrefs      # sibling scripts listed
        assert not any(h.endswith("notes.txt") for h in hrefs)
        # depth 0: collection only
        _, _, body0 = _req(base, "/dav/", method="PROPFIND",
                           headers={"Depth": "0"})
        assert b"davproj.py" not in body0

    def test_propfind_member(self, dav_served):
        base, _, _ = dav_served
        code, _, body = _req(base, "/dav/davproj.py", method="PROPFIND")
        assert code == 207
        root = ET.fromstring(body)
        lengths = [e.text for e in root.iter("{DAV:}getcontentlength")]
        assert lengths == [str(len(SCRIPT_V1.encode()))]
        assert _req(base, "/dav/nosuch.py", method="PROPFIND")[0] == 404

    def test_get_reads_script(self, dav_served):
        base, _, _ = dav_served
        code, headers, body = _req(base, "/dav/davproj.py")
        assert code == 200
        assert body.decode() == SCRIPT_V1
        assert headers["Content-Type"].startswith("text/plain")
        # HEAD: same headers, empty body
        code, headers, body = _req(base, "/dav/davproj.py", method="HEAD")
        assert code == 200 and body == b""
        assert headers["Content-Length"] == str(len(SCRIPT_V1.encode()))
        # the collection GET is a JSON listing (curl-friendly)
        code, _, body = _req(base, "/dav/")
        assert code == 200
        assert json.loads(body)["scripts"] == ["davproj.py", "other.py"]

    def test_put_registered_script_saves_and_hot_swaps(self, dav_served):
        base, pipe, script = dav_served
        edited = SCRIPT_V1.replace("'version': 1", "'version': 2")
        code, _, body = _req(base, "/dav/davproj.py", method="PUT",
                             data=edited.encode())
        assert code == 200, body
        out = json.loads(body)
        assert out["saved"] and out["queued"]     # hot swap queued
        assert script.read_text() == edited
        # the swap applies at the round boundary without error
        pipe.run_round()

    def test_put_broken_script_rejected_file_intact(self, dav_served):
        base, _, script = dav_served
        code, _, body = _req(base, "/dav/davproj.py", method="PUT",
                             data=b"def broken(:\n")
        assert code == 403
        assert "script error" in json.loads(body)["error"]
        assert script.read_text() == SCRIPT_V1    # untouched

    def test_put_new_sibling_script(self, dav_served):
        base, _, script = dav_served
        code, _, body = _req(base, "/dav/newproj.py", method="PUT",
                             data=b"# rate: 5\nY = 2\n")
        assert code == 201
        assert (script.parent / "newproj.py").read_text() == \
            "# rate: 5\nY = 2\n"
        # and it shows up in the listing
        _, _, lst = _req(base, "/dav/")
        assert "newproj.py" in json.loads(lst)["scripts"]

    def test_put_refuses_non_py_and_traversal(self, dav_served):
        base, _, _ = dav_served
        assert _req(base, "/dav/notes.txt", method="PUT",
                    data=b"x")[0] == 403
        assert _req(base, "/dav/..%2Fescape.py", method="PUT",
                    data=b"x")[0] in (400, 403, 404)

    def test_lock_unlock_stub(self, dav_served):
        base, _, _ = dav_served
        code, headers, body = _req(base, "/dav/davproj.py", method="LOCK")
        assert code == 200
        assert "opaquelocktoken" in headers.get("Lock-Token", "")
        assert b"lockdiscovery" in body
        assert _req(base, "/dav/davproj.py", method="UNLOCK")[0] == 204

    def test_destructive_verbs_forbidden(self, dav_served):
        base, _, script = dav_served
        for method in ("DELETE", "MKCOL", "MOVE", "COPY"):
            assert _req(base, "/dav/davproj.py", method=method)[0] == 403
        assert script.exists()

    def test_dav_disabled_without_script_dir(self, tmp_path):
        cfg = CrawlConfig(total=10, n_seeds=2, n_shards=2, use_ray=False,
                          out_dir=str(tmp_path / "out"))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        srv = webapi.serve(pipe)
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            assert _req(base, "/dav/")[0] == 404
            assert _req(base, "/dav/x.py", method="PROPFIND")[0] == 404
        finally:
            srv.shutdown()


class TestAuth:
    @pytest.fixture()
    def auth_served(self, tmp_path):
        cfg = CrawlConfig(total=10, n_seeds=2, n_shards=2, use_ray=False,
                          out_dir=str(tmp_path / "out"))
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        pipe.run_round()
        srv = webapi.serve(pipe, username="admin", password="s3cret",
                           need_auth=True)
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()

    @staticmethod
    def _basic(user, pw):
        tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
        return {"Authorization": f"Basic {tok}"}

    def test_401_challenge_without_credentials(self, auth_served):
        for path, method in (("/", "GET"), ("/projects", "GET"),
                             ("/dav/", "PROPFIND")):
            code, headers, body = _req(auth_served, path, method=method)
            assert code == 401
            assert headers["WWW-Authenticate"].startswith("Basic")
            assert body == b"need auth."

    def test_wrong_credentials_rejected(self, auth_served):
        code, _, _ = _req(auth_served, "/projects",
                          headers=self._basic("admin", "wrong"))
        assert code == 401
        code, _, _ = _req(auth_served, "/projects",
                          headers=self._basic("other", "s3cret"))
        assert code == 401

    def test_correct_credentials_pass_all_verbs(self, auth_served):
        h = self._basic("admin", "s3cret")
        assert _req(auth_served, "/projects", headers=h)[0] == 200
        assert _req(auth_served, "/", headers=h)[0] == 200
        code, _, _ = _req(auth_served, "/projects/bench/pause",
                          method="POST", data=b"{}",
                          headers={**h, "Content-Type":
                                   "application/json"})
        assert code == 200

    def test_post_without_auth_rejected(self, auth_served):
        code, _, _ = _req(auth_served, "/projects/bench/pause",
                          method="POST", data=b"{}")
        assert code == 401

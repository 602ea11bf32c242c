"""Bundled JS-render sidecar (pyspider_ray/sidecar/js_fetcher.js +
the JsSidecar launcher) — the S9 path end-to-end against a REAL
sidecar subprocess, not a fake: spawn the node program, fetch loopback
pages through it via HttpFetcher(js_proxy=...), verify the
result-dict contract of the reference's phantomjs_fetcher.js
(status_code/content/headers/url/cookies/time/js_script_result/save).
"""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pyarrow as pa
import pytest

from pyspider_ray.sidecar import JsSidecar, node_available
from pyspider_ray.stages.http_fetcher import HttpFetcher

from test_http_fetcher import _Handler

pytestmark = pytest.mark.skipif(not node_available(),
                                reason="node not installed")


@pytest.fixture(scope="module")
def site():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.fixture(scope="module")
def sidecar():
    with JsSidecar() as sc:
        yield sc


def _render(sc, spec: dict) -> dict:
    req = urllib.request.Request(
        sc.url, data=json.dumps(spec).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=15) as r:
        return json.loads(r.read().decode())


class TestWireProtocol:
    def test_get_is_method_not_allowed(self, sidecar):
        """phantomjs_fetcher.js:26-36: GET → 403 method not allowed."""
        try:
            with urllib.request.urlopen(sidecar.url, timeout=10) as r:
                code, body = r.status, r.read()
        except urllib.error.HTTPError as e:
            code, body = e.code, e.read()
        assert code == 403
        assert b"method not allowed" in body

    def test_basic_fetch_result_contract(self, sidecar, site):
        out = _render(sidecar, {"url": site + "/ok", "method": "GET",
                                "save": {"k": 1}})
        assert out["status_code"] == 200
        assert out["content"] == "hello world"
        assert out["orig_url"] == site + "/ok"
        assert out["url"] == site + "/ok"
        assert out["save"] == {"k": 1}           # save echoes through
        assert out["js_script_result"] is None
        assert out["time"] >= 0
        assert isinstance(out["headers"], dict) and out["headers"]

    def test_redirect_first_response_and_final_url(self, sidecar, site):
        """Redirects are followed; status comes from the first non-30x
        response and url is the final address (phantomjs_fetcher.js
        first_response + page.url semantics)."""
        out = _render(sidecar, {"url": site + "/redir"})
        assert out["status_code"] == 200
        assert out["content"] == "hello world"
        assert out["url"] == site + "/ok"
        assert out["orig_url"] == site + "/redir"

    def test_cookies_collected(self, sidecar, site):
        out = _render(sidecar, {"url": site + "/cookie"})
        assert out["cookies"] == {"sid": "xyz42"}

    def test_js_script_runs_against_document(self, sidecar, site):
        out = _render(sidecar, {
            "url": site + "/site/p0.html",
            "js_script": "function(){ return document.title; }"})
        assert out["status_code"] == 200
        assert out["js_script_result"] == "page 0"
        # a computed value, not just a property read
        out = _render(sidecar, {
            "url": site + "/site/p0.html",
            "js_script": "function(){ return "
                         "(document.body.innerHTML.match(/<a /g) || [])"
                         ".length; }"})
        assert out["js_script_result"] == 3      # two site links + secret

    def test_js_script_error_does_not_kill_fetch(self, sidecar, site):
        out = _render(sidecar, {"url": site + "/ok",
                                "js_script": "function(){ throw 'boom' }"})
        assert out["status_code"] == 200
        assert out["js_script_result"] is None
        assert "boom" in (out.get("error") or "")

    def test_unreachable_target_is_599(self, sidecar):
        out = _render(sidecar, {"url": "http://127.0.0.1:1/nope",
                                "timeout": 2})
        assert out["status_code"] == 599
        assert out["error"]

    def test_post_method_and_data_forwarded(self, sidecar, site):
        out = _render(sidecar, {"url": site + "/echo-method",
                                "method": "POST", "data": "a=1"})
        assert out["status_code"] == 200
        assert out["content"] == "method=POST"


class TestThroughHttpFetcher:
    def test_fetch_type_js_end_to_end(self, sidecar, site):
        """The full S9 path: HttpFetcher packs the spec, POSTs to the
        real node sidecar, the sidecar fetches the loopback page and
        runs the script — no fakes anywhere."""
        f = HttpFetcher(timeout=10, js_proxy=sidecar.url)
        out = f._fetch_one(site + "/site/p0.html", {
            "fetch": {"fetch_type": "js",
                      "js_script": "function(){ return document.title }"}})
        assert out["code"] == 200
        assert b"Page 0" in out["content"]
        # batch path routes by the fetch_type column through the
        # same sidecar
        batch = pa.table({"url": [site + "/ok", site + "/ok"],
                          "fetch_type": ["js", ""]})
        ob = f(batch)
        assert ob["status_code"].to_pylist() == [200, 200]
        assert all(b"hello world" in c.as_py()
                   for c in ob["content"])

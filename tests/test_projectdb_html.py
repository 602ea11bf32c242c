"""S6 script-file project loader (+hot reload), M12 HTML link
extraction, S8 data-URI codec, M8 request packing — reference
semantics (database/local/projectdb.py, libs/dataurl.py,
tornado_fetcher.py:220-287, libs/sample_handler.py)."""

import base64
import os
import time

import pyarrow as pa
import pytest

from pyspider_ray.functions import dataurl
from pyspider_ray.functions.htmldoc import MiniDoc, extract_links
from pyspider_ray.functions.requests_pack import (pack_request,
                                                  parse_proxy)
from pyspider_ray.handler import BaseHandler, Response
from pyspider_ray.sources.projectdb import (LocalProjectDB,
                                            ScriptProcessorStage,
                                            build_handler,
                                            parse_script_meta)

SCRIPT_V1 = '''\
# rate: 2.5
# burst: 7
# status: RUNNING
from pyspider.libs.base_handler import *

class Handler(BaseHandler):
    def on_start(self, response):
        self.crawl("http://a.test/1", callback=self.page)

    def page(self, response):
        return {"version": 1, "url": response.url}
'''

SCRIPT_V2 = SCRIPT_V1.replace("# rate: 2.5", "# rate: 9") \
                     .replace('"version": 1', '"version": 2')


class TestProjectDB:
    def test_rate_burst_status_comments(self):
        meta = parse_script_meta(SCRIPT_V1)
        assert meta == {"rate": 2.5, "burst": 7.0, "status": "RUNNING"}
        assert parse_script_meta("x = 1") == \
            {"rate": 1.0, "burst": 3.0, "status": "RUNNING"}

    def test_load_get_update_delete(self, tmp_path):
        p = tmp_path / "proj_a.py"
        p.write_text(SCRIPT_V1)
        db = LocalProjectDB([str(tmp_path / "*.py")])
        proj = db.get("proj_a")
        assert proj["rate"] == 2.5 and proj["status"] == "RUNNING"
        t0 = proj["updatetime"]
        # edit → check_update sees it
        time.sleep(0.01)
        p.write_text(SCRIPT_V2)
        os.utime(p, (time.time() + 1, time.time() + 1))
        changed = db.check_update(t0)
        assert [c["name"] for c in changed] == ["proj_a"]
        assert db.get("proj_a")["rate"] == 9.0
        # delete → project gone on next load
        p.unlink()
        db.load_scripts()
        assert db.get("proj_a") is None

    def test_build_handler_runs_reference_style_script(self, tmp_path):
        p = tmp_path / "proj_b.py"
        p.write_text(SCRIPT_V1)
        db = LocalProjectDB([str(p)])
        cls = build_handler(db.get("proj_b"))
        assert issubclass(cls, BaseHandler)
        h = cls(project_name="proj_b")
        out = h.run_task(
            {"taskid": "t", "project": "proj_b", "url": "http://a.test/1",
             "process": {"callback": "page"}},
            Response(status_code=200, url="http://a.test/1", content=b"x"))
        assert out.result == {"version": 1, "url": "http://a.test/1"}

    def test_hot_reload_without_actor_restart(self, tmp_path):
        """Edit the script file; the SAME stage object switches
        behavior and reports the new rate (project_module.py
        _need_update semantics)."""
        p = tmp_path / "proj_c.py"
        p.write_text(SCRIPT_V1)
        stage = ScriptProcessorStage(str(p))
        batch = pa.table({
            "taskid": ["t1"], "urlhash": [1], "project": ["proj_c"],
            "url": ["http://a.test/1"], "host": ["a.test"],
            "status_code": pa.array([200], pa.int32()),
            "content": [b"x"], "fetch_error": [""], "fetch_time": [0.1],
            "callback": ["page"]})
        out1 = stage(batch)
        assert '"version": 1' in out1["result"].to_pylist()[0]
        assert stage.meta["rate"] == 2.5
        time.sleep(0.01)
        p.write_text(SCRIPT_V2)
        os.utime(p, (time.time() + 2, time.time() + 2))
        out2 = stage(batch)        # same object — no restart
        assert '"version": 2' in out2["result"].to_pylist()[0]
        assert stage.meta["rate"] == 9.0


SAMPLE_HTML = """
<html><head><title>T</title><link rel="stylesheet" href="/s.css"></head>
<body>
  <div id="main" class="content big">
    Hello <b>world</b>
    <a href="page/1.html">one</a>
    <a href="/abs/2.html" class="nav">two</a>
    <a name="anchor-no-href">three</a>
    <img src="img/pic.png">
  </div>
  <a href="http://other.test/x">ext</a>
</body></html>
"""


class TestHtmlDoc:
    def test_extract_links_absolute(self):
        links = extract_links(SAMPLE_HTML, "http://site.test/dir/")
        assert links == ["http://site.test/dir/page/1.html",
                         "http://site.test/abs/2.html",
                         "http://other.test/x"]

    def test_selectors(self):
        doc = MiniDoc(SAMPLE_HTML, base_url="http://site.test/dir/")
        assert len(doc("a")) == 4
        assert len(doc("a[href]")) == 3
        assert doc("#main")[0].tag == "div"
        assert doc("div.content")[0].attr("id") == "main"
        assert [e.text for e in doc("a.nav")] == ["two"]
        assert doc("img")[0].attr("src") == "http://site.test/dir/img/pic.png"
        assert "Hello world" in doc("#main")[0].text

    def test_response_doc_link_loop(self):
        """The reference sample handler's crawl loop
        (sample_handler.py:18-20) on our Response.doc."""
        r = Response(status_code=200, url="http://site.test/dir/",
                     content=SAMPLE_HTML.encode())
        hrefs = [a.attr("href") for a in r.doc("a[href]")]
        assert hrefs[0].startswith("http://site.test/")
        assert len(hrefs) == 3


class TestDataUrl:
    def test_roundtrip_base64(self):
        url = dataurl.encode("héllo", mime_type="text/plain")
        assert url.startswith("data:text/plain;charset=utf-8;base64,")
        assert dataurl.decode(url) == "héllo"

    def test_roundtrip_bytes(self):
        payload = bytes(range(256))
        url = dataurl.encode(payload)
        assert dataurl.decode(url) == payload

    def test_percent_encoding_form(self):
        url = dataurl.encode("a b&c", base64=False)
        assert ";base64" not in url
        assert dataurl.decode(url) == "a b&c"

    def test_fetcher_decodes_base64_data_uri(self):
        from pyspider_ray.stages.fetcher import SyntheticFetcher
        f = SyntheticFetcher()
        payload = base64.b64encode(b"BINARY\x00DATA").decode()
        batch = pa.table({"url": [f"data:;base64,{payload}"]})
        out = f(batch)
        assert out["status_code"].to_pylist() == [200]
        assert out["content"].to_pylist() == [b"BINARY\x00DATA"]


class TestRequestPacking:
    def test_defaults_and_headers_merge(self):
        spec = pack_request("http://a.test/", {
            "fetch": {"headers": {"x-extra": "1"}, "method": "POST",
                      "data": "k=v", "timeout": 33}},
            user_agent="ua/2")
        assert spec["method"] == "POST"
        assert spec["body"] == "k=v"
        assert spec["request_timeout"] == 33
        assert spec["headers"]["User-Agent"] == "ua/2"
        assert spec["headers"]["X-Extra"] == "1"
        assert spec["follow_redirects"] is True

    def test_etag_last_modified_from_track(self):
        task = {"fetch": {},
                "track": {"fetch": {"headers": {"ETag": 'W/"abc"',
                                                "Last-Modified": "LMD"}},
                          "process": {"ok": True}}}
        spec = pack_request("http://a.test/", task)
        assert spec["headers"]["If-None-Match"] == 'W/"abc"'
        assert spec["headers"]["If-Modified-Since"] == "LMD"
        # explicit string etag wins; etag=False disables
        spec = pack_request("http://a.test/",
                            {"fetch": {"etag": "xyz"}})
        assert spec["headers"]["If-None-Match"] == "xyz"
        spec = pack_request("http://a.test/",
                            {"fetch": {"etag": False}, "track":
                             {"fetch": {"headers": {"ETag": "zzz"}},
                              "process": {"ok": True}}})
        assert "If-None-Match" not in spec["headers"]

    def test_proxy_forms(self):
        assert parse_proxy("h:1234") == {"proxy_host": "h",
                                         "proxy_port": 1234}
        assert parse_proxy("http://u:p@h") == {
            "proxy_host": "h", "proxy_port": 8080,
            "proxy_username": "u", "proxy_password": "p"}
        spec = pack_request("http://a.test/",
                            {"fetch": {"proxy": "ph:99"}})
        assert spec["proxy_host"] == "ph" and spec["proxy_port"] == 99
        # task proxy=False suppresses the fetcher-level proxy
        spec = pack_request("http://a.test/", {"fetch": {"proxy": False}},
                            fetcher_proxy="global:80")
        assert "proxy_host" not in spec

    def test_cookies_fold_into_header(self):
        spec = pack_request("http://a.test/", {
            "fetch": {"cookies": {"sid": "42"},
                      "headers": {"Cookie": "a=b"}}})
        assert "sid=42" in spec["headers"]["Cookie"]
        assert "a=b" in spec["headers"]["Cookie"]

    def test_redirect_options(self):
        spec = pack_request("http://a.test/", {
            "fetch": {"allow_redirects": False, "max_redirects": 3}})
        assert spec["follow_redirects"] is False
        assert spec["max_redirects"] == 3

"""Real-HTTP fetch stage against a loopback http.server: status/body/
headers, conditional GET, redirects (incl. overflow), gzip, cookies,
robots.txt over HTTP, and the reference's canonical demo flow — fetch
real HTML → ``response.doc('a[href]')`` → follow — end-to-end through
the crawl loop (sample_handler.py:12-25 ported)."""

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from pyspider_ray.handler import BaseHandler
from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline
from pyspider_ray.stages.http_fetcher import HttpFetcher

N_PAGES = 12


def _page_html(i: int) -> str:
    links = "".join(f'<a href="/site/p{j}.html">p{j}</a>'
                    for j in (2 * i + 1, 2 * i + 2) if j < N_PAGES)
    return (f"<html><head><title>page {i}</title></head>"
            f"<body><h1>Page {i}</h1>{links}"
            f'<a href="/private/x.html">secret</a></body></html>')


class _Handler(BaseHTTPRequestHandler):
    etag_full = 0      # class-level: counts full (200) /etag responses
    lastmod_full = 0   # class-level: counts full (200) /lastmod responses

    def log_message(self, *a):   # quiet
        pass

    def _send(self, code, body=b"", headers=()):
        self.send_response(code)
        for k, v in headers:
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        p = self.path
        if p == "/ok":
            self._send(200, b"hello world")
        elif p == "/etag":
            if self.headers.get("If-None-Match") == '"v1"':
                self._send(304)
            else:
                _Handler.etag_full += 1
                self._send(200, b"fresh body", [("ETag", '"v1"')])
        elif p == "/login":
            self._send(302, b"", [("Location", "/gated"),
                                  ("Set-Cookie", "session=tok99; Path=/")])
        elif p == "/login2":
            self._send(302, b"", [("Location", "/login"),
                                  ("Set-Cookie", "step=one; Path=/")])
        elif p == "/gated":
            cookie = self.headers.get("Cookie") or ""
            if "session=tok99" in cookie:
                self._send(200, b"gated ok")
            else:
                self._send(403, b"no session")
        elif p.startswith("/xhost"):
            port = self.path.split("port=")[1]
            self._send(302, b"", [("Location",
                                   f"http://localhost:{port}/reflect")])
        elif p == "/reflect":
            body = (f"cookie={self.headers.get('Cookie') or ''};"
                    f"auth={self.headers.get('Authorization') or ''}")
            self._send(200, body.encode())
        elif p == "/echo-method":
            self._send(200, b"method=GET")
        elif p == "/redir":
            self._send(302, b"", [("Location", "/ok")])
        elif p == "/loop":
            self._send(302, b"", [("Location", "/loop")])
        elif p == "/gzip":
            body = gzip.compress(b"compressed payload")
            self._send(200, body, [("Content-Encoding", "gzip")])
        elif p == "/cookie":
            self._send(200, b"cookie page",
                       [("Set-Cookie", "sid=xyz42; Path=/")])
        elif p == "/lastmod":
            if self.headers.get("If-Modified-Since") == "LMDATE":
                self._send(304)
            else:
                _Handler.lastmod_full += 1
                self._send(200, b"dated body",
                           [("Last-Modified", "LMDATE")])
        elif p == "/hop1":
            self._send(302, b"", [("Location", "/hop2")])
        elif p == "/hop2":
            self._send(302, b"", [("Location", "/ok")])
        elif p == "/echo-ua":
            self._send(200, (self.headers.get("User-Agent") or "")
                       .encode())
        elif p == "/robots.txt":
            self._send(200, b"User-agent: *\nDisallow: /private\n")
        elif p.startswith("/site/p") and p.endswith(".html"):
            i = int(p[len("/site/p"):-len(".html")])
            self._send(200, _page_html(i).encode())
        elif p.startswith("/private/"):
            self._send(200, b"should never be fetched")
        else:
            self._send(404, b"nope")

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(n)
        if self.path == "/post-redir":
            self._send(301, b"", [("Location", "/echo-method")])
        elif self.path == "/echo-method":
            self._send(200, b"method=POST")
        elif self.path == "/postrich":
            out = (b"POST:" + body +
                   b"|X:" + (self.headers.get("X-Custom") or "").encode() +
                   b"|C:" + (self.headers.get("Cookie") or "").encode())
            self._send(200, out)
        else:
            self._send(200, b"POST:" + body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


class TestHttpFetcher:
    def test_batch_fetch_statuses(self, server):
        f = HttpFetcher(pool_size=4, timeout=5)
        batch = pa.table({"url": [f"{server}/ok", f"{server}/404",
                                  f"{server}/redir", f"{server}/gzip",
                                  "http://127.0.0.1:1/unreachable"]})
        out = f(batch)
        codes = out["status_code"].to_pylist()
        bodies = out["content"].to_pylist()
        errs = out["fetch_error"].to_pylist()
        assert codes[0] == 200 and bodies[0] == b"hello world"
        assert codes[1] == 404 and bodies[1] == b"nope"
        assert codes[2] == 200 and bodies[2] == b"hello world"  # followed
        assert codes[3] == 200 and bodies[3] == b"compressed payload"
        assert codes[4] == 599 and errs[4]

    def test_conditional_get_304(self, server):
        f = HttpFetcher(timeout=5)
        first = f(pa.table({"url": [f"{server}/etag"]}))
        assert first["status_code"].to_pylist() == [200]
        etag = json.loads(first["resp_headers"].to_pylist()[0])["ETag"]
        again = f(pa.table({"url": [f"{server}/etag"], "etag": [etag]}))
        assert again["status_code"].to_pylist() == [304]

    def test_redirect_overflow_599(self, server):
        f = HttpFetcher(timeout=5)
        out = f(pa.table({"url": [f"{server}/loop"]}))
        assert out["status_code"].to_pylist() == [599]
        assert "redirect" in out["fetch_error"].to_pylist()[0]

    def test_cookies_and_ua_headers(self, server):
        f = HttpFetcher(user_agent="graft-test/9", timeout=5)
        out = f(pa.table({"url": [f"{server}/cookie",
                                  f"{server}/echo-ua"]}))
        headers = json.loads(out["resp_headers"].to_pylist()[0])
        assert "sid=xyz42" in headers["Set-Cookie"]
        assert out["content"].to_pylist()[1] == b"graft-test/9"

    def test_robots_over_http(self, server):
        from pyspider_ray.stages.robots import RobotsCache
        f = HttpFetcher(timeout=5)
        host = server.split("//")[1]
        rc = RobotsCache(lambda h: f.fetch_text(f"http://{h}/robots.txt"))
        assert rc.allowed(host, f"{server}/site/p0.html")
        assert not rc.allowed(host, f"{server}/private/x.html")


class SiteHandler(BaseHandler):
    """The reference sample handler's shape (sample_handler.py:12-25):
    on_start seeds, index_page follows every a[href] and returns the
    title."""

    base = ""   # set per test

    def on_start(self, response):
        self.crawl(f"{self.base}/site/p0.html", callback=self.index_page)

    def index_page(self, response):
        for a in response.doc("a[href]"):
            self.crawl(a.attr("href"), callback=self.index_page)
        title = response.doc("title")
        return {"url": response.url,
                "title": title[0].text if title else ""}


class TestRealHttpCrawl:
    def test_crawl_real_html_site(self, server, tmp_path):
        """HttpFetcher + MiniDoc + BaseHandler + frontier + robots over
        HTTP: crawl the loopback site, follow extracted links, skip the
        robots-disallowed /private page."""
        from pyspider_ray.stages.http_fetcher import HttpFetcher
        from pyspider_ray.stages.robots import RobotsCache

        SiteHandler.base = server
        cfg = CrawlConfig(total=N_PAGES, n_shards=2, loop_limit=100,
                          use_ray=False, out_dir=str(tmp_path / "http"),
                          handler_cls=SiteHandler, project="site",
                          fetcher_cls=HttpFetcher)
        pipe = CrawlPipeline(cfg)
        f = HttpFetcher(timeout=5)
        pipe.gate.robots_cache = RobotsCache(
            lambda h: f.fetch_text(f"http://{h}/robots.txt"),
            clock=pipe.clock)
        pipe.seed()
        for _ in range(40):
            m = pipe.run_round()
            if not m["emitted"] and not m["admitted"] \
                    and not pipe._pending_new and not pipe._pending_status \
                    and not pipe._pending_ctrl and pipe.coord.is_quiescent():
                break
        rows = [dict(r, result=json.loads(r["result"]))
                for r in pipe.results_table().to_pylist()]
        titles = {r["result"]["title"] for r in rows}
        assert titles == {f"page {i}" for i in range(N_PAGES)}
        # the robots-disallowed page was never fetched
        assert not any("/private/" in r["url"] for r in rows)
        blocked = sum(m["blocked"] for m in pipe.metrics)
        assert blocked >= 1


class TestJsSidecarProtocol:
    """S9 — the phantomjs/splash sidecar HTTP protocol
    (tornado_fetcher.py:430-529): POST packed spec as JSON, response
    body is the result dict.  A fake sidecar on the loopback server
    echoes a 'rendered' page so the plumbing is verifiable without a
    browser."""

    def test_js_fetch_roundtrip(self, server):
        # extend the loopback server with a sidecar endpoint via a
        # tiny dedicated server (POST handler)
        import threading
        from http.server import (BaseHTTPRequestHandler,
                                 ThreadingHTTPServer)

        class Sidecar(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                spec = json.loads(self.rfile.read(
                    int(self.headers["Content-Length"])))
                body = json.dumps({
                    "orig_url": spec["url"],
                    "url": spec["url"],
                    "status_code": 200,
                    "content": f"<html>rendered {spec['url']} "
                               f"js={spec.get('js_script', '')}</html>",
                    "headers": {"Content-Type": "text/html"},
                    "cookies": {}, "time": 0.05,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Sidecar)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            js_proxy = f"http://127.0.0.1:{srv.server_address[1]}/"
            f = HttpFetcher(timeout=5, js_proxy=js_proxy)
            out = f._fetch_one("http://target.test/page", {
                "fetch": {"fetch_type": "js",
                          "js_script": "function(){return 1}"}})
            assert out["code"] == 200
            assert b"rendered http://target.test/page" in out["content"]
            assert b"js=function(){return 1}" in out["content"]
            # batch path routes by the fetch_type column
            batch = pa.table({"url": ["http://t.test/a"],
                              "fetch_type": ["phantomjs"]})
            ob = f(batch)
            assert ob["status_code"].to_pylist() == [200]
        finally:
            srv.shutdown()

    def test_js_without_proxy_501(self):
        f = HttpFetcher(timeout=5)
        out = f._fetch_one("http://t.test/x",
                           {"fetch": {"fetch_type": "js"}})
        assert out["code"] == 501
        assert b"not enabled" in out["content"]


class TestFetcherParityCases:
    """More scenarios ported from the reference's tests/test_fetcher.py
    (POST body, If-Modified-Since conditional, redirect options)."""

    def test_post_data_echo(self, server):
        f = HttpFetcher(timeout=5)
        out = f._fetch_one(f"{server}/ok", {
            "fetch": {"method": "POST", "data": "a=1&b=2"}})
        assert out["code"] == 200
        assert out["content"] == b"POST:a=1&b=2"

    def test_if_modified_since_304(self, server):
        f = HttpFetcher(timeout=5)
        first = f._fetch_one(f"{server}/lastmod", {})
        assert first["code"] == 200
        lm = first["headers"]["Last-Modified"]
        again = f._fetch_one(f"{server}/lastmod", {
            "fetch": {"last_modified": lm}})
        assert again["code"] == 304

    def test_allow_redirects_false(self, server):
        f = HttpFetcher(timeout=5)
        out = f._fetch_one(f"{server}/redir", {
            "fetch": {"allow_redirects": False}})
        assert out["code"] == 302
        assert out["headers"].get("Location") == "/ok"

    def test_max_redirects_exact_bound(self, server):
        f = HttpFetcher(timeout=5)
        ok = f._fetch_one(f"{server}/hop1", {
            "fetch": {"max_redirects": 2}})
        assert ok["code"] == 200            # 2 hops fit the budget
        over = f._fetch_one(f"{server}/hop1", {
            "fetch": {"max_redirects": 1}})
        assert over["code"] == 599          # 2 hops exceed budget of 1


class TestRedirectCookieJar:
    """Cookie-jar carry across redirect hops within one fetch (the
    reference threads a RequestsCookieJar through every hop,
    tornado_fetcher.py:337-351, 388) + credential hygiene on cross-host
    redirects."""

    def test_cookie_jar_across_redirect_hops(self, server):
        # /login 302→/gated with Set-Cookie; the hop must present it
        f = HttpFetcher(timeout=5)
        out = f._fetch_one(f"{server}/login", {})
        assert out["code"] == 200
        assert out["content"] == b"gated ok"

    def test_cookie_jar_accumulates_over_two_hops(self, server):
        # /login2 sets step=one, then /login sets session — both ride
        f = HttpFetcher(timeout=5)
        out = f._fetch_one(f"{server}/login2", {})
        assert out["code"] == 200
        assert out["content"] == b"gated ok"

    def test_cookie_jar_respects_max_redirects(self, server):
        f = HttpFetcher(timeout=5)
        out = f._fetch_one(f"{server}/login2",
                           {"fetch": {"max_redirects": 1}})
        assert out["code"] == 599   # needs 2 hops; budget is 1

    def test_cross_host_redirect_strips_credentials(self, server):
        # 127.0.0.1:p → localhost:p is a netloc change: Cookie and
        # Authorization must not follow
        port = server.rsplit(":", 1)[1]
        f = HttpFetcher(timeout=5)
        out = f._fetch_one(f"{server}/xhost?port={port}", {
            "fetch": {"cookies": {"secret": "1"},
                      "headers": {"Authorization": "Bearer zz"}}})
        assert out["code"] == 200
        assert out["content"] == b"cookie=;auth="

    def test_301_post_converts_to_get(self, server):
        f = HttpFetcher(timeout=5)
        out = f._fetch_one(f"{server}/post-redir", {
            "fetch": {"method": "POST", "data": "x=1"}})
        assert out["code"] == 200
        assert out["content"] == b"method=GET"


class RichFetchHandler(BaseHandler):
    """A follow with method/data/headers/cookies — the rich-fetch path
    through the stored frontier task and the control plane."""
    base = ""

    def on_start(self, response):
        self.crawl(f"{self.base}/postrich", callback=self.page,
                   method="POST", data="payload=1",
                   headers={"X-Custom": "abc"}, cookies={"sid": "xyz"})

    def page(self, response):
        return {"body": response.text}


class LastModRecrawlHandler(BaseHandler):
    base = ""

    def on_start(self, response):
        self.crawl(f"{self.base}/lastmod", callback=self.page)

    def page(self, response):
        if not (response.save or {}).get("again"):
            self.crawl(f"{self.base}/lastmod", callback=self.page,
                       force_update=True, save={"again": 1})
        return {"code": response.status_code}


class EtagRecrawlHandler(BaseHandler):
    base = ""

    def on_start(self, response):
        self.crawl(f"{self.base}/etag", callback=self.page)

    def page(self, response):
        if not (response.save or {}).get("again"):
            self.crawl(f"{self.base}/etag", callback=self.page,
                       force_update=True, save={"again": 1})
        return {"code": response.status_code}


class TestRichFetchThroughCrawlLoop:
    def _run(self, handler_cls, server, tmp_path, rounds=25):
        handler_cls.base = server
        cfg = CrawlConfig(total=4, n_shards=2, loop_limit=50,
                          use_ray=False, out_dir=str(tmp_path / "rich"),
                          handler_cls=handler_cls, project="richproj",
                          fetcher_cls=HttpFetcher)
        pipe = CrawlPipeline(cfg)
        pipe.seed()
        for _ in range(rounds):
            m = pipe.run_round()
            if not m["emitted"] and not m["admitted"] \
                    and not pipe._pending_new and not pipe._pending_status \
                    and not pipe._pending_ctrl and pipe.coord.is_quiescent():
                break
        return pipe

    def test_post_headers_cookies_reach_the_wire(self, server, tmp_path):
        """The ACTUAL crawl loop (frontier → _tasks_to_table →
        HttpFetcher) sends the stored fetch dict: POST body, custom
        header and cookie all observed by the server."""
        pipe = self._run(RichFetchHandler, server, tmp_path)
        rows = [json.loads(r["result"])
                for r in pipe.results_table().to_pylist()]
        bodies = [r["body"] for r in rows if "body" in r]
        assert any(b == "POST:payload=1|X:abc|C:sid=xyz" for b in bodies), \
            bodies

    def test_etag_roundtrip_enables_conditional_recrawl(self, server,
                                                        tmp_path):
        """J5 in handler mode: the first fetch's ETag lands on the
        stored task via the control plane; the forced re-crawl sends
        If-None-Match and the server answers 304 (exactly one full
        response served)."""
        _Handler.etag_full = 0
        pipe = self._run(EtagRecrawlHandler, server, tmp_path)
        assert _Handler.etag_full == 1
        stored = []
        for shard_rows in pipe.coord._call_all("dump_tasks", "richproj"):
            stored.extend(shard_rows)
        etag_tasks = [t for t in stored if t["url"].endswith("/etag")]
        assert len(etag_tasks) == 1
        assert etag_tasks[0].get("etag") == '"v1"'
        codes = sorted(json.loads(r["result"])["code"]
                       for r in pipe.results_table().to_pylist()
                       if "code" in (r.get("result") or ""))
        assert 200 in codes

    def test_last_modified_roundtrip_enables_conditional_recrawl(
            self, server, tmp_path):
        """J5's Last-Modified half in handler mode: the first fetch's
        Last-Modified lands on the stored task via the control plane
        (coordinator status fan-out → frontier pack), and the forced
        re-crawl sends If-Modified-Since so the server answers 304 —
        exactly one full response served end-to-end."""
        _Handler.lastmod_full = 0
        pipe = self._run(LastModRecrawlHandler, server, tmp_path)
        assert _Handler.lastmod_full == 1
        stored = []
        for shard_rows in pipe.coord._call_all("dump_tasks", "richproj"):
            stored.extend(shard_rows)
        lm_tasks = [t for t in stored if t["url"].endswith("/lastmod")]
        assert len(lm_tasks) == 1
        assert lm_tasks[0].get("last_modified") == "LMDATE"

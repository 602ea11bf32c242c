"""Handler protocol parity tests (base_handler semantics — reference
tests/test_base_handler.py + data_fetcher_processor_handler.py
scenarios)."""

import json

import pyarrow as pa
import pytest

from pyspider_ray.handler import (BaseHandler, HTTPError, ProcessorResult,
                                  Response, catch_status_code_error, config,
                                  every, not_send_status)
from pyspider_ray.stages.handler_processor import (HandlerProcessorStage,
                                                   message_tasks)


class DemoHandler(BaseHandler):
    crawl_config = {"headers": {"User-Agent": "demo"}, "priority": 2}

    def on_start(self, response):
        self.crawl("http://site0.test/page/1", callback=self.index)
        self.crawl("http://site0.test/page/1", callback=self.index)  # D1 dup
        self.crawl("http://site0.test/page/2", callback=self.index,
                   priority=7, age=60)

    @config(age=10, itag="v2")
    def index(self, response):
        return {"url": response.url, "len": len(response.content)}

    @catch_status_code_error
    def tolerant(self, response):
        return {"code": response.status_code}

    def boom(self, response):
        raise ValueError("nope")

    def gen(self, response):
        yield {"a": 1}
        yield {"a": 2}

    @every(minutes=2)
    def tick2m(self):
        self.crawl("http://site0.test/page/3", callback=self.index)

    @every(seconds=180)
    def tick3m(self):
        self.crawl("http://site0.test/page/4", callback=self.index)


class TestCrawlApi:
    def setup_method(self):
        self.h = DemoHandler(project_name="proj")
        self.h._reset()

    def test_crawl_splits_and_defaults(self):
        self.h.on_start(Response())
        follows = self.h._follows
        assert len(follows) == 2               # D1 deduped the double crawl
        t1, t2 = follows
        assert t1["schedule"] == {"age": 10, "itag": "v2", "priority": 2}
        assert t1["process"]["callback"] == "index"
        assert t2["schedule"]["priority"] == 7      # explicit beats config
        assert t2["schedule"]["age"] == 60
        assert t1["taskid"] != t2["taskid"]
        assert len(t1["taskid"]) == 32              # md5 identity

    def test_min_tick_gcd(self):
        assert DemoHandler._min_tick == 60          # gcd(120, 180)
        assert len(DemoHandler._cron_jobs) == 2

    def test_curl_form(self):
        t = self.h.crawl("curl -X POST -d k=v http://x.test/a")
        assert t[0]["fetch"]["method"] == "POST" if isinstance(t, list) \
            else t["fetch"]["method"] == "POST"

    def test_unknown_kwarg_raises(self):
        with pytest.raises(TypeError):
            self.h.crawl("http://x.test/", bogus=1)

    def test_unknown_callback_raises(self):
        with pytest.raises(NotImplementedError):
            self.h.crawl("http://x.test/", callback="missing")


class TestRunTask:
    def run(self, callback, response):
        h = DemoHandler(project_name="proj")
        task = {"taskid": "t", "project": "proj", "url": response.url,
                "process": {"callback": callback}}
        return h.run_task(task, response)

    def test_ok_result(self):
        out = self.run("index", Response(url="http://u/", content=b"abc"))
        assert out.ok and out.result == {"url": "http://u/", "len": 3}

    def test_error_status_fails_without_catch(self):
        out = self.run("index", Response(status_code=503, url="u"))
        assert not out.ok and "HTTP 503" in out.exception

    def test_catch_status_code_error(self):
        out = self.run("tolerant", Response(status_code=503, url="u"))
        assert out.ok and out.result == {"code": 503}

    def test_304_skips_callback(self):
        out = self.run("index", Response(status_code=304, url="u"))
        assert out.ok and out.result is None

    def test_exception_capture(self):
        out = self.run("boom", Response(url="u"))
        assert not out.ok and "ValueError" in out.exception

    def test_generator_results_via_on_result(self):
        seen = []

        class GH(DemoHandler):
            def on_result(self, result):
                if result:
                    seen.append(result)
        h = GH(project_name="p")
        out = h.run_task({"taskid": "t", "project": "p", "url": "u",
                          "process": {"callback": "gen"}}, Response(url="u"))
        assert out.ok and seen == [{"a": 1}, {"a": 2}]

    def test_follows_from_callback(self):
        out = self.run("on_start", Response(url="u"))
        assert len(out.follows) == 2

    def test_cronjob_dispatch(self):
        h = DemoHandler(project_name="p")
        resp = Response(url="data:,_on_cronjob", save={"tick": 360})
        out = h.run_task({"taskid": "_on_cronjob", "project": "p",
                          "url": resp.url,
                          "process": {"callback": "_on_cronjob"}}, resp)
        assert out.ok
        # tick 360 fires both (120 | 360, 180 | 360)
        assert len(out.follows) == 2
        assert out.not_send_status                 # @not_send_status

    def test_send_message(self):
        class MH(DemoHandler):
            def chat(self, response):
                self.send_message("other", {"hi": 1})
        h = MH(project_name="p")
        out = h.run_task({"taskid": "t", "project": "p", "url": "u",
                          "process": {"callback": "chat"}}, Response(url="u"))
        assert out.messages == [("other", {"hi": 1}, "data:,on_message")]
        tasks = message_tasks(json.dumps(
            [{"project": p, "msg": m, "url": u}
             for p, m, u in out.messages]), "p")
        assert tasks[0]["project"] == "other"
        assert tasks[0]["process"]["callback"] == "_on_message"

    def test_on_message_roundtrip(self):
        got = []

        class RH(BaseHandler):
            def on_message(self, project, msg):
                got.append((project, msg))
                return {"echo": msg}
        h = RH(project_name="other")
        resp = Response(url="data:,on_message", save=["p", {"hi": 1}])
        out = h.run_task({"taskid": "m", "project": "other", "url": resp.url,
                          "process": {"callback": "_on_message"}}, resp)
        assert out.ok and got == [("p", {"hi": 1})]


class TestCrawlConfigJoin:
    def test_merge_with_task_precedence(self):
        task = {"fetch": {"headers": {"X": "task"}, "timeout": 5},
                "process": {"callback": "cb"}}
        cfg = {"headers": {"X": "cfg", "UA": "bot"}, "timeout": 99,
               "robots_txt": True, "process_time_limit": 30}
        out = BaseHandler.task_join_crawl_config(task, cfg)
        assert out["fetch"]["timeout"] == 5               # task wins
        assert out["fetch"]["headers"] == {"X": "task", "UA": "bot"}
        assert out["fetch"]["robots_txt"] is True         # config fills in
        assert out["process"]["process_time_limit"] == 30


class TestAverageWindowCounter:
    def test_window(self):
        from pyspider_ray.state.metrics import AverageWindowCounter
        c = AverageWindowCounter(window_size=3)
        for v in (1, 2, 3, 4):
            c.event(v)
        assert c.sum == 9 and c.avg == 3      # oldest value rolled out
        assert not c.empty()


class TestHandlerStage:
    def test_stage_over_batch(self):
        batch = pa.table({
            "taskid": ["a", "b"],
            "urlhash": [1, 2],
            "project": ["proj", "proj"],
            "url": ["http://site0.test/x", "http://site0.test/y"],
            "host": ["site0.test"] * 2,
            "status_code": pa.array([200, 503], pa.int32()),
            "content": [b"hello", b""],
            "fetch_error": ["", "boom"],
            "fetch_time": [0.1, 0.2],
            "callback": ["index", "index"],
        })
        stage = HandlerProcessorStage(DemoHandler, "proj")
        out = stage(batch)
        ok = out["process_ok"].to_pylist()
        assert ok == [True, False]
        res = json.loads(out["result"].to_pylist()[0])
        assert res["len"] == 5


class TestStdoutCapture:
    def test_callback_prints_land_in_logs(self):
        class H(BaseHandler):
            def page(self, response):
                print("debug line one")
                print("debug line two")
                return {"ok": 1}

        h = H(project_name="p")
        out = h.run_task(
            {"taskid": "t", "project": "p", "url": "http://x.test/",
             "process": {"callback": "page"}},
            Response(status_code=200, url="http://x.test/", content=b"x"))
        assert out.ok and out.result == {"ok": 1}
        assert out.logs == "debug line one\ndebug line two\n"

    def test_exception_still_captures_logs(self):
        class H(BaseHandler):
            def page(self, response):
                print("before boom")
                raise RuntimeError("boom")

        h = H(project_name="p")
        out = h.run_task(
            {"taskid": "t", "project": "p", "url": "http://x.test/",
             "process": {"callback": "page"}},
            Response(status_code=200, url="http://x.test/", content=b"x"))
        assert not out.ok and "boom" in out.exception
        assert "before boom" in out.logs


class TestEncodingDetection:
    """M11 statistical fallback (functions/encoding.py) — the
    reference's chardet slot (response.py:61-95): mislabeled and
    unlabeled legacy pages must decode correctly."""

    CN = "今天天气很好，我们去公园散步。中文编码检测测试。"

    def _resp(self, content, ctype=None):
        from pyspider_ray.handler import Response
        headers = {"Content-Type": ctype} if ctype else {}
        return Response(status_code=200, url="http://x.test/",
                        content=content, headers=headers)

    def test_unlabeled_gb18030_detected(self):
        r = self._resp(self.CN.encode("gb18030"))
        assert r.encoding == "gb18030"
        assert r.text == self.CN

    def test_unlabeled_big5_detected(self):
        tw = "今天天氣很好我們去公園散步繁體中文編碼檢測"
        r = self._resp(tw.encode("big5"))
        assert r.text == tw

    def test_utf8_with_false_gb2312_label(self):
        """Valid multibyte UTF-8 beats a stale legacy label."""
        r = self._resp(self.CN.encode("utf-8"),
                       ctype="text/html; charset=gb2312")
        assert r.encoding == "utf-8"
        assert r.text == self.CN

    def test_gb18030_with_false_utf8_label(self):
        """A label that can't strict-decode the body falls through to
        detection."""
        r = self._resp(self.CN.encode("gb18030"),
                       ctype="text/html; charset=utf-8")
        assert r.encoding == "gb18030"
        assert r.text == self.CN

    def test_correct_label_kept(self):
        r = self._resp(self.CN.encode("gb18030"),
                       ctype="text/html; charset=gb2312")
        assert r.encoding == "gb18030"   # gb2312 widened, kept
        assert r.text == self.CN

    def test_meta_charset_still_wins_for_ascii(self):
        html = b'<html><head><meta charset="iso-8859-1"></head>plain</html>'
        r = self._resp(html)
        assert r.encoding == "iso-8859-1"

    def test_pure_ascii_utf8(self):
        r = self._resp(b"hello world")
        assert r.encoding == "utf-8"

    def test_latin1_accented_text(self):
        body = "café résumé naïve déjà vu à côté".encode("latin-1")
        r = self._resp(body)
        assert r.text == "café résumé naïve déjà vu à côté"

    def test_utf16_bom(self):
        from pyspider_ray.functions.encoding import detect_encoding
        assert detect_encoding("hi".encode("utf-16")) == "utf-16"

    def test_shift_jis_detected(self):
        jp = "今日は天気がいいので公園へ散歩に行きます。日本語のテキスト。"
        r = self._resp(jp.encode("shift_jis"))
        assert r.text == jp

    def test_declared_utf8_with_one_corrupt_byte_stays_utf8(self):
        """A declared charset that fails strict decode still competes:
        a utf-8 page with a single corrupt byte must NOT be re-detected
        as a legacy CJK codec and come out as mojibake — the reference
        decodes with the declared charset using replacement errors."""
        body = self.CN.encode("utf-8")
        corrupt = body[:10] + b"\xff" + body[10:]
        r = self._resp(corrupt, ctype="text/html; charset=utf-8")
        assert r.encoding == "utf-8"
        assert self.CN[:3] in r.text

    def test_declared_utf8_corrupt_ascii_page_stays_utf8(self):
        body = b"plain english text " * 40 + b"\xfe\xff" + b" tail"
        r = self._resp(body, ctype="text/html; charset=utf-8")
        assert r.encoding == "utf-8"


class TestCronInheritanceDedup:
    def test_override_does_not_double_fire(self):
        """A subclass overriding an @every method must carry ONE job
        under that name — the override — never the stale parent
        implementation alongside it."""
        from pyspider_ray.handler import BaseHandler, every

        class Parent(BaseHandler):
            @every(seconds=120)
            def job(self):
                return "parent"

            @every(seconds=180)
            def other(self):
                return "other"

        class Child(Parent):
            @every(seconds=60)
            def job(self):
                return "child"

        names = [j.__name__ for j in Child._cron_jobs]
        assert sorted(names) == ["job", "other"]
        job = next(j for j in Child._cron_jobs if j.__name__ == "job")
        assert job(None) == "child"
        assert job.tick == 60
        # plain (non-@every) override DISABLES the inherited job
        class Quiet(Parent):
            def job(self):
                return "plain"

        assert [j.__name__ for j in Quiet._cron_jobs] == ["other"]

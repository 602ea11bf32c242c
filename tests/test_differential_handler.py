"""Differential handler-API test: our BaseHandler._crawl vs the
reference's (pyspider/libs/base_handler.py) executed in-process as the
oracle — URL canonicalization (_build_url/quote_chinese), params/data
packing, schedule/fetch/process kwarg splitting, md5 taskid identity,
@config defaults merging, and D1 in-callback follows dedup.

The reference module imports heavy optional deps (chardet/lxml/
pyquery/tblib/requests) it never uses on the _crawl path; they are
stubbed just enough to import.  Skipped when the reference tree is
unavailable."""

import sys
import types

import pytest

try:
    import collections
    import collections.abc
    import importlib
    import urllib.parse
    if not hasattr(collections, "Mapping"):
        collections.Mapping = collections.abc.Mapping

    def _stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    _stub("chardet", detect=lambda b: {"encoding": "utf-8"})
    _stub("lxml")
    _stub("lxml.html")
    _stub("lxml.etree")
    _stub("tblib", Traceback=object)
    _stub("pyquery", PyQuery=object)

    class _REM:
        @staticmethod
        def _encode_params(data):
            # mirrors requests.models.RequestEncodingMixin._encode_params
            if isinstance(data, (str, bytes)):
                return data
            if hasattr(data, "read"):
                return data
            if hasattr(data, "__iter__"):
                items = data.items() if hasattr(data, "items") else data
                result = []
                for k, vs in items:
                    if isinstance(vs, (str, bytes)) \
                            or not hasattr(vs, "__iter__"):
                        vs = [vs]
                    for v in vs:
                        if v is not None:
                            result.append(
                                (k.encode() if isinstance(k, str) else k,
                                 v.encode() if isinstance(v, str)
                                 else str(v)))
                return urllib.parse.urlencode(result, doseq=True)
            return data

    req = _stub("requests", HTTPError=type("HTTPError", (Exception,), {}))
    req.structures = _stub("requests.structures",
                           CaseInsensitiveDict=dict)
    req.models = _stub("requests.models", RequestEncodingMixin=_REM)

    class _PR:
        def __init__(self, *a, **k):
            pass
    _stub("pyspider.processor", ProcessorResult=_PR)
    if "pyspider" not in sys.modules:
        pk = types.ModuleType("pyspider")
        pk.__path__ = []
        sys.modules["pyspider"] = pk
    libs = types.ModuleType("pyspider.libs")
    libs.__path__ = ["/root/reference/pyspider/libs"]
    sys.modules["pyspider"].libs = libs
    sys.modules["pyspider.libs"] = libs
    ref_bh = importlib.import_module("pyspider.libs.base_handler")
    HAVE_REF = True
except Exception:   # pragma: no cover
    HAVE_REF = False

from pyspider_ray.handler import BaseHandler, config

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference pyspider not importable")


def make_pair():
    class RefHandler(ref_bh.BaseHandler):
        project_name = "diff"

        def on_start(self, response):
            pass

        def page(self, response):
            pass

        @ref_bh.config(age=600, priority=4)
        def detail(self, response):
            pass

    class OurHandler(BaseHandler):
        project_name = "diff"

        def on_start(self, response):
            pass

        def page(self, response):
            pass

        @config(age=600, priority=4)
        def detail(self, response):
            pass

    r = RefHandler()
    r._reset()
    o = OurHandler()
    o._reset()
    return r, o


CASES = [
    # (url, kwargs)
    ("http://example.com/a", {"callback": "page"}),
    ("http://example.com", {"callback": "page"}),              # '/' default
    ("http://example.com/页面/路径", {"callback": "page"}),     # quote_chinese
    ("http://EXAMPLE.com/x?b=2", {"callback": "page",
                                  "params": {"a": 1}}),        # param merge
    ("http://example.com/p", {"callback": "page",
                              "data": {"k": "v", "x": "y"}}),  # POST pack
    ("http://example.com/u", {"callback": "page",
                              "user_agent": "ua/7"}),          # UA header
    ("http://example.com/s", {"callback": "page", "priority": 9,
                              "exetime": 123.0, "age": 10,
                              "itag": "v3", "auto_recrawl": True}),
    ("http://example.com/f", {"callback": "page",
                              "headers": {"H": "1"}, "timeout": 33,
                              "validate_cert": False,
                              "proxy": "p:8080", "etag": "abc",
                              "save": {"x": 1}}),
    ("http://example.com/cfg", {"callback": "detail"}),        # @config
    ("http://example.com/cfg2", {"callback": "detail",
                                 "age": 5}),                   # override
]


class TestDifferentialCrawl:
    @pytest.mark.parametrize("url,kwargs", CASES,
                             ids=[c[0].split("/")[-1] or "root"
                                  for c in CASES])
    def test_crawl_task_parity(self, url, kwargs):
        ref, ours = make_pair()
        rt = ref.crawl(url, **dict(kwargs))
        ot = ours.crawl(url, **dict(kwargs))
        assert ot["url"] == rt["url"]
        assert ot["taskid"] == rt["taskid"]          # md5 identity
        assert ot.get("project") == rt.get("project")
        for part in ("schedule", "fetch", "process"):
            assert ot.get(part, {}) == rt.get(part, {}), part

    def test_follows_dedup_d1(self):
        ref, ours = make_pair()
        for h in (ref, ours):
            h.crawl("http://example.com/a", callback="page")
            h.crawl("http://example.com/a", callback="page")   # dup
            h.crawl("http://example.com/b", callback="page")
        assert [t["taskid"] for t in ours._follows] == \
            [t["taskid"] for t in ref._follows]
        assert len(ours._follows) == 2

    def test_curl_command_parity(self):
        ref, ours = make_pair()
        curl = ("curl 'http://example.com/api' -H 'X-Tok: t1' "
                "--data 'a=1&b=2' --compressed")
        rt = ref.crawl(curl, callback="page")
        ot = ours.crawl(curl, callback="page")
        # curl commands carry a URL LIST -> both return task lists
        assert isinstance(rt, list) and isinstance(ot, list)
        rt, ot = rt[0], ot[0]
        assert ot["url"] == rt["url"]
        assert ot["taskid"] == rt["taskid"]
        assert ot["fetch"].get("data") == rt["fetch"].get("data")
        assert ot["fetch"].get("method", "GET") == \
            rt["fetch"].get("method", "GET")

    def test_get_taskid_override(self):
        class RefCustom(ref_bh.BaseHandler):
            project_name = "diff"

            def page(self, response):
                pass

            def get_taskid(self, task):
                return "fixed:" + task["url"]

        class OurCustom(BaseHandler):
            project_name = "diff"

            def page(self, response):
                pass

            def get_taskid(self, task):
                return "fixed:" + task["url"]

        r = RefCustom()
        r._reset()
        o = OurCustom()
        o._reset()
        rt = r.crawl("http://example.com/z", callback="page")
        ot = o.crawl("http://example.com/z", callback="page")
        assert ot["taskid"] == rt["taskid"] == "fixed:http://example.com/z"


class TestDifferentialCrawlConfigJoin:
    def test_task_join_crawl_config_parity(self):
        """M7/J6 — nested-dict merge with per-task precedence
        (base_handler.py:227-253) against the reference function."""
        cases = [
            ({}, {"headers": {"A": "1"}, "timeout": 30,
                  "process_time_limit": 9}),
            ({"fetch": {"headers": {"A": "task"}, "data": "x"}},
             {"headers": {"A": "proj", "B": "2"}, "timeout": 30}),
            ({"process": {"callback": "page"}},
             {"process_time_limit": 5}),
            ({"fetch": {"timeout": 1}}, {"timeout": 99,
                                         "validate_cert": False}),
        ]
        for task_partial, crawl_config in cases:
            import copy
            rt = ref_bh.BaseHandler.task_join_crawl_config(
                copy.deepcopy(task_partial), copy.deepcopy(crawl_config))
            ot = BaseHandler.task_join_crawl_config(
                copy.deepcopy(task_partial), copy.deepcopy(crawl_config))
            assert ot == rt, (task_partial, crawl_config)

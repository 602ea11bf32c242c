"""Browser UI (webapi.py + webui_pages.py) — the reference webui's
dashboard (webui/index.py + templates/index.html) and debug editor
(webui/debug.py + templates/debug.html) served over the JSON API.

The VERDICT round-4 'Done' bar: two HTML pages served by the existing
server, e2e script edit → save → debug-run round trip."""

import json
import urllib.request

import pytest

from pyspider_ray import webapi
from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline


def _get(base, path):
    try:
        with urllib.request.urlopen(base + path, timeout=10) as r:
            return (r.status, r.headers.get("Content-Type"),
                    r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read().decode()


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    out = tmp_path_factory.mktemp("webui") / "crawl"
    cfg = CrawlConfig(total=60, n_seeds=6, n_shards=2, loop_limit=20,
                      use_ray=False, out_dir=str(out))
    pipe = CrawlPipeline(cfg)
    pipe.seed()
    for _ in range(3):
        pipe.run_round()
    srv = webapi.serve(pipe)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, pipe
    srv.shutdown()


SCRIPT_V1 = """# rate: 100
# burst: 100
from pyspider.libs.base_handler import *

class Handler(BaseHandler):
    def on_start(self, response):
        self.crawl('data:,seed1', callback=self.page)

    def page(self, response):
        return {'version': 1}
"""


class TestPages:
    def test_index_page_serves_dashboard(self, served):
        base, _ = served
        code, ctype, body = _get(base, "/")
        assert code == 200 and ctype.startswith("text/html")
        # the page drives every dashboard feed + the control verbs
        for marker in ('id="projects"', 'id="rounds"', 'id="active"',
                       'id="results"', "/counters?window=5m",
                       "/queues", "/active_tasks", "/metrics",
                       "pause", "unpause", "/rate"):
            assert marker in body
        assert _get(base, "/index.html")[0] == 200

    def test_debug_page_serves_editor(self, served):
        base, _ = served
        code, ctype, body = _get(base, "/debug")
        assert code == 200 and ctype.startswith("text/html")
        for marker in ('id="script"', 'id="run"', 'id="save"',
                       "/debug/script", "/script"):
            assert marker in body

    def test_debug_script_scaffold_builds_and_runs(self, served):
        """Non-script-driven crawl: the editor opens the sample
        scaffold, and that scaffold actually RUNS through POST /debug
        (the 'create new project' path of webui/index.py)."""
        base, _ = served
        code, _, body = _get(base, "/debug/script")
        assert code == 200
        scaffold = json.loads(body)
        assert scaffold["path"] is None
        assert "class Handler(BaseHandler)" in scaffold["script"]
        code, out = _post(base, "/debug", {
            "script": scaffold["script"], "url": "data:,on_start"})
        assert code == 200 and out["ok"], out.get("exception")
        assert len(out["follows"]) == 1
        assert out["follows"][0]["process"]["callback"] == "on_page"

    def test_edit_save_debug_round_trip(self, tmp_path):
        """The full editor loop over HTTP against a script-driven
        crawl: load the registered script, debug-run an EDITED
        version, save it (hot-swap queued), and re-load to see the
        saved content."""
        from pyspider_ray.sources.projectdb import (LocalProjectDB,
                                                    build_handler)
        script = tmp_path / "editproj.py"
        script.write_text(SCRIPT_V1)
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
        try:
            # 1. the editor loads the crawl's real script file
            loaded = json.loads(_get(base, "/debug/script")[2])
            assert loaded["path"] == str(script)
            assert loaded["script"] == SCRIPT_V1

            # 2. debug-run an edited version (not yet saved)
            edited = SCRIPT_V1.replace("'version': 1", "'version': 2")
            code, out = _post(base, "/debug", {
                "script": edited, "url": "data:,seed1",
                "task": {"taskid": "t", "url": "data:,seed1",
                         "process": {"callback": "page"}}})
            assert code == 200 and out["result"] == {"version": 2}
            assert script.read_text() == SCRIPT_V1   # run != save

            # 3. save via the editor's endpoint → file + hot swap
            code, out = _post(base,
                              f"/projects/{cfg.project}/script",
                              {"script": edited})
            assert code == 200 and out["saved"]
            assert script.read_text() == edited

            # 4. the editor re-loads the SAVED version
            reloaded = json.loads(_get(base, "/debug/script")[2])
            assert reloaded["script"] == edited

            # 5. the hot swap applies at the next round boundary
            pipe.run_round()
            assert pipe.cfg.handler_cls.__module__ is not None
        finally:
            srv.shutdown()

    def test_404_lists_ui_endpoints(self, served):
        base, _ = served
        code, _, body = _get(base, "/nosuch")
        assert code == 404
        assert "/ (dashboard)" in body and "/debug (script editor)" in body

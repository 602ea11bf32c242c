"""Read-only results/metrics HTTP API (pyspider_ray/webapi.py) — the
reference's webui data surface (webui/result.py:20-54) served over
stdlib http.server against a finished crawl."""

import csv
import io
import json
import urllib.request

import pytest

from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline
from pyspider_ray import webapi


def _get(base, path):
    try:
        with urllib.request.urlopen(base + path, timeout=5) as r:
            return (r.status, r.headers.get("Content-Type"),
                    r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read().decode()


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    out = tmp_path_factory.mktemp("webapi") / "crawl"
    cfg = CrawlConfig(total=60, n_seeds=6, n_shards=2, loop_limit=50,
                      use_ray=False, out_dir=str(out))
    pipe = CrawlPipeline(cfg)
    pipe.seed()
    pipe.run(max_rounds=100)
    srv = webapi.serve(pipe)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, pipe
    srv.shutdown()


class TestResultsEndpoint:
    def test_paging(self, served):
        base, pipe = served
        code, ctype, body = _get(base, "/results?offset=0&limit=10")
        assert code == 200 and ctype.startswith("application/json")
        page = json.loads(body)
        assert page["count"] == 60
        assert len(page["results"]) == 10
        # distinct second page (resultdb.select offset semantics)
        page2 = json.loads(_get(base, "/results?offset=10&limit=10")[2])
        ids1 = {r["taskid"] for r in page["results"]}
        ids2 = {r["taskid"] for r in page2["results"]}
        assert ids1.isdisjoint(ids2)
        # binary payload columns are summarized, not shipped
        assert all(str(r.get("bytes", "")).startswith("<")
                   for r in page["results"])

    def test_project_filter_and_tail_page(self, served):
        base, pipe = served
        page = json.loads(_get(base, "/results?project=bench&offset=55"
                                     "&limit=20")[2])
        assert page["count"] == 60
        assert len(page["results"]) == 5      # tail page clipped
        missing = json.loads(_get(base, "/results?project=nosuch")[2])
        assert missing["count"] == 0 and missing["results"] == []

    def test_dump_json_txt_csv(self, served):
        base, pipe = served
        code, ctype, body = _get(base, "/results/dump/bench.json?limit=5")
        assert code == 200
        rows = [json.loads(line) for line in body.splitlines()]
        assert len(rows) == 5 and all("url" in r for r in rows)
        code, ctype, body = _get(base, "/results/dump/bench.txt?limit=3")
        assert code == 200 and ctype.startswith("text/plain")
        assert all("\t" in line for line in body.splitlines())
        code, ctype, body = _get(base, "/results/dump/bench.csv?limit=5")
        assert code == 200 and ctype.startswith("text/csv")
        parsed = list(csv.reader(io.StringIO(body)))
        assert len(parsed) == 6               # header + 5 rows
        assert "url" in parsed[0]

    def test_dump_bad_format_400(self, served):
        base, _ = served
        code, _, _ = _get(base, "/results/dump/bench.xml")
        assert code == 400


class TestMetricsEndpoints:
    def test_counters_windows(self, served):
        base, pipe = served
        for window in ("5m", "1h", "1d", "all"):
            body = json.loads(_get(base, f"/counters?window={window}")[2])
            assert "bench" in body
            assert body["bench"].get("success", 0) > 0
        code, _, _ = _get(base, "/counters?window=bogus")
        assert code == 400

    def test_active_tasks_ring(self, served):
        base, pipe = served
        tasks = json.loads(_get(base, "/active_tasks")[2])
        assert 0 < len(tasks) <= 100          # T9 ring bound
        # newest-first ordering
        times = [t[0] for t in tasks]
        assert times == sorted(times, reverse=True)

    def test_round_metrics(self, served):
        base, pipe = served
        metrics = json.loads(_get(base, "/metrics")[2])
        assert metrics and metrics[0]["round"] == 0
        assert sum(m["fetched"] for m in metrics) == 60

    def test_unknown_path_404(self, served):
        base, _ = served
        code, _, body = _get(base, "/nope")
        assert code == 404 and "endpoints" in body

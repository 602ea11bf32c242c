"""Units for windowed metrics (T7/A3/A4) and result export (S10/M17),
semantics pinned against pyspider/libs/counter.py + result_dump.py
(reference tests: test_counter.py, test_result_dump.py)."""

import json

import pytest

from pyspider_ray.functions.export import (dump_as_csv, dump_as_json,
                                           dump_as_txt, result_formater)
from pyspider_ray.state import VirtualClock
from pyspider_ray.state.metrics import MetricsHub, TotalCounter, WindowedCounter

T0 = 1_700_000_000.0


class TestCounters:
    def test_total(self):
        c = TotalCounter()
        c.event().event(2)
        assert c.sum == 3 and c.avg == 3 and not c.empty()

    def test_windowed_sum_and_trim(self):
        clock = VirtualClock(T0)
        c = WindowedCounter(window_size=3, window_interval=10, clock=clock)
        c.event(5)
        assert c.sum == 5
        clock.advance(11)          # bucket rolls
        c.event(7)
        assert c.sum == 12
        clock.advance(25)          # first bucket now outside 3x10s window
        assert c.sum == 7
        clock.advance(50)
        assert c.sum == 0 and c.empty()

    def test_windowed_avg_ramps(self):
        clock = VirtualClock(T0)
        c = WindowedCounter(window_size=30, window_interval=10, clock=clock)
        for _ in range(10):
            c.event(6)
            clock.advance(10)
        # 60 events over a ~100s ramped window -> ~0.6/s
        assert c.avg == pytest.approx(60 / c.window_size / 10)

    def test_hub_merge_and_topk(self):
        clock = VirtualClock(T0)
        hub = MetricsHub(clock)
        hub.ingest_shard_deltas({("p1", "failed"): 10, ("p1", "success"): 1,
                                 ("p2", "success"): 50,
                                 ("p3", "pending"): 2})
        top = hub.top_projects()
        assert top["top_fails"][0] == (10, "p1")
        assert top["top_actives"][0][1] == "p2"
        assert hub.to_dict("all")["p2"]["success"] == 50

    def test_dump_load(self, tmp_path):
        clock = VirtualClock(T0)
        hub = MetricsHub(clock)
        hub.event("p", "success", 4)
        path = str(tmp_path / "cnt.json")
        hub.dump(path)
        hub2 = MetricsHub(clock)
        hub2.load(path)
        assert hub2.to_dict("all")["p"]["success"] == 4
        assert hub2.to_dict("5m")["p"]["success"] == 4


def rows():
    return [
        {"url": "http://a/", "result": {"x": 1, "y": 2}},
        {"url": "http://b/", "result": {"x": 3, "z": 9}},
        {"url": "http://c/", "result": {"x": 5, "y": 0, "z": 1}},
    ]


class TestExport:
    def test_result_formater_common_fields(self):
        common, out = result_formater(rows())
        assert common == {"x"}
        assert out[0]["result_formated"] == {"x": 1}
        assert out[0]["others"] == {"y": 2}
        assert out[1]["others"] == {"z": 9}

    def test_formater_non_dict(self):
        common, out = result_formater([{"url": "u", "result": [1, 2]}])
        assert common == set()
        assert out[0]["others"] == [1, 2]

    def test_json_lines_and_valid(self):
        lines = list(dump_as_json(rows()))
        assert len(lines) == 3
        assert json.loads(lines[0])["url"] == "http://a/"
        valid = "".join(dump_as_json(rows(), valid=True))
        assert isinstance(json.loads(valid), list)

    def test_txt(self):
        lines = list(dump_as_txt(rows()))
        assert lines[1].startswith("http://b/\t")
        assert json.loads(lines[1].split("\t", 1)[1]) == {"x": 3, "z": 9}

    def test_csv_header_from_first_30(self):
        chunks = list(dump_as_csv(rows()))
        text = "".join(chunks)
        header, *data = [line for line in text.splitlines() if line]
        assert header.split(",")[:2] == ["url", "x"]
        assert len(data) == 3
        assert data[0].startswith("http://a/,1,")

"""Frontier export/import as a portable columnar taskdb (S1/S3) and the
format-pluggable storage layer."""

import numpy as np
import pyarrow as pa

from pyspider_ray.model import ACTIVE, SUCCESS
from pyspider_ray.sources import (export_frontier, load_frontier,
                                  read_table, storage_format,
                                  table_to_frontier_rows, write_table)
from pyspider_ray.state import FrontierShard, ProjectConfig, VirtualClock


def test_write_read_roundtrip(tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    path = write_table(t, str(tmp_path / "t"))
    assert path.endswith("." + storage_format())
    assert read_table(str(tmp_path / "t")).equals(t)


def test_frontier_export_reload(tmp_path):
    clock = VirtualClock(1.7e9)
    shards = [FrontierShard(i, 2, clock=clock) for i in range(2)]
    for s in shards:
        s.update_project(ProjectConfig("p", rate=1e9, burst=1e9))
    # seed a mix of ACTIVE (queued/delayed) and SUCCESS tasks
    tasks = []
    for i in range(40):
        t = {"taskid": f"t{i:02d}", "urlhash": i * 7919, "project": "p",
             "url": f"u{i}", "host": "h",
             "schedule": {"priority": i % 3,
                          "exetime": clock.now() + 5 if i % 4 == 0 else 0},
             "seq": i + 1}
        tasks.append(t)
        shards[t["urlhash"] % 2].on_request_batch([t])
    # complete a few
    for i in range(0, 40, 5):
        t = tasks[i]
        s = shards[t["urlhash"] % 2]
        s._queue("p").take(t["taskid"]) or s._queue("p").done(t["taskid"])
        s.on_status_batch([{"taskid": t["taskid"], "project": "p",
                            "track": {"process_ok": True}}])

    out = export_frontier(shards, str(tmp_path / "frontier"),
                          lineage={"round": 3, "seed": 42})
    table = load_frontier(out)
    assert table.num_rows == 40
    statuses = dict(zip(table["taskid"].to_pylist(),
                        table["status"].to_pylist()))
    done = sum(1 for v in statuses.values() if v == SUCCESS)
    assert done >= 4

    # bootstrap fresh shards from the exported table (S1 load_tasks)
    clock2 = VirtualClock(1.7e9)
    fresh = [FrontierShard(i, 2, clock=clock2) for i in range(2)]
    for s in fresh:
        s.update_project(ProjectConfig("p", rate=1e9, burst=1e9))
    rows = table_to_frontier_rows(table)
    loaded = sum(s.load_tasks([r for r in rows
                               if r["urlhash"] % 2 == s.shard_id])
                 for s in fresh)
    active = sum(1 for v in statuses.values() if v == ACTIVE)
    assert loaded == active
    # queued sizes reflect only ACTIVE rows; delayed entries preserved
    assert sum(s.queue_size("p") for s in fresh) == active
    clock2.advance(10)
    for s in fresh:
        s.check_update()
    popped = []
    for s in fresh:
        while (x := s._queue("p").get()) is not None:
            popped.append(x)
    assert len(popped) == active

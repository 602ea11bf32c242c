"""Driver contract for the Ray-Data-native pyspider engine.

``entry()``  — flagship: a deterministic crawl (sharded frontier actors,
politeness gate, synthetic fetch/process stages, Parquet results) seeded
from the sf0.001 ``events`` table; returns the image+caption result rows.

``queries()`` / ``oracle_sql()`` — SURVEY.md §2 operator inventory as
Ray Data pipelines with DuckDB oracles (pyspider_ray/queries.py), plus
rows-only entries for the non-SQL-expressible crawl/dedup/multimodal ops.

Ray is initialised by the caller; nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import os
import shutil
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    import pyarrow.parquet as pq

    from pyspider_ray.pipelines import CrawlConfig, CrawlPipeline

    events = pq.read_table(f"{SF0001}/events.parquet",
                           columns=["event_id", "user_id"])
    total = 400
    out_dir = "/tmp/pyspider_ray_entry"
    shutil.rmtree(out_dir, ignore_errors=True)
    cfg = CrawlConfig(total=total, n_seeds=0, n_shards=4, use_ray=True,
                      out_dir=out_dir, batch_size=128, concurrency=2,
                      loop_limit=1000)
    pipe = CrawlPipeline(cfg)
    # seed the frontier from the first 10 event rows (sf-table-derived),
    # mapped onto the synthetic web's canonical host layout
    import numpy as np

    from pyspider_ray.functions.synthweb import urls_of
    rows = events.slice(0, 10).to_pylist()
    seed_ids = np.array([r["event_id"] % total for r in rows], dtype=np.int64)
    urls = urls_of(seed_ids, cfg.n_hosts)
    pipe.enqueue([{"url": u, "schedule": {"priority": 1}} for u in urls])
    pipe.run(max_rounds=60)
    return pipe.results_dataset()


def queries() -> dict[str, Callable[[str], Any]]:
    from pyspider_ray import queries as q
    out: dict[str, Callable[[str], Any]] = dict(q.QUERIES)
    out.update(_extra_queries())
    return out


def oracle_sql() -> dict[str, str]:
    from pyspider_ray import queries as q
    oracles = dict(q.ORACLES)
    from pyspider_ray import training_queries as tq
    oracles.update(tq.ORACLES)
    return oracles


def _extra_queries() -> dict[str, Callable[[str], Any]]:
    from pyspider_ray import training_queries as tq
    return dict(tq.QUERIES)

"""Shared Ray Data read helpers for the query families.

One owner for the parquet-read hygiene both ``queries.py`` and
``training_queries.py`` rely on (previously copy-pasted in each).
"""

from __future__ import annotations

import pyarrow as pa


def rd():
    """ray.data with progress bars off (bench/test hygiene)."""
    import ray.data as _rd
    _rd.DataContext.get_current().enable_progress_bars = False
    return _rd


def read_table(sf_dir: str, table: str, columns=None):
    """``read_parquet`` with a METADATA-FREE schema: the test files
    carry pandas schema metadata (an unhashable dict) that otherwise
    rides in on every block and defeats Ray Data's block-schema dedup
    ("Failed to hash the schemas" per block).  One driver-side footer
    read strips it; column pruning pushes down as usual."""
    import pyarrow.parquet as pq
    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd().read_parquet(path, columns=columns, schema=schema)

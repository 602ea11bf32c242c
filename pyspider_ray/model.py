"""Data model: Arrow schemas + scheduler constants.

Task/frontier row shape follows pyspider/database/base/taskdb.py:9-56
(flattened per FIXTURES.md F3); result rows follow
pyspider/database/base/resultdb.py:9-17 extended with the image+caption
payload required by BASELINE.json ``input_hint``; scheduler constants
from pyspider/scheduler/scheduler.py:142-164.
"""

from __future__ import annotations

import pyarrow as pa

# -- status enum (pyspider/database/base/taskdb.py:60-63) -------------------
ACTIVE = 1
SUCCESS = 2
FAILED = 3
BAD = 4

STATUS_NAMES = {ACTIVE: "ACTIVE", SUCCESS: "SUCCESS", FAILED: "FAILED", BAD: "BAD"}

# -- scheduler constants (pyspider/scheduler/scheduler.py:142-164) ----------
DEFAULT_SCHEDULE = {
    "priority": 0,
    "retries": 3,
    "exetime": 0.0,
    "age": -1,
    "itag": None,
}
LOOP_LIMIT = 1000
ACTIVE_TASKS = 100
INQUEUE_LIMIT = 0            # 0 = unlimited
DEFAULT_RETRY_DELAY = {0: 30, 1: 1 * 60 * 60, 2: 6 * 60 * 60, 3: 12 * 60 * 60,
                       "": 24 * 60 * 60}
FAIL_PAUSE_NUM = 10
PAUSE_TIME = 5 * 60
UNPAUSE_CHECK_NUM = 3
PROCESSING_TIMEOUT = 10 * 60
FOLLOWS_CHUNK = 1000         # processor.py:173-175

SCHEDULE_FIELDS = pa.struct([
    ("priority", pa.int32()),
    ("retries", pa.int32()),
    ("retried", pa.int32()),
    ("exetime", pa.float64()),
    ("age", pa.int64()),
    ("itag", pa.string()),
    ("force_update", pa.bool_()),
    ("auto_recrawl", pa.bool_()),
    ("cancel", pa.bool_()),
])

FETCH_FIELDS = pa.struct([
    ("method", pa.string()),
    ("data", pa.string()),
    ("timeout", pa.int32()),
    ("save", pa.string()),          # JSON blob (user payload carried through)
])

PROCESS_FIELDS = pa.struct([
    ("callback", pa.string()),
    ("process_time_limit", pa.int32()),
])

TRACK_FIELDS = pa.struct([
    ("fetch_ok", pa.bool_()),
    ("fetch_time", pa.float64()),
    ("status_code", pa.int32()),
    ("process_ok", pa.bool_()),
    ("process_time", pa.float64()),
    ("follows", pa.int32()),
])

# Frontier (taskdb) row, flattened — FIXTURES.md F3
FRONTIER_SCHEMA = pa.schema([
    ("taskid", pa.string()),
    ("urlhash", pa.int64()),
    ("project", pa.string()),
    ("url", pa.string()),
    ("host", pa.string()),
    ("status", pa.int8()),
    ("schedule", SCHEDULE_FIELDS),
    ("fetch", FETCH_FIELDS),
    ("process", PROCESS_FIELDS),
    ("track", TRACK_FIELDS),
    ("seq", pa.int64()),
    ("lastcrawltime", pa.float64()),
    ("updatetime", pa.float64()),
])

# Result row = resultdb row + image payload — FIXTURES.md F7
RESULT_SCHEMA = pa.schema([
    ("taskid", pa.string()),
    ("project", pa.string()),
    ("url", pa.string()),
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
    ("updatetime", pa.float64()),
])

# Fetch-result row (fetcher output, tornado_fetcher.py:56-63 analogue)
FETCH_RESULT_SCHEMA = pa.schema([
    ("taskid", pa.string()),
    ("urlhash", pa.int64()),
    ("project", pa.string()),
    ("url", pa.string()),
    ("host", pa.string()),
    ("status_code", pa.int32()),
    ("content", pa.binary()),
    ("fetch_time", pa.float64()),
    ("error", pa.string()),
])


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()

"""Canonicalization stage: url → (canonical url, host, taskid, urlhash).

The M2/M3/M6 trio (pyspider/libs/url.py:29-70 +
base_handler.py:342-344) as a batch transform.  md5 is inherently
per-row, but the loop body is two C calls (hashlib + urlsplit); at
~1 µs/URL a 64 k-row batch canonicalizes in well under 0.1 s.
Usable both as a Ray Data ``map_batches(canonicalize_table)`` stage and
driver-side on small follow batches.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

from ..functions.urls import build_url, quote_non_ascii


def canonicalize_urls(urls) -> dict:
    """Vector helper: list/array of url strings → dict of numpy/list
    columns (url, host, taskid, urlhash)."""
    canon, hosts, taskids, hashes = [], [], [], np.empty(len(urls), np.int64)
    for i, u in enumerate(urls):
        if u.startswith("data:"):
            cu = u  # control tasks keep their data-URI verbatim (S8)
            hosts.append("")
        else:
            cu = quote_non_ascii(build_url(u))
            hosts.append(urlsplit(cu).netloc.lower())
        canon.append(cu)
        digest = hashlib.md5(cu.encode("utf-8")).digest()
        taskids.append(digest.hex())
        hashes[i] = int.from_bytes(digest[8:16], "big", signed=True)
    return {"url": canon, "host": hosts, "taskid": taskids, "urlhash": hashes}


def canonicalize_table(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Arrow in/out: replaces ``url`` and appends host/taskid/urlhash."""
    cols = canonicalize_urls(batch[url_col].to_pylist())
    out = batch.drop_columns([c for c in ("url", "host", "taskid", "urlhash")
                              if c in batch.column_names])
    out = out.append_column("url", pa.array(cols["url"], pa.string()))
    out = out.append_column("host", pa.array(cols["host"], pa.string()))
    out = out.append_column("taskid", pa.array(cols["taskid"], pa.string()))
    out = out.append_column("urlhash", pa.array(cols["urlhash"], pa.int64()))
    return out

"""pyspider_ray — a Ray-Data-native crawl frontier + fetch scheduler.

A from-scratch re-expression of binux/pyspider's query & data-processing
capabilities (reference at /root/reference, cited as ``file:line`` in
docstrings) on top of ``ray.data.Dataset`` pipelines:

- zero-copy Arrow ``map_batches`` stages for canonicalization, fetch
  simulation, parsing and payload decode,
- actor pools for the stateful pieces (sharded URL-seen frontier,
  per-host politeness gate, processor UDF registry),
- ``groupby`` / ``sort`` shuffles for the wide steps (dedup by urlhash,
  ordered emit by ``(-priority, seq)``),
- partitioned Parquet (Lance when available) sinks with per-partition
  lineage for checkpoint/resume.

Nothing here calls ``ray.init``; the embedding driver owns the session.
"""

__version__ = "0.1.0"

# Allocator tuning fires in every process that imports the package —
# including each Ray worker as it unpickles a stage function (see
# _malloc.py for the why and the measured 10x on cold batch kernels).
from ._malloc import tune_malloc as _tune_malloc

_tune_malloc()

VIRTUAL_EPOCH = 1_700_000_000.0  # t0 of the deterministic virtual clock (FIXTURES.md)

"""Curation CLI pipeline: partitioned output parity with the composed
queries, resume semantics, and the no-collapse variant."""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pds
import pytest


def _out_ids(out_dir):
    return set(pds.dataset(out_dir, format="parquet", partitioning="hive")
               .to_table(columns=["doc_id"])["doc_id"].to_pylist())


@pytest.mark.usefixtures("ray_session")
class TestCuratePipeline:
    def test_run_matches_composed_queries(self, sf_dir, tmp_path):
        from pyspider_ray import training_queries as tq
        from pyspider_ray.pipelines.curate import run

        out = str(tmp_path / "curated")
        m = run(sf_dir, out, n_parts=4)
        assert m["rows_in"] > m["rows_out"] > 0

        cur = set(tq.q_curate_corpus(sf_dir).to_pandas()["doc_id"])
        comp = tq.q_near_dup_components(sf_dir).to_pandas()
        losers = set(comp.doc_id[comp.doc_id != comp.component])
        assert _out_ids(out) == cur - losers
        assert m["rows_out"] == len(cur - losers)
        # partitioned layout: hive dirs, several parts
        parts = [d for d in os.listdir(out) if d.startswith("part=")]
        assert len(parts) > 1

    def test_resume_skips_finished_output(self, sf_dir, tmp_path):
        from pyspider_ray.pipelines.curate import run

        out = str(tmp_path / "curated")
        m1 = run(sf_dir, out, n_parts=2, collapse_near_dups=False)
        marker = os.path.join(out, "_DONE")
        mtime = os.path.getmtime(marker)
        m2 = run(sf_dir, out, n_parts=2, collapse_near_dups=False,
                 resume=True)
        assert m2["skipped"] and m2["rows_out"] == m1["rows_out"]
        assert os.path.getmtime(marker) == mtime

    def test_no_collapse_equals_curate_corpus(self, sf_dir, tmp_path):
        from pyspider_ray import training_queries as tq
        from pyspider_ray.pipelines.curate import run

        out = str(tmp_path / "curated")
        run(sf_dir, out, n_parts=2, collapse_near_dups=False)
        cur = set(tq.q_curate_corpus(sf_dir).to_pandas()["doc_id"])
        assert _out_ids(out) == cur


def test_cli_subprocess(tmp_path):
    """The CLI owns its own Ray session and prints ONE JSON line."""
    out = str(tmp_path / "cli_out")
    r = subprocess.run(
        [sys.executable, "-m", "pyspider_ray.pipelines.curate",
         "--sf-dir", "/root/testdata/sf0.001", "--out", out,
         "--parts", "2", "--no-collapse"],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
        env={**os.environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 0, r.stderr[-2000:]
    m = json.loads(r.stdout.strip().splitlines()[-1])
    assert m["rows_out"] > 0 and os.path.exists(os.path.join(out, "_DONE"))

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
        # expected: per cluster, the minimum SURVIVING member stays
        surv = comp[comp.doc_id.isin(cur)]
        winners = surv.groupby("component")["doc_id"].min()
        losers = set(surv.doc_id) - set(winners)
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


def _write_docs(dirpath, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["t"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, os.path.join(dirpath, "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
class TestCurateEdgeCases:
    def test_collapse_keeps_surviving_cluster_member(self, tmp_path):
        """A near-dup cluster whose raw-graph representative (min
        doc_id) is dropped by the gates must still contribute its
        minimum SURVIVING member to the output — not vanish."""
        from pyspider_ray.pipelines.curate import run

        words = [f"alpha{i}" for i in range(19)] + ["the"]
        rows = [
            (100, " ".join(words)),            # holdout (100 % 50 == 0)
            (101, " ".join(words[::-1])),      # same wordset, reversed
            (102, "the " + " ".join(f"beta{i}" for i in range(15))),
        ]
        _write_docs(tmp_path, rows)
        out = str(tmp_path / "out")
        run(str(tmp_path), out, n_parts=2)
        assert _out_ids(out) == {101, 102}

    def test_contamination_is_normalized_on_all_paths(self, tmp_path,
                                                      monkeypatch):
        """Cased/multi-space duplicates of a holdout doc must be
        decontaminated on the broadcast path, the shuffled fallback,
        AND the SQL oracle — all three gram the NORMALIZED text."""
        import duckdb

        from pyspider_ray import training_queries as tq

        text = ("The Quick  Brown Fox Jumps Over The Lazy Dog "
                "And Keeps Running Far Away Today")
        rows = [
            (50, text),                        # holdout, cased + 2 spaces
            (3, text.lower().replace("  ", " ")),   # same after normalize
            (7, "the " + " ".join(f"gamma{i}" for i in range(15))),
        ]
        _write_docs(tmp_path, rows)

        def ids_of(df):
            return set(df["doc_id"])

        broadcast = ids_of(tq.q_curate_corpus(str(tmp_path)).to_pandas())
        assert broadcast == {7}      # 3 contaminated, 50 holdout

        monkeypatch.setattr(tq, "_DECON_MAX_BENCH", 0)
        fallback = ids_of(tq.q_curate_corpus(str(tmp_path)).to_pandas())
        assert fallback == broadcast

        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
        oracle = ids_of(con.sql(tq.ORACLES["curate_corpus"]).df())
        assert oracle == broadcast

    def test_resume_reruns_on_parameter_mismatch(self, tmp_path):
        from pyspider_ray.pipelines.curate import run

        rows = [(i, "the " + " ".join(f"delta{i}word{j}" for j in range(14)))
                for i in range(1, 9)]
        _write_docs(tmp_path, rows)
        out = str(tmp_path / "out")
        run(str(tmp_path), out, n_parts=2, collapse_near_dups=False)
        m = run(str(tmp_path), out, n_parts=4, collapse_near_dups=False,
                resume=True)
        assert "skipped" not in m and m["n_parts"] == 4
        m2 = run(str(tmp_path), out, n_parts=4, collapse_near_dups=False,
                 resume=True)
        assert m2.get("skipped")


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

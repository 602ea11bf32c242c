"""Resumable shard packer (pipelines/wds_write): the published
partitioned output must equal the pure-Python packing mirror, a killed
run must re-execute ONLY partitions missing their marker (finished
files untouched byte-for-byte), and a stale plan (different
parameters) must force a full rebuild instead of masquerading as this
run's output."""

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest


def _write_docs(dirpath, rows):
    import pyarrow as pa
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s0"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, os.path.join(dirpath, "documents.parquet"))


def _mirror(rows, shard_chars):
    key = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
           for i, _ in rows}
    order = sorted(rows, key=lambda r: (key[r[0]], r[0]))
    exp, before = {}, 0
    for i, text in order:
        exp[i] = before // shard_chars
        before += len(text)
    return key, exp


def _read_back(out):
    parts = sorted(d for d in os.listdir(out) if d.startswith("part="))
    tables = [pq.read_table(os.path.join(out, d, "data.parquet"))
              for d in parts]
    return parts, tables


@pytest.fixture
def corpus(tmp_path):
    rows = [(i, "x" * ((i * 137) % 900)) for i in range(1, 121)]
    src = tmp_path / "sf"
    src.mkdir()
    _write_docs(src, rows)
    return str(src), rows


class TestWdsWrite:
    def test_full_run_matches_mirror_and_global_order(self, ray_session,
                                                      corpus, tmp_path):
        from pyspider_ray.pipelines import wds_write
        src, rows = corpus
        out = str(tmp_path / "out")
        m = wds_write.run(src, out, n_parts=8)
        assert m["written_parts"] == 8 and m["skipped_parts"] == 0
        assert m["rows_written"] == len(rows)
        key, exp = _mirror(rows, wds_write.SHARD_CHARS)
        parts, tables = _read_back(out)
        assert len(parts) == 8
        got, last_key = {}, -1
        for t in tables:                      # parts are key ranges:
            ks = t["key"].to_pylist()         # concatenation is sorted
            for doc, k, sh in zip(t["doc_id"].to_pylist(), ks,
                                  t["shard_id"].to_pylist()):
                assert k == key[doc]
                assert k >= last_key
                last_key = k
                got[doc] = sh
        assert got == exp
        for d in parts:                       # every part published
            assert os.path.exists(os.path.join(out, d, "_DONE"))

    def test_resume_skips_finished_partitions(self, ray_session, corpus,
                                              tmp_path):
        import shutil

        from pyspider_ray.pipelines import wds_write
        src, rows = corpus
        out = str(tmp_path / "out")
        wds_write.run(src, out, n_parts=8)
        _, before_tables = _read_back(out)
        # simulate a crash that lost three partitions
        lost = ["part=0001", "part=0004", "part=0006"]
        for d in lost:
            shutil.rmtree(os.path.join(out, d))
        stamp = {d: os.path.getmtime(os.path.join(out, d, "data.parquet"))
                 for d in os.listdir(out) if d.startswith("part=")}
        m = wds_write.run(src, out, n_parts=8, resume=True)
        assert m["written_parts"] == 3 and m["skipped_parts"] == 5
        # finished partitions untouched (same inode mtime)
        for d, t in stamp.items():
            assert os.path.getmtime(
                os.path.join(out, d, "data.parquet")) == t
        # and the recovered output equals the original run exactly
        parts, after_tables = _read_back(out)
        assert len(parts) == 8
        assert [t.to_pydict() for t in after_tables] == \
               [t.to_pydict() for t in before_tables]

    def test_stale_plan_forces_full_rebuild(self, ray_session, corpus,
                                            tmp_path):
        from pyspider_ray.pipelines import wds_write
        src, _rows = corpus
        out = str(tmp_path / "out")
        wds_write.run(src, out, n_parts=4)
        m = wds_write.run(src, out, n_parts=8, resume=True)
        assert m["written_parts"] == 8 and m["skipped_parts"] == 0
        assert json.load(open(os.path.join(out, "_PLAN.json")))[
            "n_parts"] == 8
        parts, _ = _read_back(out)
        assert len(parts) == 8


class TestWdsWriteKillResume:
    def test_subprocess_crash_then_resume(self, corpus, tmp_path):
        """REAL-process drill: a run that dies after publishing 3 of 8
        partitions (injected driver crash between scheduling waves)
        must leave a resumable directory; `--resume` in a fresh
        process completes it to exactly the clean-run output."""
        import json
        import os as _os
        import subprocess
        import sys

        src, _rows = corpus
        out_crash = str(tmp_path / "crash")
        out_clean = str(tmp_path / "clean")
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(
            __file__)))
        env = dict(_os.environ, RAY_GRAFT_CPUS="4")
        env.pop("RAY_ADDRESS", None)

        def pack(out, resume=False, fail_after=None):
            e = dict(env)
            if fail_after:
                e["GRAFT_WDS_FAIL_AFTER"] = str(fail_after)
            cmd = [sys.executable, "-m",
                   "pyspider_ray.pipelines.wds_write", src, out,
                   "--n-parts", "8"] + (["--resume"] if resume else [])
            return subprocess.run(cmd, cwd=repo, env=e,
                                  capture_output=True, text=True)

        r = pack(out_crash, fail_after=3)
        assert r.returncode != 0 and "injected crash" in r.stderr
        published = [d for d in _os.listdir(out_crash)
                     if d.startswith("part=")]
        assert len(published) == 3          # exactly the first wave
        r2 = pack(out_crash, resume=True)
        assert r2.returncode == 0, r2.stderr
        m = json.loads(r2.stdout.strip().splitlines()[-1])
        assert m["skipped_parts"] == 3 and m["written_parts"] == 5
        r3 = pack(out_clean)
        assert r3.returncode == 0, r3.stderr
        a, b = _read_back(out_crash), _read_back(out_clean)
        assert a[0] == b[0]
        assert [t.to_pydict() for t in a[1]] == \
               [t.to_pydict() for t in b[1]]


class TestWdsWriteInputLineage:
    def test_changed_input_forces_rebuild(self, ray_session, corpus,
                                          tmp_path):
        """Resume against a CHANGED documents.parquet must rebuild all
        partitions (the plan pins the input's size+mtime lineage)."""
        from pyspider_ray.pipelines import wds_write
        src, rows = corpus
        out = str(tmp_path / "out")
        wds_write.run(src, out, n_parts=8)
        # rewrite the input with one extra doc -> new size/mtime
        _write_docs(src, rows + [(999, "z" * 123)])
        m = wds_write.run(src, out, n_parts=8, resume=True)
        assert m["written_parts"] == 8 and m["skipped_parts"] == 0
        assert m["rows_written"] == len(rows) + 1
        # unchanged input still resumes
        m2 = wds_write.run(src, out, n_parts=8, resume=True)
        assert m2["skipped_parts"] == 8 and m2["written_parts"] == 0


class TestReadPacked:
    def test_roundtrip_and_shard_pruning(self, ray_session, corpus,
                                         tmp_path):
        """read_packed must stream back exactly what the packer wrote;
        a shard-range read must equal the full read filtered, while
        opening only the intersecting part directories."""
        from pyspider_ray.pipelines import wds_write
        src, rows = corpus
        out = str(tmp_path / "out")
        m = wds_write.run(src, out, n_parts=8)

        full = wds_write.read_packed(out).to_pandas()
        assert len(full) == m["rows_written"] == len(rows)
        assert sorted(full["doc_id"]) == sorted(i for i, _ in rows)

        lo, hi = 2, 5
        sub = wds_write.read_packed(out, shard_lo=lo,
                                    shard_hi=hi).to_pandas()
        exp = full[(full["shard_id"] >= lo) & (full["shard_id"] < hi)]
        assert sorted(sub["doc_id"]) == sorted(exp["doc_id"])
        assert set(sub.columns) == set(full.columns)

        # column pruning: only the asked-for columns come back
        cols = wds_write.read_packed(out, shard_lo=lo, shard_hi=hi,
                                     columns=["doc_id", "n_chars"])
        got = cols.to_pandas()
        assert list(got.columns) == ["doc_id", "n_chars"]
        assert sorted(got["doc_id"]) == sorted(exp["doc_id"])

    def test_prunes_part_dirs(self, ray_session, corpus, tmp_path,
                              monkeypatch):
        """A narrow shard range must open only the part files whose
        _DONE range intersects (partition-level pruning, not a full
        scan + filter)."""
        import json as _json
        import os as _os

        from pyspider_ray.pipelines import wds_write
        src, rows = corpus
        out = str(tmp_path / "out")
        wds_write.run(src, out, n_parts=8)
        ranges = {}
        for d in sorted(_os.listdir(out)):
            if not d.startswith("part="):
                continue
            with open(_os.path.join(out, d, "_DONE")) as f:
                st = _json.load(f)
            if st["rows"]:
                ranges[d] = st["shards"]
        # pick the first part's own range: only parts overlapping it
        # may be opened
        lo, hi = ranges[sorted(ranges)[0]]
        hi += 1
        expect_open = {d for d, (a, b) in ranges.items()
                       if not (b < lo or a >= hi)}
        opened = []
        import ray.data as rd
        real = rd.read_parquet

        def spy(paths, **kw):
            opened.extend(paths if isinstance(paths, list) else [paths])
            return real(paths, **kw)

        monkeypatch.setattr(rd, "read_parquet", spy)
        wds_write.read_packed(out, shard_lo=lo, shard_hi=hi).count()
        opened_parts = {p.split(_os.sep)[-2] for p in opened}
        assert opened_parts == expect_open
        assert len(opened_parts) < len(ranges)

    def test_incomplete_output_refused(self, ray_session, corpus,
                                       tmp_path):
        import os as _os

        from pyspider_ray.pipelines import wds_write
        src, _ = corpus
        out = str(tmp_path / "out")
        wds_write.run(src, out, n_parts=8)
        _os.remove(_os.path.join(out, "part=0003", "_DONE"))
        with pytest.raises(RuntimeError, match="no _DONE"):
            wds_write.read_packed(out)

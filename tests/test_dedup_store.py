"""dedup_store: the persisted per-bucket cuckoo/digest artifact.

Contract (VERDICT round-4 item 4): two-step refresh == one-shot dedup,
ZERO history re-read on refresh (proved by deleting the history file
after build), atomic versioned publish with hard-linked untouched
buckets, and oracle parity of the artifact path vs the inlined
dedup_incremental query."""

import hashlib
import os

import pytest


def _write_docs(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())})
    pq.write_table(t, path)


def _ds(path):
    import ray.data as rd
    return rd.read_parquet(path, columns=["doc_id", "text"])


def _md5(t: str) -> str:
    return hashlib.md5(t.encode()).hexdigest()


HIST = [(i, f"hist doc {i % 7}") for i in range(20)]      # 7 distinct
BATCH_A = [
    (100, "hist doc 0"),          # dup of history -> dropped
    (101, "fresh alpha"),         # new -> kept
    (102, "fresh alpha"),         # within-batch dup -> first wins 101
    (103, "fresh beta"),          # new -> kept
]
BATCH_B = [
    (200, "hist doc 1"),          # history dup -> dropped
    (201, "fresh alpha"),         # dup of A's survivor -> dropped
    (202, "fresh gamma"),         # new -> kept
    (203, "fresh gamma"),         # within-batch dup -> 202 wins
    (204, "fresh beta"),          # dup of A survivor -> dropped
]


@pytest.mark.usefixtures("ray_session")
class TestDedupStore:
    def test_two_step_refresh_equals_one_shot(self, tmp_path):
        from pyspider_ray.pipelines import dedup_store

        hist_p = str(tmp_path / "hist.parquet")
        a_p = str(tmp_path / "a.parquet")
        b_p = str(tmp_path / "b.parquet")
        _write_docs(hist_p, HIST)
        _write_docs(a_p, BATCH_A)
        _write_docs(b_p, BATCH_B)
        art = str(tmp_path / "artifact")

        m0 = dedup_store.build(_ds(hist_p), art, n_buckets=8)
        assert m0["version"] == 0 and m0["n_keys"] == 7

        # ZERO history re-read: the history file is GONE from here on
        os.remove(hist_p)

        surv_a, m1 = dedup_store.refresh(_ds(a_p), art)
        got_a = {(r["doc_id"], r["content_hash"])
                 for r in surv_a.take_all()}
        assert got_a == {(101, _md5("fresh alpha")),
                         (103, _md5("fresh beta"))}
        assert m1["version"] == 1 and m1["prior_version"] == 0
        assert m1["n_keys"] == 9

        surv_b, m2 = dedup_store.refresh(_ds(b_p), art)
        got_b = {(r["doc_id"], r["content_hash"])
                 for r in surv_b.take_all()}
        assert got_b == {(202, _md5("fresh gamma"))}
        assert m2["version"] == 2 and m2["n_keys"] == 10

        # one-shot mirror: dedup A+B against history in one pass,
        # first-wins by min doc_id — must equal the union of the two
        # incremental steps (A's ids < B's ids, so orders agree)
        hist_texts = {t for _i, t in HIST}
        seen: dict[str, int] = {}
        for i, t in sorted(BATCH_A + BATCH_B):
            if t not in hist_texts and t not in seen:
                seen[t] = i
        one_shot = {(i, _md5(t)) for t, i in seen.items()}
        assert got_a | got_b == one_shot

    def test_no_update_does_not_publish(self, tmp_path):
        from pyspider_ray.pipelines import dedup_store
        hist_p = str(tmp_path / "hist.parquet")
        a_p = str(tmp_path / "a.parquet")
        _write_docs(hist_p, HIST)
        _write_docs(a_p, BATCH_A)
        art = str(tmp_path / "artifact")
        dedup_store.build(_ds(hist_p), art, n_buckets=8)

        surv, m = dedup_store.refresh(_ds(a_p), art, update=False)
        assert len(surv.take_all()) == 2
        assert dedup_store._latest_version(art) == 0
        assert m["version"] == 0            # prior manifest unchanged

        # a second identical refresh sees the SAME artifact state
        surv2, _ = dedup_store.refresh(_ds(a_p), art, update=False)
        assert len(surv2.take_all()) == 2

    def test_untouched_buckets_hard_link(self, tmp_path):
        from pyspider_ray.pipelines import dedup_store
        hist_p = str(tmp_path / "hist.parquet")
        a_p = str(tmp_path / "a.parquet")
        _write_docs(hist_p, [(i, f"doc {i}") for i in range(64)])
        _write_docs(a_p, [(100, "doc 0"), (101, "brand new")])
        art = str(tmp_path / "artifact")
        dedup_store.build(_ds(hist_p), art, n_buckets=16)
        dedup_store.refresh(_ds(a_p), art)

        v0 = dedup_store._version_dir(art, 0)
        v1 = dedup_store._version_dir(art, 1)
        linked = rewritten = 0
        for name in os.listdir(v1):
            if not name.endswith(".parquet"):
                continue
            p0, p1 = os.path.join(v0, name), os.path.join(v1, name)
            if os.path.exists(p0) and os.path.samefile(p0, p1):
                linked += 1
            else:
                rewritten += 1
        assert rewritten >= 1            # the survivor's bucket
        assert linked >= 10              # the rest carried forward

    def test_artifact_query_matches_inlined(self):
        """The oracle-graded q_dedup_incremental_artifact equals
        q_dedup_incremental row-for-row at sf0.001."""
        import pandas as pd

        from pyspider_ray import training_queries as tq
        sf = "/root/testdata/sf0.001"
        a = (tq.q_dedup_incremental(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (tq.q_dedup_incremental_artifact(sf).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b, check_dtype=True)
        assert len(a) > 0

    def test_cli_round_trip(self, tmp_path):
        import json

        from pyspider_ray.pipelines import dedup_store
        hist_p = str(tmp_path / "hist.parquet")
        a_p = str(tmp_path / "a.parquet")
        _write_docs(hist_p, HIST)
        _write_docs(a_p, BATCH_A)
        art = str(tmp_path / "artifact")
        out = str(tmp_path / "survivors")

        assert dedup_store.main(["build", "--docs", hist_p,
                                 "--artifact", art,
                                 "--buckets", "8"]) == 0
        assert dedup_store.main(["refresh", "--docs", a_p,
                                 "--artifact", art,
                                 "--out", out]) == 0
        import pyarrow.parquet as pq
        got = pq.read_table(out).to_pydict()
        assert sorted(got["doc_id"]) == [101, 103]
        with open(os.path.join(dedup_store._version_dir(art, 1),
                               "manifest.json")) as f:
            assert json.load(f)["n_keys"] == 9


@pytest.mark.usefixtures("ray_session")
class TestCrashRecovery:
    def test_orphan_version_dir_does_not_wedge(self, tmp_path):
        """Crash window: version N+1's dir was renamed into place but
        LATEST never flipped.  The retry re-targets N+1 and must
        succeed (os.replace onto a non-empty dir raises ENOTEMPTY
        without the orphan cleanup)."""
        from pyspider_ray.pipelines import dedup_store as ds_mod
        hist = tmp_path / "hist.parquet"
        _write_docs(str(hist), HIST)
        art = str(tmp_path / "art")
        ds_mod.build(_ds(str(hist)), art)
        # simulate the orphan: a fully-written version=00001 dir with
        # no LATEST flip
        orphan = os.path.join(art, "version=00001")
        os.makedirs(orphan)
        open(os.path.join(orphan, "junk.bin"), "w").write("stale")
        batch = tmp_path / "a.parquet"
        _write_docs(str(batch), BATCH_A)
        surv, manifest = ds_mod.refresh(_ds(str(batch)), art)
        assert manifest["version"] == 1
        assert open(os.path.join(art, "LATEST")).read() == "1"
        assert not os.path.exists(os.path.join(orphan, "junk.bin"))

    def test_stale_tmp_dir_does_not_wedge(self, tmp_path):
        """Crash window: a refresh died after hard-linking some
        buckets into version=00001.tmp.  The retry must start clean
        instead of raising FileExistsError on the carry-forward."""
        from pyspider_ray.pipelines import dedup_store as ds_mod
        hist = tmp_path / "hist.parquet"
        _write_docs(str(hist), HIST)
        art = str(tmp_path / "art")
        ds_mod.build(_ds(str(hist)), art)
        stale = os.path.join(art, "version=00001.tmp")
        os.makedirs(stale)
        # a bucket file the crashed run had already linked
        import shutil as sh
        v0 = os.path.join(art, "version=00000")
        for f in os.listdir(v0):
            if f.startswith("bucket="):
                sh.copy(os.path.join(v0, f), os.path.join(stale, f))
                break
        batch = tmp_path / "a.parquet"
        _write_docs(str(batch), BATCH_A)
        surv, manifest = ds_mod.refresh(_ds(str(batch)), art)
        assert manifest["version"] == 1

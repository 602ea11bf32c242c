"""bpe_train: the distributed per-round fallback must equal the
driver-side textbook loop exactly, and the merges on a hand-traced
corpus must match the classic BPE walkthrough."""

import os

import pytest


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
class TestBpeTrain:
    def test_hand_traced_merges(self, tmp_path):
        """Sennrich's walkthrough shape: {low x5, lowest x2, newer x6,
        wider x3}.  Heaviest first pair is e+r</w> (weight 9)."""
        from pyspider_ray import training_queries as tq
        rows = [(1, " ".join(["low"] * 5 + ["lowest"] * 2)),
                (2, " ".join(["newer"] * 6 + ["wider"] * 3))]
        _write_docs(tmp_path, rows)
        t = tq.q_bpe_train(str(tmp_path))
        merges = list(zip(t["left"].to_pylist(), t["right"].to_pylist(),
                          t["weight"].to_pylist()))
        # (e,r) and (r,</w>) both weigh 9 (newer x6 + wider x3); the
        # tie breaks to the lexicographically smaller (e,r)
        assert merges[0] == ("e", "r", 9)
        assert merges[1] == ("er", "</w>", 9)
        assert ("l", "o") in [(m[0], m[1]) for m in merges]  # low x7
        assert t["rank"].to_pylist() == list(range(len(merges)))

    def test_distributed_fallback_equals_driver(self, tmp_path,
                                                monkeypatch):
        from pyspider_ray import training_queries as tq
        rows = [(1, "low low low lowest lowest"),
                (2, "newer newer newer wider wider widest"),
                (3, "new news newest lower")]
        _write_docs(tmp_path, rows)
        driver = tq.q_bpe_train(str(tmp_path)).to_pandas()
        monkeypatch.setattr(tq, "_BPE_MAX_VOCAB", 0)
        dist = tq.q_bpe_train(str(tmp_path)).to_pandas()
        assert dist.equals(driver)
        assert len(driver) == tq._BPE_MERGES

    def test_fewer_pairs_than_merges_stops_early(self, tmp_path):
        from pyspider_ray import training_queries as tq
        d = tmp_path / "tiny"
        d.mkdir()
        _write_docs(d, [(1, "ab ab")])
        t = tq.q_bpe_train(str(d))
        # round 0 merges (a,b), round 1 merges (ab,</w>), round 2 has
        # no pairs left: exactly 2 merges, not 8
        assert len(t) == 2

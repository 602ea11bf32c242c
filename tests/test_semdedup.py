"""semdedup: the distributed pipeline (Lloyd train -> broadcast assign
-> cluster-partitioned greedy pass) must equal a pure-numpy driver-side
mirror of the paper's algorithm on the real sf0.001 table, and the
greedy kernel's hand cases must hold."""

import numpy as np
import pyarrow as pa
import pytest


def _mirror(sf_dir, C, tau):
    """Independent replay: assign every vector to argmax cosine
    centroid, then per cluster greedily keep farthest-from-centroid
    first (ties on vec_id), dropping anything within tau of a kept
    member."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    E = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    Cm = np.asarray(C)
    assign = np.argmax(En @ Cm.T, axis=1)
    keep = {}
    for c in np.unique(assign):
        m = assign == c
        cids, cE = ids[m], En[m]
        cen = cE @ Cm[c]
        order = np.lexsort((cids, cen))
        kept_idx = []
        for i in order:
            if not kept_idx or \
                    max(float(cE[j] @ cE[i]) for j in kept_idx) <= tau:
                kept_idx.append(i)
        kept_set = set(kept_idx)
        for pos, vid in enumerate(cids):
            keep[int(vid)] = (int(c), 1 if pos in kept_set else 0)
    return keep


@pytest.mark.usefixtures("ray_session")
class TestSemDedup:
    def test_matches_numpy_mirror_on_sf0001(self):
        from pyspider_ray import training_queries as tq
        sf = "/root/testdata/sf0.001"
        df = tq.q_semdedup(sf).to_pandas()
        ds = tq._read(sf, "embeddings", ["vec_id", "embedding"])
        C = tq._kmeans_centroids(sf, ds, tq._SEMDEDUP_K, 5)

        expected = _mirror(sf, C, tq._SEMDEDUP_TAU)
        assert len(df) == len(expected)
        for r in df.itertuples():
            c, k = expected[int(r.vec_id)]
            assert (r.cluster, r.keep) == (c, k), r.vec_id
        # the threshold actually fires on this geometry
        assert 0 < df.keep.sum() < len(df)

    def test_greedy_kernel_hand_case(self):
        """Three coplanar vectors: a and b nearly parallel (dup), c
        orthogonal.  The member farthest from the centroid is kept
        first; its near-parallel twin drops."""
        from pyspider_ray import training_queries as tq
        v = np.array([[1.0, 0.0], [0.999, 0.0447], [0.0, 1.0]])
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        g = pa.table({
            "vec_id": pa.array([10, 11, 12], pa.int64()),
            "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
            "cluster": pa.array([0, 0, 0], pa.int64())})
        cen = np.array([[1.0, 0.0]])
        out = tq._semdedup_group(g, cen.tolist(), tau=0.9).to_pandas()
        by_id = {int(r.vec_id): int(r.keep) for r in out.itertuples()}
        # c (vec 12) farthest from centroid -> kept first; then b (11,
        # cen_sim lower than a's) kept; a (10) is within tau of b ->
        # dropped
        assert by_id == {10: 0, 11: 1, 12: 1}

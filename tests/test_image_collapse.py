"""image_phash_collapse: every lossy re-encode must collapse onto its
clean original through the pair graph -> components -> membership
filter composition; no clean original may be lost."""

import pytest


@pytest.mark.usefixtures("ray_session")
class TestImagePhashCollapse:
    def test_lossy_twins_collapse_onto_originals(self):
        from pyspider_ray import training_queries as tq
        survivors = set(
            tq.q_image_phash_collapse(None).to_pandas()["image_id"])
        # all 100 clean originals survive, no lossy copy does
        assert survivors == {f"img-{i:012d}" for i in range(100)}

    def test_pair_graph_contains_every_twin_edge(self):
        from pyspider_ray import training_queries as tq
        df = tq.q_image_phash_near_dup(None).to_pandas()
        pairs = set(zip(df.image_a, df.image_b))
        both = pairs | {(b, a) for a, b in pairs}
        for i in range(100):
            assert (f"img-{i:012d}", f"img-{i:012d}:lossy") in both, i

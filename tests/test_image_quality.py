"""image_quality_stats: actor-pool exposure gate pinned by a
driver-side kernel mirror over the same planted-degenerate corpus
(dark / blown-out / flat images must be flagged, clean ones kept)."""

import numpy as np


def _mirror_stats(data):
    from pyspider_ray.functions.imaging import decode_image
    px = decode_image(data).astype(np.int64)
    l3 = px.sum(axis=2)
    m = int(l3.sum()) // l3.size
    s = int(l3.max() - l3.min())
    reason = (m < 180) * 1 + (m > 570) * 2 + (s < 60) * 4
    return m, s, reason


class TestImageQualityStats:
    def test_matches_kernel_mirror(self, ray_session, sf_dir):
        from pyspider_ray.training_queries import (_image_quality_rows,
                                                   q_image_quality_stats)
        got = (q_image_quality_stats(sf_dir).to_pandas()
               .set_index("image_id"))
        rows = _image_quality_rows()
        assert len(got) == len(rows)
        for r in rows:
            m, s, reason = _mirror_stats(r["bytes"])
            row = got.loc[r["image_id"]]
            assert (int(row["lum_mean3"]), int(row["lum_spread3"]),
                    int(row["reason"]), int(row["keep"])) == (
                m, s, reason, int(reason == 0)), r["image_id"]

    def test_planted_degenerates_are_flagged(self, ray_session, sf_dir):
        """Every planted dark/bright/flat image draws its bit; every
        untouched image passes (the thresholds sit far outside the
        clean corpus's 376-386 mean / 673-745 spread band)."""
        from pyspider_ray.training_queries import q_image_quality_stats
        got = (q_image_quality_stats(sf_dir).to_pandas()
               .set_index("image_id"))
        n_dark = n_bright = n_flat = 0
        for i in range(300):
            img_id = f"img-{i:012d}"
            reason = int(got.loc[img_id]["reason"])
            if i % 11 == 5:
                assert reason & 1, i
                n_dark += 1
            elif i % 13 == 7:
                assert reason & 2, i
                n_bright += 1
            elif i % 17 == 9:
                assert reason & 4, i
                n_flat += 1
            else:
                assert reason == 0, (i, reason)
        assert n_dark and n_bright and n_flat

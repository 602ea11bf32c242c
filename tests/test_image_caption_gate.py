"""image_caption_gate: the Ray pipeline must equal an independent
driver-side mirror of the LAION-style gates + phash exact-image dedup,
and the hand-checkable cases must hold."""

import pytest


def _mirror_expected():
    """Pure-Python re-derivation of the gate + dedup, written
    independently of the pipeline code paths (dict/sort based)."""
    from pyspider_ray.training_queries import (
        _IMG_ASPECT_MAX, _IMG_MIN_CAPTION_TOKENS, _IMG_MIN_SIDE,
        _image_caption_rows)
    rows = _image_caption_rows()
    out = {}
    for r in rows:
        ntok = len(r["caption"].split())
        lo, hi = min(r["w"], r["h"]), max(r["w"], r["h"])
        reason = 0
        if lo < _IMG_MIN_SIDE:
            reason |= 1
        if hi > _IMG_ASPECT_MAX * lo:
            reason |= 2
        if ntok < _IMG_MIN_CAPTION_TOKENS:
            reason |= 4
        out[r["image_id"]] = {"w": r["w"], "h": r["h"],
                              "n_caption_tokens": ntok,
                              "reason": reason, "phash": r["phash"]}
    by_phash = {}
    for iid, v in out.items():
        if v["reason"] == 0:
            by_phash.setdefault(v["phash"], []).append(iid)
    for members in by_phash.values():
        for loser in sorted(members)[1:]:
            out[loser]["reason"] |= 8
    for v in out.values():
        v["keep"] = 1 if v["reason"] == 0 else 0
        del v["phash"]
    return out


@pytest.mark.usefixtures("ray_session")
class TestImageCaptionGate:
    @pytest.fixture(scope="class")
    def result(self):
        from pyspider_ray.training_queries import q_image_caption_gate
        df = q_image_caption_gate(None).to_pandas()
        return {r.image_id: r for r in df.itertuples()}

    def test_matches_independent_mirror(self, result):
        expected = _mirror_expected()
        assert set(result) == set(expected)
        for iid, e in expected.items():
            r = result[iid]
            got = (r.w, r.h, r.n_caption_tokens, r.keep, r.reason)
            want = (e["w"], e["h"], e["n_caption_tokens"], e["keep"],
                    e["reason"])
            assert got == want, (iid, got, want)

    def test_hand_cases(self, result):
        # id 0: w=32 (too small) AND empty caption
        assert result["img-000000000000"].reason == 1 | 4
        assert result["img-000000000000"].n_caption_tokens == 0
        # id 17: caption truncated to 3 tokens, dims 64x80 pass
        assert result["img-000000000017"].reason == 4
        # id 3 (80x80, clean caption) survives; its re-crawl twin is
        # the duplicate-image loser
        assert result["img-000000000003"].keep == 1
        assert result["img-000000000003-b"].reason == 8
        # some gate-rejected twin pairs exist where NEITHER is marked
        # dup (dedup runs on survivors only)
        assert result["img-000000000010"].reason & 8 == 0

    def test_keep_counts_are_plausible(self, result):
        keep = sum(r.keep for r in result.values())
        dup_losers = sum(1 for r in result.values() if r.reason & 8)
        assert 0 < keep < len(result)
        assert dup_losers > 0

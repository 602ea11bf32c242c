"""image_curate — the multimodal curation composition: every verdict
(exposure bits, metadata bits, exact-dup bit, bucket/batch/slot) must
match an independent pure-Python mirror over the same synthetic table,
and the pack structure must be dense per (bucket, batch)."""

import hashlib

import numpy as np
import pytest


def _mirror(rows):
    from pyspider_ray.functions.imaging import decode_image
    from pyspider_ray import training_queries as tq

    out = {}
    for r in rows:
        px = decode_image(r["bytes"]).astype(np.int64)
        l3 = px.sum(axis=2)
        m = int(l3.sum()) // l3.size
        s = int(l3.max() - l3.min())
        reason = ((m < tq._IMGQ_DARK_MAX) * 16
                  + (m > tq._IMGQ_BRIGHT_MIN) * 32
                  + (s < tq._IMGQ_SPREAD_MIN) * 64)
        cap = r["caption"].strip()
        ntok = 0 if not cap else len(cap.split())
        lo, hi = sorted((r["w"], r["h"]))
        reason += ((lo < tq._IMG_MIN_SIDE) * 1
                   + (hi > tq._IMG_ASPECT_MAX * lo) * 2
                   + (ntok < tq._IMG_MIN_CAPTION_TOKENS) * 4)
        digest = int.from_bytes(
            hashlib.md5(r["bytes"]).digest()[:8], "big") >> 1
        out[r["image_id"]] = {"reason": reason, "digest": digest,
                              "w": r["w"], "h": r["h"]}
    # exact-dup collapse: per digest, all clean rows but the smallest
    # image_id get bit 8
    by_digest = {}
    for iid, v in out.items():
        by_digest.setdefault(v["digest"], []).append(iid)
    for ids in by_digest.values():
        clean = sorted(i for i in ids if out[i]["reason"] == 0)
        for i in clean[1:]:
            out[i]["reason"] |= 8
    # bucket assignment + packing for survivors
    wb = np.array([x[0] for x in tq._ASPECT_BUCKETS], dtype=np.int64)
    hb = np.array([x[1] for x in tq._ASPECT_BUCKETS], dtype=np.int64)
    scale = tq._ASPECT_LCM // hb
    buckets = {}
    for iid, v in out.items():
        if v["reason"] != 0:
            v.update(bucket=-1, batch_idx=-1, slot=-1)
            continue
        cost = np.abs(v["w"] * hb - v["h"] * wb) * scale
        b = int(np.argmin(cost))
        v["bucket"] = b
        buckets.setdefault(b, []).append(iid)
    for b, ids in buckets.items():
        for pos, iid in enumerate(sorted(ids)):
            out[iid]["batch_idx"] = pos // tq._ASPECT_BATCH
            out[iid]["slot"] = pos % tq._ASPECT_BATCH
    return out


class TestImageCurate:
    def test_matches_mirror(self, ray_session, monkeypatch):
        monkeypatch.setenv("GRAFT_IMG_ROWS", "90")
        from pyspider_ray import training_queries as tq
        rows = tq._image_caption_rows()
        exp = _mirror(rows)
        got = {r["image_id"]: r
               for r in tq.q_image_curate("unused").take_all()}
        assert set(got) == set(exp)
        for iid, e in exp.items():
            g = got[iid]
            assert g["reason"] == e["reason"], iid
            assert g["keep"] == int(e["reason"] == 0), iid
            assert g["bucket"] == e["bucket"], iid
            assert g["batch_idx"] == e["batch_idx"], iid
            assert g["slot"] == e["slot"], iid
        # the composition is non-vacuous: drops from BOTH gate families
        reasons = [e["reason"] for e in exp.values()]
        assert any(r == 0 for r in reasons)
        assert any(r & 4 for r in reasons)      # caption gate fired
        assert any(r & 8 for r in reasons)      # planted dup collapsed

    def test_pack_is_dense_per_bucket(self, ray_session, monkeypatch):
        monkeypatch.setenv("GRAFT_IMG_ROWS", "90")
        from pyspider_ray import training_queries as tq
        kept = [r for r in tq.q_image_curate("unused").take_all()
                if r["keep"]]
        by_bucket = {}
        for r in kept:
            by_bucket.setdefault(r["bucket"], []).append(
                (r["batch_idx"], r["slot"]))
        for b, pairs in by_bucket.items():
            pos = sorted(p[0] * tq._ASPECT_BATCH + p[1] for p in pairs)
            assert pos == list(range(len(pairs)))   # dense 0..n-1

"""Multimodal codec + feature kernels (functions/media.py) and the
winnowing fingerprint kernel — deterministic round-trips and the
properties the pipeline stages rely on."""

import numpy as np
import pytest

from pyspider_ray.functions.media import (audio_decode, audio_features,
                                          sample_frames, synth_audio,
                                          synth_video, video_decode)


class TestAudio:
    def test_roundtrip_deterministic(self):
        a1 = synth_audio(7)
        a2 = synth_audio(7)
        assert a1 == a2
        sr, samples = audio_decode(a1)
        assert sr == 8000 and len(samples) == 8000
        assert np.abs(samples).max() <= 1.0

    def test_features_sane(self):
        sr, samples = audio_decode(synth_audio(3))
        f = audio_features(samples, sr)
        assert f["n_samples"] == 8000
        assert 0 < f["rms_milli"] < 1000
        assert f["zero_crossings"] > 100       # two sine components
        assert f["n_frames"] == 8000 // 200    # 25 ms @ 8 kHz

    def test_bad_payload_raises(self):
        with pytest.raises(ValueError):
            audio_decode(b"not audio")


class TestAudioFingerprint:
    """Haitsma-Kalker fingerprint kernel properties + the distributed
    near-dup query over it."""

    def _ham(self, a, b):
        return bin(a ^ b).count("1")

    def test_gain_invariant_and_noise_robust(self):
        from pyspider_ray.functions.media import (audio_fingerprint64,
                                                  perturb_audio)
        for seed in range(20):
            _, s = audio_decode(synth_audio(seed))
            fp = audio_fingerprint64(s)
            # pure gain change: energy DIFFERENCES scale -> identical
            assert audio_fingerprint64(s * 0.5) == fp
            # re-mastered twin stays within the verify threshold
            assert self._ham(
                audio_fingerprint64(perturb_audio(s, seed)), fp) <= 10

    def test_distinct_clips_separate(self):
        from pyspider_ray.functions.media import audio_fingerprint64
        fps = []
        for seed in range(30):
            _, s = audio_decode(synth_audio(seed))
            fps.append(audio_fingerprint64(s))
        dists = [self._ham(fps[i], fps[j])
                 for i in range(30) for j in range(i + 1, 30)]
        assert min(dists) > 10

    def test_encode_roundtrip(self):
        from pyspider_ray.functions.media import audio_encode
        sr, s = audio_decode(synth_audio(11))
        sr2, s2 = audio_decode(audio_encode(s, sr))
        assert sr2 == sr
        assert np.abs(s2 - s).max() < 1e-4    # int16 quantization only

    def test_degenerate_clip_lengths_return_zero(self):
        # lengths 9-17 give frame == 1 -> single-bin rfft spectrum;
        # the guard must return 0 rather than crash in reduceat
        from pyspider_ray.functions.media import audio_fingerprint64
        for n in [0, 1, 5, 8, 9, 12, 17]:
            s = np.sin(np.arange(n, dtype=np.float64))
            assert audio_fingerprint64(s) == 0
        # first non-degenerate length still produces a real fingerprint
        assert audio_fingerprint64(
            np.sin(np.arange(100, dtype=np.float64))) != 0

    @pytest.mark.usefixtures("ray_session")
    def test_near_dup_query_finds_exactly_the_twins(self, sf_dir):
        from pyspider_ray import training_queries as tq
        df = tq.QUERIES["audio_fp_near_dup"](sf_dir).to_pandas()
        got = sorted(map(tuple, df[["clip_a", "clip_b"]].values))
        exp = sorted((f"aud-{i:06d}", f"aud-{i:06d}:alt")
                     for i in range(0, 100, 3))
        assert got == exp


class TestVideoFingerprint:
    def _ham(self, a, b):
        return bin(a ^ b).count("1")

    def test_brightness_invariant_and_noise_robust(self):
        from pyspider_ray.functions.media import (perturb_video,
                                                  video_fingerprint64)
        for seed in range(20):
            fr = video_decode(synth_video(seed))
            fp = video_fingerprint64(fr)
            # constant brightness shift cancels in the double difference
            # (halve first so +20 never clips — a clip is NOT a shift)
            base = (fr // 2).astype(np.uint8)
            assert (video_fingerprint64(base + 20)
                    == video_fingerprint64(base))
            assert self._ham(
                video_fingerprint64(perturb_video(fr, seed)), fp) <= 10

    def test_distinct_clips_separate(self):
        from pyspider_ray.functions.media import video_fingerprint64
        fps = [video_fingerprint64(video_decode(synth_video(s)))
               for s in range(30)]
        dists = [self._ham(fps[i], fps[j])
                 for i in range(30) for j in range(i + 1, 30)]
        assert min(dists) > 10

    def test_encode_roundtrip_and_degenerate_clip(self):
        from pyspider_ray.functions.media import (video_encode,
                                                  video_fingerprint64)
        fr = video_decode(synth_video(5))
        assert (video_decode(video_encode(fr)) == fr).all()
        assert video_fingerprint64(fr[:4]) == 0   # < 9 frames: honest 0

    @pytest.mark.usefixtures("ray_session")
    def test_near_dup_query_finds_exactly_the_twins(self, sf_dir):
        from pyspider_ray import training_queries as tq
        df = tq.QUERIES["video_fp_near_dup"](sf_dir).to_pandas()
        got = sorted(map(tuple, df[["clip_a", "clip_b"]].values))
        exp = sorted((f"vid-{i:06d}", f"vid-{i:06d}:alt")
                     for i in range(0, 100, 3))
        assert got == exp


class TestVideo:
    def test_roundtrip_and_sampling(self):
        clip = synth_video(5, w=32, h=24, n_frames=16)
        frames = video_decode(clip)
        assert frames.shape == (16, 24, 32)
        sampled = sample_frames(frames, every=4)
        assert sampled.shape == (4, 24, 32)
        assert np.array_equal(sampled[0], frames[0])
        assert np.array_equal(sampled[1], frames[4])

    def test_frames_differ(self):
        frames = video_decode(synth_video(5))
        assert not np.array_equal(frames[0], frames[1])


class TestWinnowing:
    def test_shared_fingerprints_for_overlapping_docs(self):
        """Docs sharing a long substring share winnowing fingerprints;
        disjoint docs don't (the property near-dup detection uses)."""
        from pyspider_ray.training_queries import _word_hashes
        B = np.uint64(1_000_003)

        def fps(text):
            wh = _word_hashes(text.split())
            g = (wh[:-3] * B**np.uint64(3) + wh[1:-2] * B**np.uint64(2)
                 + wh[2:-1] * B + wh[3:])
            w = np.lib.stride_tricks.sliding_window_view(g, 5)
            return set(np.unique(w.min(axis=1)).tolist())

        core = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        a = fps("start one two " + core + " tail x y")
        b = fps("completely different prefix words " + core)
        c = fps("unrelated content with nothing in common at all here ok")
        assert a & b                      # shared region → shared prints
        assert not (a & c)


@pytest.mark.usefixtures("ray_session")
class TestImageResizeQuery:
    def test_actor_pool_resize_matches_local_kernel(self, sf_dir):
        """q_image_resize end-to-end: 200 synthetic pages through the
        actor-pool decode→bilinear→re-encode stage; spot rows must
        equal a driver-side decode+resize of the same payload."""
        from pyspider_ray.functions.imaging import (decode_image,
                                                    resize_bilinear)
        from pyspider_ray.functions.synthweb import page_payload
        from pyspider_ray.training_queries import q_image_resize
        df = q_image_resize(sf_dir).to_pandas()
        assert len(df) == 200
        assert df["image_id"].is_unique
        assert (df["w_in"] > 0).all() and (df["h_in"] > 0).all()
        assert df["resized_mean"].between(0, 255).all()
        by_id = df.set_index("image_id")
        for i in (0, 17, 199):
            r = page_payload(i)
            px = decode_image(r["bytes"])
            small = resize_bilinear(px, 64, 64)
            row = by_id.loc[r["image_id"]]
            assert (row["h_in"], row["w_in"]) == px.shape[:2]
            assert row["resized_mean"] == int(round(float(small.mean())))

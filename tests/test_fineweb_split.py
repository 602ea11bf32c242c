"""fineweb_filter / dataset_split / image_aspect_buckets: each pinned
by an independent pure-Python mirror (no shared kernels with
training_queries — the mirrors re-derive every gate from the paper
definitions with plain str/Counter/Fraction arithmetic); oracle parity
for the two SQL-backed ops additionally runs in the sweep."""

import hashlib
import re
from collections import Counter
from fractions import Fraction

import pytest

LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is"},
    "es": {"el", "la", "de", "que", "los"},
    "de": {"der", "die", "und", "das", "ist"},
    "fr": {"le", "la", "et", "les", "des"},
}
STOP = ("the", "a", "of", "to", "and", "in", "is")


def _fineweb_mirror(doc_id, text):
    """Plain-Python re-derivation of the four gate bits."""
    t = text.strip()
    ws_re = re.split(r"\s+", t)
    n_tok = len(ws_re)
    n_stop = sum(w in STOP for w in ws_re)
    n_alpha = len(re.findall(r"[A-Za-z]", t))
    q_ok = n_stop * 10 < n_tok * 9 and n_alpha * 2 > len(t)

    ws = text.split()
    wset = set(ws)
    votes = {l: len(wset & m) for l, m in LANG_MARKERS.items()}
    best = max(sorted(votes), key=lambda l: votes[l])
    l_ok = votes[best] > 0 and best == "en"

    n_distinct = len(set(ws))
    grams = Counter(zip(ws, ws[1:]))
    top = max(grams.values()) if grams else 0
    n2 = max(len(ws) - 1, 0)
    g_ok = n_distinct * 10 >= len(ws) * 3 and (n2 == 0 or top * 5 <= n2)

    len_ok = 20 <= n_tok <= 90
    reason = ((not q_ok) * 1 + (not l_ok) * 2 + (not g_ok) * 4
              + (not len_ok) * 8)
    return {"doc_id": doc_id, "n_tokens": n_tok, "reason": reason,
            "keep": int(reason == 0)}


class TestFinewebFilter:
    def test_matches_mirror_on_real_table(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        from pyspider_ray.training_queries import q_fineweb_filter
        got = (q_fineweb_filter(sf_dir).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).to_pylist()
        want = sorted((_fineweb_mirror(d["doc_id"], d["text"])
                       for d in docs), key=lambda r: r["doc_id"])
        assert len(got) == len(want)
        for i, w in enumerate(want):
            row = got.iloc[i]
            assert (int(row["doc_id"]), int(row["n_tokens"]),
                    int(row["reason"]), int(row["keep"])) == (
                w["doc_id"], w["n_tokens"], w["reason"], w["keep"])

    def test_every_gate_fires(self, ray_session, sf_dir):
        """The corpus exercises all four bits (else the composition
        test would be vacuous)."""
        from pyspider_ray.training_queries import q_fineweb_filter
        df = q_fineweb_filter(sf_dir).to_pandas()
        fired = 0
        for bit in (1, 2, 4, 8):
            if ((df["reason"].to_numpy() & bit) > 0).any():
                fired += 1
        assert fired >= 3          # quality/lang/length all fire at sf0.001
        assert (df["keep"] == 1).any()


class TestDatasetSplit:
    def test_matches_md5_mirror(self, ray_session, sf_dir):
        import pyarrow.parquet as pq

        from pyspider_ray.training_queries import q_dataset_split
        got = (q_dataset_split(sf_dir).to_pandas()
               .set_index("doc_id").sort_index())
        docs = pq.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]).to_pylist()
        for d in docs:
            b = int(hashlib.md5(d["text"].encode()).hexdigest()[:8],
                    16) % 100
            split = 2 if b == 99 else (1 if b == 98 else 0)
            row = got.loc[d["doc_id"]]
            assert int(row["bucket"]) == b
            assert int(row["split"]) == split

    def test_content_stability(self, ray_session, tmp_path):
        """Byte-identical texts always land in the same split — the
        no-leak-across-the-boundary property — on a crafted corpus
        with planted duplicates (sf0.001 has no exact dups)."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspider_ray.training_queries import q_dataset_split
        texts = [f"doc body number {i % 40}" for i in range(120)]
        t = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                      "text": pa.array(texts, pa.string())})
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        got = q_dataset_split(str(tmp_path)).to_pandas()
        j = pd.merge(pd.DataFrame({"doc_id": range(120), "text": texts}),
                     got, on="doc_id")
        per_text = j.groupby("text").agg(
            n=("doc_id", "count"), n_splits=("split", "nunique"),
            n_buckets=("bucket", "nunique"))
        assert (per_text["n"] == 3).all()          # every text planted 3x
        assert (per_text["n_splits"] == 1).all()
        assert (per_text["n_buckets"] == 1).all()


class TestAspectBuckets:
    @staticmethod
    def _mirror_rows():
        from pyspider_ray.training_queries import (_ASPECT_BATCH,
                                                   _ASPECT_BUCKETS,
                                                   _image_caption_rows)
        assign = {}
        for r in _image_caption_rows():
            aspect = Fraction(r["w"], r["h"])
            costs = [(abs(aspect - Fraction(wb, hb)), k)
                     for k, (wb, hb) in enumerate(_ASPECT_BUCKETS)]
            assign[r["image_id"]] = min(costs)[1]
        out = {}
        for k in range(len(_ASPECT_BUCKETS)):
            members = sorted(i for i, b in assign.items() if b == k)
            for pos, img in enumerate(members):
                out[img] = (k, pos // _ASPECT_BATCH, pos % _ASPECT_BATCH)
        return out

    def test_matches_fraction_mirror(self, ray_session, sf_dir):
        from pyspider_ray.training_queries import q_image_aspect_buckets
        got = q_image_aspect_buckets(sf_dir).to_pandas()
        want = self._mirror_rows()
        assert len(got) == len(want)
        for _, row in got.iterrows():
            assert (int(row["bucket"]), int(row["batch_idx"]),
                    int(row["slot"])) == want[row["image_id"]], \
                row["image_id"]

    def test_batches_are_shaped(self, ray_session, sf_dir):
        """Within a bucket every batch but the last is full, and slots
        are a clean 0..n-1 enumeration in image_id order."""
        from pyspider_ray.training_queries import (_ASPECT_BATCH,
                                                   q_image_aspect_buckets)
        df = q_image_aspect_buckets(sf_dir).to_pandas()
        assert df["bucket"].nunique() >= 3     # buckets actually spread
        for b, g in df.groupby("bucket"):
            g = g.sort_values(["batch_idx", "slot"])
            assert list(g["slot"]) == [
                i % _ASPECT_BATCH for i in range(len(g))]
            assert list(g["image_id"]) == sorted(g["image_id"])
            sizes = g.groupby("batch_idx").size()
            assert (sizes.iloc[:-1] == _ASPECT_BATCH).all()

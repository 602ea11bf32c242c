"""Round-5 tail operators: char_class_stats / intra_doc_line_dedup
must equal independent pure-Python mirrors of their documented specs
on crafted corpora (planted digits/unicode, planted within-doc
repeated lines); image_exact_dedup must collapse every planted
byte-identical "-b" re-crawl onto its original and keep everything
else.  The oracle-green sweep pins the real tables; these pin the
edge semantics the synthetic tables may not exercise."""

import os
import string

import pytest


def _write_docs(dirpath, rows):
    """rows: (doc_id, text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array(["s0"] * len(rows)),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64())})
    pq.write_table(t, os.path.join(dirpath, "documents.parquet"))


_PUNCT = set(string.punctuation)


def _char_mirror(doc_id, text):
    n_chars = len(text)
    n_digit = sum(c in "0123456789" for c in text)
    n_upper = sum("A" <= c <= "Z" for c in text)
    n_punct = sum(c in _PUNCT for c in text)
    n_space = sum(c in " \t\n\r" for c in text)
    keep = int(n_digit * 5 <= n_chars and n_upper * 4 <= n_chars
               and n_punct * 5 <= n_chars)
    return (doc_id, n_chars, n_digit, n_upper, n_punct, n_space, keep)


class TestCharClassStats:
    def test_mirror_and_ascii_only_classes(self, ray_session, tmp_path):
        rows = [
            (1, "Hello World 123!"),
            (2, "Héllo Über straße"),   # unicode: é Ü ß
            (3, "12345 67890 11111"),                  # digit-heavy: drop
            (4, "SHOUTING ALL THE TIME HERE"),         # upper-heavy: drop
            (5, "!!! ??? ,,, ;;; ..."),                # punct-heavy: drop
            (6, ""),                                   # empty doc
            (7, "a\tb\nc\rd e"),                       # every space class
            (8, "plain lower case words only here"),
        ]
        _write_docs(tmp_path, rows)
        from pyspider_ray.training_queries import q_char_class_stats
        got = {r["doc_id"]: (r["doc_id"], r["n_chars_obs"], r["n_digit"],
                             r["n_upper"], r["n_punct"], r["n_space"],
                             r["keep"])
               for r in q_char_class_stats(str(tmp_path)).take_all()}
        assert len(got) == len(rows)
        for doc_id, text in rows:
            assert got[doc_id] == _char_mirror(doc_id, text), text
        # the planted heavy docs must actually draw their gate
        assert got[3][-1] == 0 and got[4][-1] == 0 and got[5][-1] == 0
        assert got[1][-1] == 1 and got[8][-1] == 1
        # unicode letters are NOT [A-Z] (ASCII classes on both engines):
        # "Héllo Über straße" counts exactly one ASCII uppercase (the H)
        assert got[2][3] == 1


def _line_mirror(doc_id, text, n=16):
    ws = text.split()
    if not ws:
        return None
    lines = [" ".join(ws[k:k + n]) for k in range(0, len(ws), n)]
    seen, kept = set(), []
    for ln in lines:
        if ln not in seen:
            seen.add(ln)
            kept.append(ln)
    return (doc_id, " ".join(kept), len(lines), len(kept))


class TestIntraDocLineDedup:
    def test_planted_repeats(self, ray_session, tmp_path):
        boiler = " ".join(f"w{i}" for i in range(16))     # one full line
        uniq = " ".join(f"u{i}" for i in range(16))
        rows = [
            # boilerplate line repeated 3x inside one doc -> kept once
            (1, f"{boiler} {uniq} {boiler} {boiler}"),
            # no repeats: output == input lines
            (2, f"{uniq} tail words here"),
            # whitespace-only doc emits no row
            (3, "   "),
            # repeat with a DIFFERENT final partial line (no false drop)
            (4, f"{boiler} {boiler} extra"),
            # cross-doc repeat is NOT intra-doc: doc 5 keeps boiler
            (5, f"{boiler}"),
        ]
        _write_docs(tmp_path, rows)
        from pyspider_ray.training_queries import q_intra_doc_line_dedup
        got = {r["doc_id"]: (r["doc_id"], r["clean_text"], r["n_lines"],
                             r["n_lines_kept"])
               for r in q_intra_doc_line_dedup(str(tmp_path)).take_all()}
        expect = {r[0]: _line_mirror(*r) for r in rows
                  if _line_mirror(*r) is not None}
        assert got == expect
        assert got[1][3] == got[1][2] - 2      # two dropped repeats
        assert got[5][1] == boiler             # cross-doc untouched


class TestEmbeddingQuantize:
    def test_mirror_error_bound_and_recall(self, ray_session, sf_dir):
        import numpy as np
        import pyarrow.parquet as pq

        from pyspider_ray.training_queries import q_embedding_quantize

        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        E = np.stack(t["embedding"].to_pylist()).astype(np.float32)
        # independent mirror of the documented spec
        scale = np.maximum(np.abs(E).max(axis=0),
                           np.float32(1e-12)).astype(np.float32)
        inv = (np.float32(127.0) / scale).astype(np.float32)
        exp_codes = np.clip(np.rint(E * inv), -127, 127).astype(np.int8)

        out = q_embedding_quantize(sf_dir).take_all()
        assert len(out) == len(ids)
        got = {r["vec_id"]: r for r in out}
        order = {int(v): i for i, v in enumerate(ids)}
        for vid, r in got.items():
            i = order[vid]
            assert np.array_equal(np.asarray(r["codes"], dtype=np.int8),
                                  exp_codes[i]), vid
            assert r["max_abs_code"] <= 127
            # half-step bound 1/254 = 3937 ppm (+ float32 slack)
            assert r["err_ppm"] <= 4000, (vid, r["err_ppm"])
        # shortlist recall — the property an ANN pipeline actually
        # relies on: the float-space top-1 neighbor appears in the
        # int8-space top-5 shortlist (quantized scan + float re-rank)
        # for >= 95% of probes
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        C = exp_codes.astype(np.float32)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True),
                            1e-12)
        probe = np.arange(0, len(E), max(1, len(E) // 50))
        hits = 0
        for i in probe:
            sf = En @ En[i]
            sq = Cn @ Cn[i]
            sf[i] = sq[i] = -2.0
            top5_q = np.argpartition(sq, -5)[-5:]
            hits += int(np.argmax(sf) in top5_q)
        assert hits >= int(0.95 * len(probe)), (hits, len(probe))


class TestEpochShuffle:
    def test_permutation_invariants(self, ray_session, sf_dir):
        from pyspider_ray.training_queries import (_EPOCH_SHARDS, _EPOCHS,
                                                   q_epoch_shuffle)
        rows = q_epoch_shuffle(sf_dir).take_all()
        by_epoch = {}
        for r in rows:
            by_epoch.setdefault(r["epoch"], []).append(r)
        assert set(by_epoch) == set(range(_EPOCHS))
        n_docs = len(by_epoch[0])
        orders = []
        for e, rs in sorted(by_epoch.items()):
            # every epoch is a permutation of the same doc set
            assert len(rs) == n_docs
            assert len({r["doc_id"] for r in rs}) == n_docs
            # dense 0..n-1 positions within every shard
            shards = {}
            for r in rs:
                assert 0 <= r["shard"] < _EPOCH_SHARDS
                shards.setdefault(r["shard"], []).append(r["pos"])
            for ps in shards.values():
                assert sorted(ps) == list(range(len(ps)))
            orders.append(tuple(r["doc_id"] for r in
                                sorted(rs, key=lambda r: (r["shard"],
                                                          r["pos"]))))
        # different epochs really are different permutations
        assert orders[0] != orders[1] != orders[2]
        # and re-running is bit-identical (resumable training)
        again = {(r["epoch"], r["doc_id"]): (r["shard"], r["pos"])
                 for r in q_epoch_shuffle(sf_dir).take_all()}
        assert all(again[(r["epoch"], r["doc_id"])] ==
                   (r["shard"], r["pos"]) for r in rows)


class TestClipScoreGate:
    def test_integer_mirror_and_planted_corruptions(self, ray_session):
        import hashlib

        import numpy as np

        from pyspider_ray.functions.imaging import decode_image
        from pyspider_ray.training_queries import (_CLIP_DIM,
                                                   _CLIP_THRESH_PPM,
                                                   _image_caption_rows,
                                                   q_clip_score_gate)

        def mirror(r):
            """Independent per-row reimplementation of the documented
            integer-cosine spec (Python ints, no shared vector code)."""
            px = decode_image(r["bytes"])
            a = [0] * _CLIP_DIM
            for row in px.reshape(-1, 3).tolist():
                luma = (row[0] * 299 + row[1] * 587 + row[2] * 114) // 1000
                a[luma * _CLIP_DIM // 256] += 1
            npx = sum(a)
            a = [c * 1000 // npx for c in a]
            b = [0] * _CLIP_DIM
            toks = r["caption"].split()
            for w in toks:
                h = int.from_bytes(
                    hashlib.md5(w.encode()).digest()[:8], "big")
                b[h % _CLIP_DIM] += 1
            dot = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a)
            nb = sum(y * y for y in b)
            ppm = 0 if nb == 0 or na == 0 else dot * dot * 10**6 // (na * nb)
            return (len(toks), ppm, int(ppm >= _CLIP_THRESH_PPM))

        rows = _image_caption_rows(60)
        got = {r["image_id"]: (r["n_caption_tokens"], r["score_ppm"],
                               r["keep"])
               for r in q_clip_score_gate("unused").take_all()}
        checked = kept = dropped = 0
        for r in rows:
            if r["image_id"] not in got:
                continue    # corpus in the query may be larger
            exp = mirror(r)
            assert got[r["image_id"]] == exp, r["image_id"]
            checked += 1
            kept += exp[2]
            dropped += 1 - exp[2]
            if not r["caption"]:
                assert exp[2] == 0      # empty caption always drops
        assert checked == len(rows)
        assert kept > 0 and dropped > 0     # gate is non-vacuous


class TestImageExactDedup:
    def test_recrawl_collapse(self, ray_session):
        from pyspider_ray.training_queries import (_image_caption_rows,
                                                   q_image_exact_dedup)
        n_rows = len(_image_caption_rows())
        out = q_image_exact_dedup("unused").take_all()
        assert len(out) == n_rows
        by_id = {r["image_id"]: r for r in out}
        n_dups = 0
        for iid, r in by_id.items():
            if iid.endswith("-b"):
                n_dups += 1
                assert r["keep"] == 0
                assert r["kept_as"] == iid[:-2]
            else:
                assert r["keep"] == 1, iid
                assert r["kept_as"] == iid
        assert n_dups > 0 and n_dups == n_rows - len(
            [i for i in by_id if not i.endswith("-b")])


def _write_sourced_docs(dirpath, rows):
    """rows: (doc_id, source, text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[2]) for r in rows], pa.int64())})
    pq.write_table(t, os.path.join(dirpath, "documents.parquet"))


class TestSourceVocabOverlap:
    def test_pairwise_set_mirror(self, ray_session, tmp_path):
        rows = [
            (1, "web",  "the cat sat on the mat"),
            (2, "web",  "cat videos online"),
            (3, "book", "the dog sat quietly"),
            (4, "book", "a dog and a cat"),
            (5, "wiki", "the mat exhibit"),
            (6, "wiki", "   "),                    # whitespace-only doc
            (7, "code", "def main(): return 0"),   # disjoint vocabulary
        ]
        _write_sourced_docs(tmp_path, rows)
        from pyspider_ray.training_queries import q_source_vocab_overlap
        got = {(r["source_a"], r["source_b"]): r["n_shared"]
               for r in q_source_vocab_overlap(str(tmp_path)).take_all()}
        # independent mirror: plain Python sets
        vocab = {}
        for _, src, text in rows:
            vocab.setdefault(src, set()).update(text.split())
        srcs = sorted(vocab)
        exp = {}
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                n = len(vocab[srcs[i]] & vocab[srcs[j]])
                if n:
                    exp[(srcs[i], srcs[j])] = n
        assert got == exp
        # the planted semantics actually bite:
        assert got[("book", "web")] == len({"the", "cat", "sat"})
        assert got[("web", "wiki")] == len({"the", "mat"})
        assert ("code", "web") not in got          # disjoint pair absent
        assert all(a < b for a, b in got)          # unordered, a < b


class TestWdsShardPlan:
    def test_prefix_sum_mirror(self, ray_session, tmp_path):
        import hashlib
        # planted: zero-char docs, a giant doc (>2 shard budgets, so the
        # following doc's shard_id jumps — the plan must mirror that gap)
        rows = [(i, "x" * n) for i, n in
                [(1, 100), (2, 0), (3, 9000), (4, 250), (5, 0),
                 (6, 4095), (7, 1), (8, 4096), (9, 777), (10, 3333)]]
        _write_docs(tmp_path, rows)
        from pyspider_ray.training_queries import (_WDS_SHARD_CHARS,
                                                   q_wds_shard_plan)
        got = {r["doc_id"]: r["shard_id"]
               for r in q_wds_shard_plan(str(tmp_path)).take_all()}
        # independent mirror: sort by (md5 key, doc_id), running sum
        key = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
               for i, _ in rows}
        order = sorted(rows, key=lambda r: (key[r[0]], r[0]))
        exp, before = {}, 0
        for i, text in order:
            exp[i] = before // _WDS_SHARD_CHARS
            before += len(text)
        assert got == exp
        # the giant doc really straddles: total 21652 chars -> >1 shard
        assert len(set(got.values())) > 1
        # every doc planned exactly once
        assert sorted(got) == [r[0] for r in rows]


class TestCaptionDupFilter:
    def test_counter_mirror_and_planted_boilerplate(self, ray_session):
        from collections import Counter

        from pyspider_ray.training_queries import (_CAPTION_BOILER,
                                                   _CAPTION_DUP_MAX,
                                                   _image_caption_rows,
                                                   q_caption_dup_filter)
        rows = _image_caption_rows()
        for j in range(0, len(rows), 11):
            rows[j] = {**rows[j], "caption": _CAPTION_BOILER}
        norm = {r["image_id"]: " ".join(r["caption"].lower().split())
                for r in rows}
        uses = Counter(norm.values())
        got = {r["image_id"]: (r["n_uses"], r["keep"])
               for r in q_caption_dup_filter("unused").take_all()}
        assert len(got) == len(rows)
        kept = dropped_boiler = dropped_empty = 0
        for iid, cap in norm.items():
            exp_keep = int(bool(cap) and uses[cap] <= _CAPTION_DUP_MAX)
            assert got[iid] == (uses[cap], exp_keep), iid
            kept += exp_keep
            if cap == _CAPTION_BOILER:
                dropped_boiler += 1 - exp_keep
            if not cap:
                dropped_empty += 1 - exp_keep
        # the planted semantics bite: every boilerplate and every empty
        # caption drops; plenty survives
        assert dropped_boiler == sum(
            1 for c in norm.values() if c == _CAPTION_BOILER) > 3
        assert dropped_empty == sum(1 for c in norm.values() if not c) > 0
        assert kept > len(rows) // 2
        # the "-b" re-crawl shares its caption: n_uses 2, still kept
        twins = [i for i in norm if i.endswith("-b")
                 and norm[i] and norm[i] != _CAPTION_BOILER]
        assert twins and all(got[i] == (2, 1) for i in twins
                             if uses[norm[i]] == 2)


class TestOovRate:
    def test_vocab_tie_election_and_mirror(self, ray_session, tmp_path):
        from collections import Counter
        # 120 distinct words; w099/w100/w101 tie in count exactly at the
        # top-100 boundary -> the (count DESC, word ASC) election keeps
        # w099 (the 100th slot) and rejects its equal-count peers
        # w100/w101; whitespace-only doc contributes 0
        words = [f"w{i:03d}" for i in range(120)]
        texts, docs = [], []
        for s in range(3):
            toks = []
            for i, w in enumerate(words):
                reps = (3 if i < 99 else 2 if i <= 101 else 1)
                toks += [w] * reps
            texts.append(" ".join(toks))
        docs = [(i + 1, t) for i, t in enumerate(texts)] + [(99, "  ")]
        _write_sourced_docs(tmp_path, [(d, f"s{d % 3}", t)
                                       for d, t in docs])
        from pyspider_ray.training_queries import q_oov_rate
        got = {r["source"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
               for r in q_oov_rate(str(tmp_path)).take_all()}
        # mirror: same election, pure Python
        cnt = Counter()
        per_src = {}
        for d, t in docs:
            toks = t.split()
            cnt.update(toks)
            per_src.setdefault(f"s{d % 3}", []).extend(toks)
        vocab = {w for w, _ in sorted(cnt.items(),
                                      key=lambda kv: (-kv[1], kv[0]))[:100]}
        assert "w099" in vocab
        assert "w100" not in vocab and "w101" not in vocab
        exp = {}
        for s, toks in per_src.items():
            oov = sum(w not in vocab for w in toks)
            exp[s] = (len(toks), oov, oov * 1_000_000 // max(len(toks), 1))
        assert got == exp
        assert any(v[1] > 0 for v in got.values())   # OOV non-vacuous


class TestCompressionRatio:
    def test_mirror_and_planted_extremes(self, ray_session, tmp_path):
        import zlib
        import hashlib
        noise = "".join(chr(33 + b % 94) for i in range(200)
                        for b in hashlib.sha256(bytes([i])).digest())
        rows = [
            (1, "spam " * 400),                         # repetition: drop
            (2, noise),                                 # random junk: drop
            (3, "a perfectly ordinary sentence about data pipelines "
                "repeated just enough to compress like real prose. " * 4),
            (4, ""),                                    # empty: drop
            # tiny doc: zlib header overhead pushes ratio over MAX —
            # this gate (like Dolma's) runs AFTER a min-length gate
            (5, "short but real words in a row here"),
        ]
        _write_docs(tmp_path, rows)
        from pyspider_ray.training_queries import (_ZRATIO_MAX,
                                                   _ZRATIO_MIN,
                                                   q_compression_ratio)
        got = {r["doc_id"]: (r["raw_len"], r["z_len"], r["ratio_ppm"],
                             r["keep"])
               for r in q_compression_ratio(str(tmp_path)).take_all()}
        assert len(got) == len(rows)
        for doc_id, text in rows:
            enc = text.encode()
            zl = len(zlib.compress(enc, 6)) if enc else 0
            ppm = zl * 1_000_000 // len(enc) if enc else 0
            keep = int(bool(enc) and _ZRATIO_MIN <= ppm <= _ZRATIO_MAX)
            assert got[doc_id] == (len(enc), zl, ppm, keep), doc_id
        # the planted extremes draw the gate from both sides
        assert got[1][3] == 0 and got[1][2] < _ZRATIO_MIN
        assert got[2][3] == 0 and got[2][2] > _ZRATIO_MAX
        assert got[4][3] == 0
        assert got[5][3] == 0 and got[5][2] > _ZRATIO_MAX   # overhead
        assert got[3][3] == 1


class TestPagerankUrls:
    def test_fixed_point_mirror(self, ray_session, monkeypatch):
        import numpy as np
        monkeypatch.setenv("GRAFT_PR_NODES", "400")
        from pyspider_ray.functions import synthweb
        from pyspider_ray.training_queries import (_PR_ITERS, _PR_SCALE,
                                                   q_pagerank_urls)
        N, show = 400, synthweb.DEFAULT_SHOW
        got = {r["node"]: r["r"]
               for r in q_pagerank_urls("unused").take_all()}
        assert len(got) == N
        # independent mirror: same integer recurrence, plain dicts
        base = 3 * _PR_SCALE // (20 * N)
        r = {u: _PR_SCALE // N for u in range(N)}
        dst = synthweb.child_ids(np.arange(N), N, show=show)
        for _ in range(_PR_ITERS):
            nxt = {u: base for u in range(N)}
            for u in range(N):
                c = (r[u] * 17) // (20 * show)
                for v in dst[u]:
                    nxt[int(v)] += c
            r = nxt
        assert got == r
        # authority actually differentiates (not a uniform fixed point)
        vals = sorted(got.values())
        assert vals[0] < vals[-1]
        # rerun is bit-identical (the fixed-point promise)
        again = {x["node"]: x["r"]
                 for x in q_pagerank_urls("unused").take_all()}
        assert again == got


class TestEmbeddingProject:
    def test_numpy_mirror_and_jl_property(self, ray_session, sf_dir):
        import numpy as np
        import pyarrow.parquet as pq

        from pyspider_ray.training_queries import (_PROJ_DIMS,
                                                   _proj_planes,
                                                   q_embedding_project)
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        ids = t["vec_id"].to_numpy()
        E = np.stack(t["embedding"].to_pylist()).astype(np.float32)
        P = _proj_planes(E.shape[1], _PROJ_DIMS)
        exp = (E.astype(np.float64) @ P).astype(np.float32)

        out = {r["vec_id"]: r for r in
               q_embedding_project(sf_dir).take_all()}
        assert len(out) == len(ids)
        order = {int(v): i for i, v in enumerate(ids)}
        ratios = []
        for vid, r in out.items():
            i = order[vid]
            got = np.asarray(r["proj"], dtype=np.float32)
            assert got.shape == (_PROJ_DIMS,)
            # bit-exact: same planes, same matmul, same fp32 rounding
            assert np.array_equal(got, exp[i]), vid
            ratios.append(r["norm_ratio_ppm"] / 1e6)
        # JL in expectation: norm ratios concentrate around 1
        ratios = np.asarray(ratios)
        assert 0.75 < np.median(ratios) < 1.25
        assert (np.abs(ratios - 1.0) < 0.8).mean() > 0.95
        # deterministic planes: a second call regenerates identically
        assert np.array_equal(_proj_planes(E.shape[1], _PROJ_DIMS), P)


class TestHtmlTextExtract:
    CASE = """<html><head><script>var x=1;</script><style>p{}</style>
    </head><body>
    <nav><a href=a>Home</a> <a href=b>About</a> <a href=c>More</a></nav>
    <header>site banner words here repeated</header>
    <div id=main>
      <p>This is the real article content with plenty of words to keep.</p>
      <p>tiny</p>
      <div><a href=x>link</a> <a href=y>farm</a> <a href=z>of</a>
           <a href=w>many</a> <a href=v>links</a> only</div>
      <ul><li>a list item with enough words to survive the gate</li>
          <li>short one</li></ul>
      <blockquote>a quoted passage long enough to clear the minimum
      word gate</blockquote>
    </div>
    <aside>related links sidebar</aside>
    <footer>copyright boilerplate footer text here</footer>
    </body></html>"""

    def test_golden_extraction(self):
        from pyspider_ray.functions.htmldoc import extract_text
        r = extract_text(self.CASE)
        lines = r["text"].split("\n")
        assert lines == [
            "This is the real article content with plenty of words "
            "to keep.",
            "a list item with enough words to survive the gate",
            "a quoted passage long enough to clear the minimum word "
            "gate",
        ]
        # boilerplate gone entirely
        for bad in ("var x=1", "Home", "banner", "sidebar", "copyright",
                    "link farm"):
            assert bad not in r["text"]
        assert r["n_kept"] == 3
        assert r["n_blocks"] > r["n_kept"]     # gates really rejected
        assert r["n_words"] == len(r["text"].split())

    def test_link_density_integer_gate(self):
        from pyspider_ray.functions.htmldoc import extract_text
        # exactly 50% link words -> rejected (strict <)
        h = "<p><a href=x>four link words here</a> four plain words here</p>"
        assert extract_text(h)["n_kept"] == 0
        # just under 50% -> kept
        h2 = "<p><a href=x>three link words</a> four plain words here</p>"
        assert extract_text(h2)["n_kept"] == 1

    def test_query_over_synthetic_pages(self, ray_session, monkeypatch):
        monkeypatch.setenv("GRAFT_HTML_PAGES", "60")
        from pyspider_ray.training_queries import (_synth_page_html,
                                                   q_html_text_extract)
        from pyspider_ray.functions.htmldoc import extract_text
        out = {r["page_id"]: r for r in
               q_html_text_extract("unused").take_all()}
        assert len(out) == 60
        for i in (0, 7, 33, 59):               # spot-check vs direct call
            exp = extract_text(_synth_page_html(i))
            assert out[i]["text"] == exp["text"]
            assert out[i]["n_kept"] == exp["n_kept"]
        # every page keeps its article paragraphs and drops the farm
        for i, r in out.items():
            assert r["n_kept"] >= 1
            assert "related link" not in r["text"]
            assert "copyright" not in r["text"]
            assert "section" not in r["text"]


class TestWebCurate:
    def test_clone_collapse_and_gate_mirror(self, ray_session,
                                            monkeypatch):
        import hashlib
        import zlib
        monkeypatch.setenv("GRAFT_HTML_PAGES", "90")
        from pyspider_ray.functions.htmldoc import extract_text
        from pyspider_ray.training_queries import (_ZRATIO_MAX,
                                                   _ZRATIO_MIN,
                                                   _synth_page_html,
                                                   q_web_curate)
        got = {r["page_id"]: r for r in q_web_curate("unused").take_all()}
        assert len(got) == 90
        # independent per-page mirror
        texts = {}
        for i in range(90):
            src = i - 7 if i % 9 == 7 else i
            texts[i] = extract_text(_synth_page_html(src))["text"]
        first_of = {}
        for i in range(90):                      # min-id winner per text
            enc = texts[i].encode()
            zl = len(zlib.compress(enc, 6)) if enc else 0
            ppm = zl * 1_000_000 // len(enc) if enc else 0
            nw = len(texts[i].split())
            ok = int(nw >= 10 and _ZRATIO_MIN <= ppm <= _ZRATIO_MAX)
            r = got[i]
            assert (r["n_words"], r["ratio_ppm"], r["gate_ok"]) == \
                (nw, ppm, ok), i
            d = hashlib.md5(enc).digest()
            if ok and d not in first_of:
                first_of[d] = i
            if ok:
                assert r["kept_as"] == first_of[d]
                assert r["keep"] == int(i == first_of[d])
            else:
                assert r["keep"] == 0
        # the planted clones really collapse (7, 16, 25, ... if kept)
        collapsed = [i for i in range(90)
                     if i % 9 == 7 and got[i]["gate_ok"] == 1]
        assert collapsed, "no clone survived the gates"
        for i in collapsed:
            assert got[i]["keep"] == 0 and got[i]["kept_as"] == i - 7
        assert sum(r["keep"] for r in got.values()) > 40


class TestNeardupStore:
    def test_refresh_without_history_text(self, ray_session, tmp_path):
        """Build the artifact from history, then DELETE the history
        parquet — refresh must still produce the exact new-vs-history
        jaccard>=0.9 pairs (pure-Python mirror), proving the refresh
        path touches only the artifact, never history text."""
        import os as _os

        import ray.data as rd

        from pyspider_ray.pipelines import neardup_store
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        hist_rows = [
            (1, base),                                # near-dup target
            (2, base + " lambda"),                    # j=10/11 >= 0.9
            (3, "completely different words here now severally"),
            (4, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9"),
        ]
        new_rows = [
            (100, base),                              # exact dup of 1
            (101, base + " mu"),                      # j(1)=10/11 ✓
            (102, "nothing shared with anyone at all whatsoever"),
            (103, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),   # j(4)=10/11
        ]
        src = tmp_path / "hist"
        src.mkdir()
        _write_docs(src, hist_rows)
        art = str(tmp_path / "art")
        hist_ds = rd.read_parquet(str(src / "documents.parquet"),
                                  columns=["doc_id", "text"])
        m = neardup_store.build(hist_ds, art)
        assert m["n_docs"] == len(hist_rows)
        _os.remove(src / "documents.parquet")     # history text GONE

        import pyarrow as pa
        new_t = pa.table({
            "doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
            "text": pa.array([r[1] for r in new_rows], pa.string())})
        got = {(r["new_doc"], r["hist_doc"]) for r in
               neardup_store.refresh(rd.from_arrow(new_t),
                                     art).take_all()}
        # independent mirror
        exp = set()
        for ni, nt in new_rows:
            a = set(nt.split())
            for hi, ht in hist_rows:
                b = set(ht.split())
                i = len(a & b)
                if i * 10 >= 9 * len(a | b):
                    exp.add((ni, hi))
        assert got == exp
        assert (100, 1) in got and (101, 1) in got and (103, 4) in got
        assert not any(n == 102 for n, _ in got)


class TestNeardupStoreCrashSafety:
    def test_rebuild_keeps_old_artifact_until_swap(self, ray_session,
                                                   tmp_path):
        """A rebuild must leave the LIVE artifact readable while it
        runs (the old delete-first flow destroyed both versions on a
        mid-build crash), and a crashed swap must be recoverable."""
        import json as _json
        import os as _os
        import shutil as _sh

        import pyarrow as _pa
        import ray.data as rd

        from pyspider_ray.pipelines import neardup_store
        rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}")
                for i in range(8)]
        t = _pa.table({
            "doc_id": _pa.array([r[0] for r in rows], _pa.int64()),
            "text": _pa.array([r[1] for r in rows], _pa.string())})
        art = str(tmp_path / "art")
        m1 = neardup_store.build(rd.from_arrow(t), art)
        live_manifest = _os.path.join(art, "_MANIFEST.json")
        before = open(live_manifest).read()

        # crash simulation 1: a stale .tmp from a dead build must not
        # block (or corrupt) the next build, and the live artifact is
        # still there for readers in the meantime
        _os.makedirs(art + ".tmp", exist_ok=True)
        open(_os.path.join(art + ".tmp", "junk"), "w").write("x")
        assert open(live_manifest).read() == before
        m2 = neardup_store.build(rd.from_arrow(t), art)
        assert m2["n_docs"] == m1["n_docs"]
        assert not _os.path.exists(_os.path.join(art, "junk"))

        # crash simulation 2: swap died between "live -> .old" and
        # ".tmp -> live" — refresh must recover the displaced version
        _sh.move(art, art + ".old")
        assert not _os.path.exists(art)
        new_t = _pa.table({
            "doc_id": _pa.array([100, 101], _pa.int64()),
            "text": _pa.array([rows[0][1], rows[1][1]], _pa.string())})
        pairs = neardup_store.refresh(rd.from_arrow(new_t), art)
        assert not _os.path.exists(art + ".old")
        assert _json.load(open(live_manifest))["n_docs"] == m2["n_docs"]
        assert pairs.count() >= 2      # exact dups of docs 0 and 1

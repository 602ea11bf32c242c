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

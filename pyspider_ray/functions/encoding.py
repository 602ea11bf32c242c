"""Statistical charset detection — the chardet-fallback slot of the
reference's encoding chain (pyspider/libs/response.py:61-95: header
charset → meta charset → chardet guess) without the chardet
dependency.

The detector covers what that chain is used for in practice:

- UTF-8 validity is decisive: a body whose non-ASCII bytes form valid
  UTF-8 multibyte sequences IS UTF-8 (false positives are
  astronomically unlikely), even when a stale header says otherwise —
  the mislabeled-legacy-page case.
- Otherwise legacy CJK candidates (gb18030, big5, shift_jis) and
  latin-1 are scored: each decode is graded by plausible-character
  mass (CJK ideographs, kana, CJK punctuation, fullwidth forms,
  printable latin) minus penalties for replacement characters and C1
  control codes (the tell-tale of wrongly-applied single-byte
  decodings).
"""

from __future__ import annotations

_CANDIDATES = ("gb18030", "big5", "shift_jis", "latin-1")


def _score(text: str) -> float:
    good = 0.0
    bad = 0.0
    for ch in text:
        cp = ord(ch)
        if cp == 0xFFFD:                      # replacement char
            bad += 2.0
        elif 0x80 <= cp <= 0x9F:              # C1 controls: mojibake tell
            bad += 2.0
        elif 0xFF61 <= cp <= 0xFF9F:          # halfwidth katakana: the
            bad += 1.0                        # classic shift_jis mojibake
        elif 0x3040 <= cp <= 0x30FF:          # kana: strong Japanese
            good += 1.5                       # signal (GBK mojibake of
                                              # shift_jis yields hanzi,
                                              # almost never kana)
        elif (0x4E00 <= cp <= 0x9FFF          # CJK unified ideographs
              or 0x3400 <= cp <= 0x4DBF       # CJK ext A
              or 0x3000 <= cp <= 0x303F       # CJK punctuation
              or 0xFF00 <= cp <= 0xFF60):     # fullwidth punct/letters
            good += 1.0
        elif cp < 0x80 or ch.isalpha():
            good += 0.1                       # ASCII / accented latin
    return good - bad


def detect_encoding(content: bytes) -> str:
    """Best-effort charset guess for an unlabeled (or mislabeled) body."""
    if not content:
        return "utf-8"
    if content.startswith((b"\xef\xbb\xbf",)):
        return "utf-8"
    if content.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    try:
        content.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    sample = content[:65536]
    best, best_score = "latin-1", float("-inf")
    for enc in _CANDIDATES:
        try:
            text = sample.decode(enc, "replace")
        except LookupError:       # pragma: no cover
            continue
        s = _score(text)
        if s > best_score:
            best, best_score = enc, s
    return best


def _replace_score(sample: bytes, enc: str) -> float:
    """Per-character plausibility of ``sample`` decoded with
    ``errors='replace'`` — density, not mass, so a multi-byte mojibake
    decode can't win just by emitting fewer, individually-plausible
    characters."""
    try:
        text = sample.decode(enc, "replace")
    except LookupError:
        return float("-inf")
    if not text:
        return float("-inf")
    return _score(text) / len(text)


def sniff_encoding(content: bytes, declared: str | None) -> str:
    """Full policy: trust a declared charset only when it survives the
    evidence; fall back to statistical detection.

    - valid multibyte UTF-8 wins over any legacy label;
    - a declared charset that strict-decodes the body is kept;
    - a declared charset that fails strict decode (e.g. one corrupt
      byte in an otherwise-utf-8 page) still COMPETES: its
      replace-decode score is compared against utf-8 and the legacy
      candidates, declared first on ties — mirroring the reference,
      which decodes with the declared charset using replacement errors
      (response.py:61-95) rather than discarding it;
    - anything else goes to :func:`detect_encoding`.
    """
    if declared:
        # a label that can't text-decode must never leave this function
        # — the fetcher decodes with the returned name and would raise
        # LookupError on charset=unicode pages (seen in the wild) or on
        # registered NON-TEXT codecs (rot13/base64/hex pass
        # codecs.lookup but bytes.decode refuses them)
        try:
            # one-byte probe: b"".decode skips codec lookup entirely
            # (CPython fast-path), so it validates nothing
            b"a".decode(declared, "replace")
        except (LookupError, ValueError):
            declared = None
    if not isinstance(content, bytes) or not content:
        return declared or "utf-8"
    has_high = any(b >= 0x80 for b in content[:65536])
    if has_high:
        try:
            content.decode("utf-8", "strict")
            return "utf-8"
        except UnicodeDecodeError:
            pass
    if declared:
        if not has_high:
            return declared
        try:
            content.decode(declared, "strict")
            return declared
        except LookupError:
            pass
        except UnicodeDecodeError:
            sample = content[:65536]
            # A few corrupt bytes don't discredit the label: if the
            # declared replace-decode is plausibility-POSITIVE it stays
            # (a true mislabel — e.g. gb18030 bytes declared utf-8 —
            # floods the decode with U+FFFD and goes deeply negative).
            # The sign test matters because mojibake of a WRONG codec
            # can out-mass the right one (gb18030 turns utf-8 hanzi
            # bytes into different but individually-plausible hanzi).
            if _replace_score(sample, declared) >= 0:
                return declared
            ordered, seen = [], set()
            for enc in (declared, "utf-8", *_CANDIDATES):
                key = enc.lower().replace("_", "-")
                if key not in seen:
                    seen.add(key)
                    ordered.append(enc)
            best, best_score = declared, float("-inf")
            for enc in ordered:          # strict > : declared wins ties
                s = _replace_score(sample, enc)
                if s > best_score:
                    best, best_score = enc, s
            return best
    if not has_high:
        return "utf-8"
    return detect_encoding(content)

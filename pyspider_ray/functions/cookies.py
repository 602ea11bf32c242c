"""Cookie-session pure functions (T8) — the slice of the reference's
tornado ``CookieTracker``/``cookie_utils`` behavior that is
transport-independent: parse ``Set-Cookie`` response headers into a
jar, merge jars with later-wins semantics, serialize a jar onto a
request ``Cookie`` header (used by functions.requests_pack).

The reference threads cookies response→session→next request inside the
fetcher (tornado_fetcher.py:314-324 + libs/cookie_utils.py); here the
jar rides the task's ``fetch.cookies`` dict through the frontier, so
cookie state is explicit, checkpointable task data instead of hidden
fetcher-process state — the form that survives a distributed fetcher
pool."""

from __future__ import annotations

from http.cookies import SimpleCookie


def parse_set_cookie(header_value: str) -> dict[str, str]:
    """One or more Set-Cookie header strings (comma-joined or single)
    → {name: value} (attributes like Path/Expires are dropped: the
    session jar keeps pairs only, as the reference's dump())."""
    jar: dict[str, str] = {}
    c = SimpleCookie()
    try:
        c.load(header_value)
    except Exception:
        return jar
    for name, morsel in c.items():
        jar[name] = morsel.value
    return jar


def extract_cookies(headers: dict) -> dict[str, str]:
    """Response headers → cookie jar ({} when none)."""
    jar: dict[str, str] = {}
    for k, v in (headers or {}).items():
        if k.lower() == "set-cookie" and v:
            for part in v.split("\n"):   # multi-header join convention
                jar.update(parse_set_cookie(part))
    return jar


def merge_cookies(*jars: dict | None) -> dict[str, str]:
    """Later jars win (request defaults < session < per-task)."""
    out: dict[str, str] = {}
    for jar in jars:
        if jar:
            out.update(jar)
    return out

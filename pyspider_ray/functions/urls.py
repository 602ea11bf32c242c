"""URL canonicalization & task identity.

Same observable behavior as the reference helpers:

- ``build_url``       ~ pyspider/libs/url.py:29-59 (`_build_url`): IDNA
  netloc, default path ``/``, merge extra query params.
- ``quote_non_ascii`` ~ pyspider/libs/url.py:62-70 (`quote_chinese`):
  percent-encode bytes >= 0x80.
- ``md5_taskid``      ~ pyspider/libs/base_handler.py:342-344 +
  pyspider/libs/utils.py:20 (`md5string`): hex md5 of the canonical URL.
- ``urlhash64``       — our addition: low 64 bits of the md5 digest as a
  signed int64 shard key (SURVEY.md §1.7).
- ``curl_to_arguments`` ~ pyspider/libs/url.py:73-123.

All are pure functions; the batch stage applying them lives in
``pyspider_ray.stages.canonicalize``.
"""

from __future__ import annotations

import hashlib
import shlex
from urllib.parse import urlencode, urlparse, urlunparse


def quote_non_ascii(url: str, encoding: str = "utf-8") -> str:
    raw = url.encode(encoding) if isinstance(url, str) else url
    return "".join(chr(b) if b < 128 else "%%%02X" % b for b in raw)


def build_url(url: str, params=None) -> str:
    """Canonical form: IDNA-encoded host, '/' default path, params merged
    into the query string."""
    scheme, netloc, path, parse_params, query, fragment = urlparse(url)
    try:
        netloc = netloc.encode("idna").decode("utf-8")
    except UnicodeError:
        pass  # already-encoded or invalid label: keep verbatim
    if not path:
        path = "/"
    if params:
        extra = urlencode(params) if not isinstance(params, str) else params
        query = f"{query}&{extra}" if query else extra
    return urlunparse([scheme, netloc, path, parse_params, query, fragment])


def canonical_url(url: str) -> str:
    return quote_non_ascii(build_url(url))


def url_host(url: str) -> str:
    return urlparse(url).netloc.lower()


def md5_taskid(url: str) -> str:
    return hashlib.md5(url.encode("utf-8")).hexdigest()


def urlhash64(url: str) -> int:
    """Signed int64 shard/dedup key from the md5 digest's low 8 bytes."""
    digest = hashlib.md5(url.encode("utf-8")).digest()
    return int.from_bytes(digest[8:16], "big", signed=True)


def curl_to_arguments(curl: str) -> dict:
    """Parse a ``curl ...`` command line into crawl kwargs
    (driver-side convenience, like pyspider/libs/url.py:73-123)."""
    kwargs: dict = {}
    headers: dict = {}
    urls: list[str] = []
    pending_opt = None
    parts = shlex.split(curl)
    if not parts:
        raise TypeError("empty curl command")
    for part in parts[1:]:
        if pending_opt is None:
            if not part.startswith("-"):
                urls.append(part)
            elif part == "--compressed":
                kwargs["use_gzip"] = True
            else:
                pending_opt = part
            continue
        opt, pending_opt = pending_opt, None
        if opt in ("-H", "--header"):
            key, _, value = part.partition(":")
            if value:
                headers[key.strip()] = value.strip()
        elif opt in ("-d", "--data"):
            kwargs["data"] = part
        elif opt == "--data-binary":
            kwargs["data"] = part.lstrip("$")
        elif opt in ("-X", "--request"):
            kwargs["method"] = part
        else:
            raise TypeError(f"Unknown curl option: {opt}")
    if pending_opt:
        raise TypeError(f"Unknown curl option: {pending_opt}")
    if not urls:
        raise TypeError("curl: no URL specified!")
    kwargs["urls"] = urls
    if headers:
        kwargs["headers"] = headers
    return kwargs

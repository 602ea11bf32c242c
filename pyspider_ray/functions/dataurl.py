"""data: URI codec — same observable behavior as the reference's
``pyspider/libs/dataurl.py:14-56`` (base64 flag, charset parameter,
percent-encoding fallback), as pure functions."""

from __future__ import annotations

from base64 import b64decode, b64encode
from urllib.parse import quote, unquote


def encode(data, mime_type: str = "", charset: str | None = "utf-8",
           base64: bool = True) -> str:
    if isinstance(data, str):
        data = data.encode(charset or "utf-8")
    else:
        charset = None
    payload = b64encode(data).decode("ascii") if base64 \
        else quote(data)
    out = ["data:"]
    if mime_type:
        out.append(mime_type)
    if charset:
        out.append(";charset=")
        out.append(charset)
    if base64:
        out.append(";base64")
    out.append(",")
    out.append(payload)
    return "".join(out)


def decode(data_url: str) -> str | bytes:
    """'data:[mime][;charset=c][;base64],payload' → str (when a charset
    rides in the metadata) or bytes/str exactly as the reference."""
    metadata, data = data_url.rsplit(",", 1)
    _, metadata = metadata.split("data:", 1)
    parts = metadata.split(";")
    if parts[-1] == "base64":
        payload: str | bytes = b64decode(data)
    else:
        payload = unquote(data)
    for part in parts:
        if part.startswith("charset=") and isinstance(payload, bytes):
            payload = payload.decode(part[8:])
    return payload

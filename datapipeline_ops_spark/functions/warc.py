"""Minimal WARC/1.0 record writer + stream parser (pure stdlib).

WARC is the container format web crawls actually arrive in (CommonCrawl
et al.): a text header block, a blank line, then exactly Content-Length
payload bytes, then two CRLFs — records concatenated into large files.
The parser here consumes a byte stream of concatenated records, so the
framing logic (the real failure mode: a payload containing something that
LOOKS like a header must not desync the stream) is what gets exercised
and value-gated by ``warc_record_extract``.

Scope: WARC/1.0, the headers the query needs; unknown headers are carried
through; malformed framing raises ``ValueError`` for dead-letter routing.
"""

from __future__ import annotations

_CRLF = b"\r\n"


def write_warc_record(
    target_uri: str, payload: bytes, warc_type: str = "response", record_id: str = ""
) -> bytes:
    """Serialize one WARC/1.0 record (headers + blank line + payload +
    record separator)."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Target-URI: " + target_uri.encode(),
    ]
    if record_id:
        headers.append(b"WARC-Record-ID: " + record_id.encode())
    headers.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def parse_warc_stream(stream: bytes) -> list[dict]:
    """Parse a byte stream of concatenated WARC records.

    Framing by Content-Length ONLY — the payload is never scanned for
    header-like bytes, so payloads containing 'WARC/1.0' cannot desync
    the stream. Returns one dict per record with ``headers`` (dict),
    ``payload`` (bytes)."""
    records: list[dict] = []
    pos = 0
    n = len(stream)
    while pos < n:
        head_end = stream.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        head = stream[pos:head_end].decode("utf-8", errors="strict")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {lines[:1]!r}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, sep, v = line.partition(":")
            if not sep:
                raise ValueError(f"malformed WARC header line: {line!r}")
            headers[k.strip()] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing/invalid Content-Length") from exc
        body_start = head_end + 4
        body_end = body_start + length
        if body_end + 4 > n:
            raise ValueError("truncated WARC payload")
        if stream[body_end : body_end + 4] != _CRLF + _CRLF:
            raise ValueError("missing record separator after payload")
        records.append(
            {"version": lines[0], "headers": headers,
             "payload": stream[body_start:body_end]}
        )
        pos = body_end + 4
    return records

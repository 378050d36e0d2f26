"""Minimal pure-stdlib WAV (RIFF/PCM) codec — the audio analog of
``functions/png.py``.

The reference's probe ops read container metadata with ffprobe
(``common/video/video_probe_op.py``); WAV needs nothing beyond ``struct``,
so a REAL container parse — magic, chunk walk, fmt extraction, sample
decode — runs in this dependency-less sandbox and is value-gated by the
``media_wav_probe`` oracle. Scope: PCM (format 1), 16-bit, mono; anything
else raises ``ValueError`` for dead-letter routing.
"""

from __future__ import annotations

import struct


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Encode mono 16-bit PCM samples as a canonical RIFF/WAVE file."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, list[int]]:
    """Parse a RIFF/WAVE file -> (sample_rate, samples). Walks the chunk
    list (tolerates extra chunks like LIST/INFO); PCM 16-bit mono only."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            audio_format, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if (audio_format, channels, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV variant: fmt={audio_format} "
                    f"ch={channels} bits={bits}"
                )
        elif ctype == b"data":
            data = chunk
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    n = len(data) // 2
    return rate, list(struct.unpack(f"<{n}h", data[: n * 2]))

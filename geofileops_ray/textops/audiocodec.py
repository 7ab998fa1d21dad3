"""Pure-stdlib WAV (RIFF PCM) codec — the audio analogue of
imagecodec.py: no external audio libs, real decode for the multimodal
audio stages. Scope: PCM 16-bit signed / 8-bit unsigned, any channel
count, non-extensible fmt chunks (documented; compressed WAV raises)."""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 → RIFF/WAVE PCM16."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → ((n, ch) int16, sample_rate). 8-bit PCM is
    widened to int16 ((x-128)<<8)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = ch = bits = None
    data = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (length,) = struct.unpack_from("<I", b, pos + 4)
        chunk = b[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", chunk
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format {audio_fmt} (PCM only)")
        elif tag == b"data":
            data = chunk
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        arr = np.frombuffer(data, "<i2")
    elif bits == 8:
        arr = ((np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch).copy(), int(rate)

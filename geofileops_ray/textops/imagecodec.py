"""Pure-stdlib image codecs (numpy + zlib) — no external image libs.

The container ships no PIL/OpenCV/ffmpeg, but BMP (uncompressed 24-bit)
and PNG (zlib DEFLATE + per-row filters) need nothing beyond the
standard library, so the multimodal decode path can be REAL for these
two formats instead of a hash-fake: `decode_image` returns an
(H, W, 3|4) uint8 array, `encode_bmp` / `encode_png` write bytes any
external viewer accepts.

Scope (documented): 8-bit RGB/RGBA/gray PNG, non-interlaced; 24-bit
uncompressed BMP. Our own encoders emit PNG filter 0 (decode of rows
filtered with types 1-4 is supported for foreign files but pays a
per-pixel loop — fine for the small media payloads this table carries;
sequence-dependent unfiltering cannot vectorize across x)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ------------------------------------------------------------------ BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP (BGR, bottom-up,
    4-byte row padding)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


def decode_bmp(b: bytes) -> np.ndarray:
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", b, 10)[0]
    size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, np.uint8, count=h * stride, offset=off).reshape(
        h, stride
    )
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


# ------------------------------------------------------------------ PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """(H, W), (H, W, 3) or (H, W, 4) uint8 → PNG (8-bit, filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError("encode_png expects (H,W[,3|4]) uint8")
    h, w = img.shape[:2]
    raw = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * ch)  # filter byte 0 per row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(b: bytes) -> np.ndarray:
    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = len(_PNG_SIG), 0
    h = bitdepth = color = interlace = 0
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if ch is None or bitdepth != 8 or interlace:
        raise ValueError(
            f"unsupported PNG (bitdepth={bitdepth}, color={color}, "
            f"interlace={interlace})"
        )
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = 1 + w * ch
    raw = raw[: h * stride].reshape(h, stride)
    ftypes = raw[:, 0]
    out = np.zeros((h, w * ch), dtype=np.uint8)
    if not ftypes.any():  # our own encodes: all rows filter 0 — one copy
        out[:] = raw[:, 1:]
    else:
        prev = np.zeros(w * ch, dtype=np.int32)
        for y in range(h):
            f = int(ftypes[y])
            cur = raw[y, 1:].astype(np.int32)
            if f == 0:
                rec = cur
            elif f == 2:  # Up — vectorized
                rec = (cur + prev) & 0xFF
            else:  # Sub/Average/Paeth: leftward dependency → x loop
                rec = np.zeros(w * ch, dtype=np.int32)
                for x in range(w * ch):
                    a = rec[x - ch] if x >= ch else 0
                    up = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    if f == 1:
                        rec[x] = (cur[x] + a) & 0xFF
                    elif f == 3:
                        rec[x] = (cur[x] + ((a + up) >> 1)) & 0xFF
                    elif f == 4:
                        rec[x] = (cur[x] + _paeth(a, up, c)) & 0xFF
                    else:
                        raise ValueError(f"bad PNG filter {f}")
            out[y] = rec.astype(np.uint8)
            prev = rec
    img = out.reshape(h, w, ch)
    return img[:, :, 0].copy() if ch == 1 else img.copy()


# ------------------------------------------------------------- dispatch


def detect_format(b: bytes) -> str | None:
    if b[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if b[:2] == b"BM":
        return "bmp"
    return None


def decode_image(b: bytes) -> np.ndarray:
    fmt = detect_format(b)
    if fmt == "png":
        return decode_png(b)
    if fmt == "bmp":
        return decode_bmp(b)
    raise ValueError("unknown image format (supported: PNG, BMP)")


def resize_box(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average downscale (exact box mean when the factors divide),
    nearest-neighbour when upscaling on either axis — pure numpy."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if out_h > h or out_w > w:  # upscale: box buckets would be empty
        yi = (np.arange(out_h) * h) // out_h
        xi = (np.arange(out_w) * w) // out_w
        return img[yi][:, xi].astype(np.uint8)
    ye = (np.arange(out_h + 1) * h) // out_h
    xe = (np.arange(out_w + 1) * w) // out_w
    csum = np.zeros((h + 1, w + 1, ch), dtype=np.int64)
    csum[1:, 1:] = img.astype(np.int64).cumsum(0).cumsum(1)
    area = (ye[1:, None] - ye[:-1, None]) * (xe[None, 1:] - xe[None, :-1])
    tot = (
        csum[ye[1:, None], xe[None, 1:]]
        - csum[ye[:-1, None], xe[None, 1:]]
        - csum[ye[1:, None], xe[None, :-1]]
        + csum[ye[:-1, None], xe[None, :-1]]
    )
    out = tot // np.maximum(area, 1)[:, :, None]
    return out.astype(np.uint8)

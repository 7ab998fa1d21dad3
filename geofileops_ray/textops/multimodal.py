"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

Two decode paths:

* ``deterministic_fake=True`` — seeded byte-hash features, stable
  across runs/workers AND bit-reproducible in plain SQL (the
  oracle-checked default; audio/video codecs stay out of reach in this
  container).
* ``deterministic_fake=False`` — REAL image decoding via the pure
  numpy+zlib PNG/BMP codec in ``imagecodec.py`` (no external image
  libs needed): decode → pixel features / area-average resize →
  re-encode. ``synth_media_images`` renders real closed-form gradient
  images per media_ref so the path is end-to-end testable without
  fixtures.

Either way the Ray-side plumbing is identical and tested: schema
(media binary + metadata), actor-pool signature (state built once per
actor in ``__init__``), batch sizing for large payloads, and output
layout (fixed-size list<float> feature column).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),  # opaque encoded bytes
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_from_spans(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Extract media spans from interleaved documents into the media
    table shape: one row per span with kind == 'media'. The payload is a
    deterministic byte string derived from media_ref (no real codecs in
    this container)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        spans = batch.column("spans").to_pylist()
        out = {k: [] for k in MEDIA_SCHEMA.names}
        for d, sp in zip(ids, spans):
            for s in sp or []:
                if s["kind"] != "media":
                    continue
                ref = s["media_ref"]
                h = hashlib.md5(ref.encode()).digest()
                out["doc_id"].append(int(d))
                out["media_ref"].append(ref)
                out["media_type"].append("image")
                out["payload"].append(h * 8)  # 128 fake bytes
                out["width"].append(16 + h[0] % 64)
                out["height"].append(16 + h[1] % 64)
                out["duration_ms"].append(0)
        return pa.Table.from_pydict(out, schema=MEDIA_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def render_image(ref: str, fmt: str = "bmp") -> tuple[np.ndarray, bytes]:
    """Deterministic closed-form gradient image for a media_ref:
    pixel[y, x, c] = (ax[c]·x + ay[c]·y + b[c]) mod 256 with coefficients
    from md5(ref) — dims 16..79 like the fake path. Returns (pixels,
    encoded payload)."""
    from .imagecodec import encode_bmp, encode_png

    h_ = hashlib.md5(ref.encode()).digest()
    w, h = 16 + h_[0] % 64, 16 + h_[1] % 64
    ax = np.frombuffer(h_[2:5], np.uint8).astype(np.int64)
    ay = np.frombuffer(h_[5:8], np.uint8).astype(np.int64)
    b = np.frombuffer(h_[8:11], np.uint8).astype(np.int64)
    xs = np.arange(w, dtype=np.int64)[None, :, None]
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    img = ((ax * xs + ay * ys + b) % 256).astype(np.uint8)
    payload = encode_png(img) if fmt == "png" else encode_bmp(img)
    return img, payload


def synth_media_images(
    ds: ray.data.Dataset, fmt: str = "bmp"
) -> ray.data.Dataset:
    """Like synth_media_from_spans but with REAL encoded image payloads
    (PNG or BMP from the stdlib codec) — feeds the
    ``deterministic_fake=False`` decode/feature/resize path."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        spans = batch.column("spans").to_pylist()
        out = {k: [] for k in MEDIA_SCHEMA.names}
        for d, sp in zip(ids, spans):
            for s in sp or []:
                if s["kind"] != "media":
                    continue
                ref = s["media_ref"]
                img, payload = render_image(ref, fmt)
                out["doc_id"].append(int(d))
                out["media_ref"].append(ref)
                out["media_type"].append("image")
                out["payload"].append(payload)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["duration_ms"].append(0)
        return pa.Table.from_pydict(out, schema=MEDIA_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    ``deterministic_fake=False`` decodes PNG/BMP payloads for real
    (stdlib codec, held per actor — the reference's analogue is
    per-connection spatialite init, _sqlite_util.py:1363-1422) and emits
    pixel features: [w/256, h/256, mean(R,G,B)/255, std(R,G,B)/255];
    feat_sum is the exact integer pixel total. Use with
    ``map_batches(MediaFeatureExtractor, concurrency=N, batch_size=B)``
    where B is small (large payloads: B × payload × concurrency must fit
    the worker heap)."""

    FEATURE_DIM = 8

    def __init__(self, deterministic_fake: bool = True):
        self.fake = deterministic_fake
        if not deterministic_fake:
            from .imagecodec import decode_image  # codec state per actor

            self._decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        sums = np.zeros(len(payloads), dtype=np.int64)
        if not self.fake:
            for i, p in enumerate(payloads):
                img = self._decode(p)
                if img.ndim == 2:
                    img = img[:, :, None]
                px = img.reshape(-1, img.shape[2]).astype(np.float64)
                mean = px.mean(axis=0)
                std = px.std(axis=0)
                f = np.zeros(self.FEATURE_DIM, dtype=np.float64)
                f[0] = img.shape[1] / 256.0
                f[1] = img.shape[0] / 256.0
                nc = min(3, px.shape[1])
                f[2 : 2 + nc] = mean[:nc] / 255.0
                f[5 : 5 + nc] = std[:nc] / 255.0
                feats[i] = f.astype(np.float32)
                sums[i] = int(img.sum(dtype=np.int64))
            return self._table(batch, feats, sums)
        for i, p in enumerate(payloads):
            # hash the HEX form so the fake is reproducible in plain SQL
            # (DuckDB md5() is VARCHAR-only): hex(md5(ref)·8) ==
            # repeat(md5(ref), 8) as text
            d = hashlib.md5((p or b"").hex().encode()).digest()
            u16 = np.frombuffer(
                d[: self.FEATURE_DIM * 2], dtype="<u2"
            ).astype(np.int64)
            feats[i] = u16.astype(np.float32) / 65535.0
            sums[i] = int(u16.sum())
        return self._table(batch, feats, sums)

    def _table(self, batch: pa.Table, feats, sums) -> pa.Table:
        flat = pa.array(feats.reshape(-1), pa.float32())
        lists = pa.FixedSizeListArray.from_arrays(flat, self.FEATURE_DIM)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "feature": lists,
                # integer checksum of the u16 lanes — the float32 feature
                # itself can't be compared against double SQL math, the
                # lane sum can (oracle: md5(repeat(md5(ref),8)) bytes)
                "feat_sum": pa.array(sums, pa.int64()),
            }
        )


def extract_media_features(
    ds: ray.data.Dataset,
    concurrency: int = 2,
    batch_size: int = 256,
    real_images: bool = False,
) -> ray.data.Dataset:
    """documents → media rows → actor-pool feature extraction.
    ``real_images=True`` renders + REALLY decodes PNG/BMP payloads
    (stdlib codec); default keeps the SQL-mirrorable hash features."""
    media = (
        synth_media_images(ds) if real_images else synth_media_from_spans(ds)
    )
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={"deterministic_fake": not real_images},
    )


class MediaResizer:
    """Actor-pool stage: decode → resize → re-encode media payloads.

    Same contract as MediaFeatureExtractor: codec/resampler state built
    ONCE in ``__init__`` (per actor), pixel work in ``__call__``.
    ``deterministic_fake=False`` really decodes PNG/BMP, area-average
    resizes (imagecodec.resize_box) and re-encodes in the same format;
    resize_sum is the exact integer pixel total of the resized image.
    The fake path's md5-derived payload scales with the target pixel
    count (so batch-size × payload × concurrency memory sizing is
    exercised either way) and its u16 lane checksum is bit-reproducible
    in SQL."""

    def __init__(self, out_w: int, out_h: int, deterministic_fake: bool = True):
        self.out_w, self.out_h = int(out_w), int(out_h)
        self.fake = deterministic_fake
        if not deterministic_fake:
            from .imagecodec import (
                decode_image,
                detect_format,
                encode_bmp,
                encode_png,
                resize_box,
            )

            self._decode, self._detect = decode_image, detect_format
            self._enc = {"png": encode_png, "bmp": encode_bmp}
            self._resize = resize_box

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out_payloads = []
        sums = np.zeros(len(payloads), dtype=np.int64)
        if not self.fake:
            for i, p in enumerate(payloads):
                fmt = self._detect(p)
                small = self._resize(self._decode(p), self.out_w, self.out_h)
                if small.shape[2] == 1:
                    small = small[:, :, 0]
                out_payloads.append(self._enc[fmt](small))
                sums[i] = int(small.sum(dtype=np.int64))
            return self._table(batch, out_payloads, sums)
        tag = f"{self.out_w}x{self.out_h}".encode()
        npix = self.out_w * self.out_h
        reps = max(1, npix // 16)
        for i, p in enumerate(payloads):
            d = hashlib.md5((p or b"").hex().encode() + tag).digest()
            out_payloads.append(d * reps)
            sums[i] = int(
                np.frombuffer(d, dtype="<u2").astype(np.int64).sum()
            )
        return self._table(batch, out_payloads, sums)

    def _table(self, batch: pa.Table, out_payloads, sums) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "width": pa.array([self.out_w] * len(batch), pa.int32()),
                "height": pa.array([self.out_h] * len(batch), pa.int32()),
                "payload": pa.array(out_payloads, pa.binary()),
                "resize_sum": pa.array(sums, pa.int64()),
            }
        )


def resize_media(
    ds: ray.data.Dataset,
    out_w: int = 32,
    out_h: int = 24,
    concurrency: int = 2,
    batch_size: int = 256,
    real_images: bool = False,
) -> ray.data.Dataset:
    """documents → media rows → actor-pool resize (out_w × out_h).
    ``real_images=True`` = decode → box-resize → re-encode for real."""
    media = (
        synth_media_images(ds) if real_images else synth_media_from_spans(ds)
    )
    return media.map_batches(
        MediaResizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={
            "out_w": out_w,
            "out_h": out_h,
            "deterministic_fake": not real_images,
        },
    )


def render_audio(ref: str, rate: int = 16000) -> tuple[np.ndarray, int]:
    """Deterministic waveform for a media_ref: a square wave with
    hash-seeded period/amplitude/length (mono int16). Returns
    (samples[n], rate)."""
    h_ = hashlib.md5(ref.encode()).digest()
    n = 1600 + int.from_bytes(h_[0:2], "little") % 6400  # 0.1-0.5 s
    period = 8 + h_[2] % 56
    amp = 1000 + int.from_bytes(h_[3:5], "little") % 20000
    t = np.arange(n, dtype=np.int64)
    wave = np.where((t // period) % 2 == 0, amp, -amp).astype(np.int16)
    return wave, rate


def synth_media_audio(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Media spans as REAL WAV payloads (stdlib RIFF/PCM codec) — the
    audio analogue of synth_media_images."""
    from .audiocodec import encode_wav

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        spans = batch.column("spans").to_pylist()
        out = {k: [] for k in MEDIA_SCHEMA.names}
        for d, sp in zip(ids, spans):
            for s in sp or []:
                if s["kind"] != "media":
                    continue
                ref = s["media_ref"]
                wave, rate = render_audio(ref)
                out["doc_id"].append(int(d))
                out["media_ref"].append(ref)
                out["media_type"].append("audio")
                out["payload"].append(encode_wav(wave, rate))
                out["width"].append(0)
                out["height"].append(0)
                out["duration_ms"].append(int(len(wave) * 1000 // rate))
        return pa.Table.from_pydict(out, schema=MEDIA_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class AudioFeatureExtractor:
    """Actor-pool stage: REAL WAV decode → per-clip audio features:
    n_samples, sample_rate, duration_ms, exact integer |x| sum
    (abs_sum), and zero-crossing count — all integer/exact so tests pin
    them against the rendered waveform bit-for-bit."""

    def __init__(self):
        from .audiocodec import decode_wav  # codec per actor

        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ns = np.zeros(len(payloads), np.int64)
        rates = np.zeros(len(payloads), np.int64)
        abs_sums = np.zeros(len(payloads), np.int64)
        zcs = np.zeros(len(payloads), np.int64)
        for i, p in enumerate(payloads):
            wave, rate = self._decode(p)
            mono = wave.astype(np.int64).mean(axis=1).astype(np.int64)
            ns[i], rates[i] = len(mono), rate
            abs_sums[i] = int(np.abs(mono).sum())
            zcs[i] = int(((mono[1:] >= 0) != (mono[:-1] >= 0)).sum())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "n_samples": pa.array(ns, pa.int64()),
                "sample_rate": pa.array(rates, pa.int64()),
                "duration_ms": pa.array(ns * 1000 // np.maximum(rates, 1), pa.int64()),
                "abs_sum": pa.array(abs_sums, pa.int64()),
                "zero_crossings": pa.array(zcs, pa.int64()),
            }
        )


def extract_audio_features(
    ds: ray.data.Dataset, concurrency: int = 2, batch_size: int = 256
) -> ray.data.Dataset:
    """documents → real WAV media rows → actor-pool audio features."""
    media = synth_media_audio(ds)
    return media.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )


def sample_frames(
    ds: ray.data.Dataset, max_frames: int = 4
) -> ray.data.Dataset:
    """Frame sampling for video-like media: each media row explodes into
    ``1 + payload[0] % max_frames`` frame rows (``frame_idx``,
    ``frame_ref = media_ref#idx``) — the Ray-side shape of ffmpeg-style
    strided frame extraction (a flat_map, NOT a shuffle: row expansion
    happens inside the batch). The frame count derives from the payload's
    first byte, so it's SQL-reproducible."""
    media = synth_media_from_spans(ds)

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # np.concatenate([]) raises on zero rows
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "media_ref": pa.array([], pa.string()),
                    "frame_idx": pa.array([], pa.int64()),
                    "frame_ref": pa.array([], pa.string()),
                }
            )
        payloads = batch.column("payload").to_pylist()
        ids = batch.column("doc_id").to_numpy()
        refs = batch.column("media_ref").to_pylist()
        n = np.array(
            [1 + (p[0] if p else 0) % max_frames for p in payloads],
            dtype=np.int64,
        )
        idx = np.concatenate([np.arange(k, dtype=np.int64) for k in n])
        row = np.repeat(np.arange(len(n)), n)
        return pa.table(
            {
                "doc_id": pa.array(ids[row], pa.int64()),
                "media_ref": pa.array([refs[r] for r in row], pa.string()),
                "frame_idx": pa.array(idx, pa.int64()),
                "frame_ref": pa.array(
                    [f"{refs[r]}#{k}" for r, k in zip(row, idx)], pa.string()
                ),
            }
        )

    return media.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

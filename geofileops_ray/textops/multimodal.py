"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The container has no image/audio codecs, so the decode kernels are
STUBBED behind ``deterministic_fake=True`` (a seeded byte-hash feature
— stable across runs/workers) or raise NotImplementedError — but the
Ray-side plumbing is real and tested: schema (media binary + metadata),
actor-pool signature (decoder state built once per actor in
``__init__``), batch sizing for large payloads, and output layout
(fixed-size list<float> feature column).
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


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract media payloads.

    Real deployments pass ``deterministic_fake=False`` and plug a codec
    in ``__init__`` (loaded ONCE per actor — the reference's analogue is
    per-connection spatialite init, _sqlite_util.py:1363-1422). Use with
    ``map_batches(MediaFeatureExtractor, concurrency=N, batch_size=B)``
    where B is small (large payloads: B × payload × concurrency must fit
    the worker heap)."""

    FEATURE_DIM = 8

    def __init__(self, deterministic_fake: bool = True):
        self.fake = deterministic_fake
        if not deterministic_fake:
            raise NotImplementedError(
                "no image/audio codecs in this container; pass "
                "deterministic_fake=True or vendor a codec here"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.zeros((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        sums = np.zeros(len(payloads), dtype=np.int64)
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
    ds: ray.data.Dataset, concurrency: int = 2, batch_size: int = 256
) -> ray.data.Dataset:
    """documents → media rows → actor-pool feature extraction."""
    media = synth_media_from_spans(ds)
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={"deterministic_fake": True},
    )


class MediaResizer:
    """Actor-pool stage: decode → resize → re-encode media payloads.

    Same contract as MediaFeatureExtractor: a real deployment builds its
    codec/resampler ONCE in ``__init__`` (per actor) and does the pixel
    work in ``__call__``; this container has no codecs, so the fake
    "resize" is md5-derived — output payload bytes scale with the target
    pixel count (so batch-size × payload × concurrency memory sizing is
    exercised for real) and the u16 lane checksum of the new payload's
    leading digest is bit-reproducible in SQL."""

    def __init__(self, out_w: int, out_h: int, deterministic_fake: bool = True):
        self.out_w, self.out_h = int(out_w), int(out_h)
        if not deterministic_fake:
            raise NotImplementedError(
                "no image codecs in this container; pass "
                "deterministic_fake=True or vendor a codec here"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        tag = f"{self.out_w}x{self.out_h}".encode()
        npix = self.out_w * self.out_h
        reps = max(1, npix // 16)
        out_payloads = []
        sums = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            d = hashlib.md5((p or b"").hex().encode() + tag).digest()
            out_payloads.append(d * reps)
            sums[i] = int(
                np.frombuffer(d, dtype="<u2").astype(np.int64).sum()
            )
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
) -> ray.data.Dataset:
    """documents → media rows → actor-pool resize (out_w × out_h)."""
    media = synth_media_from_spans(ds)
    return media.map_batches(
        MediaResizer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
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

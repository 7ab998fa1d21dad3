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

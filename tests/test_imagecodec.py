"""Pure-stdlib PNG/BMP codec + the real (non-fake) multimodal decode
path built on it."""

import struct
import zlib

import numpy as np
import pyarrow as pa


def test_bmp_roundtrip_exact():
    from geofileops_ray.textops.imagecodec import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for w, h in [(1, 1), (5, 3), (17, 9), (64, 33)]:  # odd widths: padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all(), (w, h)


def test_png_roundtrip_exact_rgb_rgba_gray():
    from geofileops_ray.textops.imagecodec import decode_png, encode_png

    rng = np.random.default_rng(4)
    rgb = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    rgba = rng.integers(0, 256, (6, 13, 4), dtype=np.uint8)
    gray = rng.integers(0, 256, (9, 5), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()
    assert (decode_png(encode_png(rgba)) == rgba).all()
    assert (decode_png(encode_png(gray)) == gray).all()


def _png_with_filters(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-encode a PNG applying a given filter type per row — the
    decoder must invert all five types (foreign encoders use them)."""
    h, w, ch = img.shape
    rows = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, f in zip(range(h), ftypes):
        cur = img[y].reshape(-1).astype(np.int32)
        enc = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                enc[x] = cur[x]
            elif f == 1:
                enc[x] = cur[x] - a
            elif f == 2:
                enc[x] = cur[x] - up
            elif f == 3:
                enc[x] = cur[x] - ((a + up) >> 1)
            else:
                p = a + up - c
                pa_, pb, pc_ = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else c)
                enc[x] = cur[x] - pred
        rows.append(bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(rows)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    from geofileops_ray.textops.imagecodec import decode_png

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    got = decode_png(_png_with_filters(img, [0, 1, 2, 3, 4]))
    assert (got == img).all()


def test_resize_box_exact_means_and_upscale():
    from geofileops_ray.textops.imagecodec import resize_box

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) % 251
    small = resize_box(img, 4, 4)
    # 2×2 box mean, floor division — check one block exactly
    blk = img[:2, :2].reshape(-1, 3).astype(np.int64)
    assert (small[0, 0] == blk.sum(axis=0) // 4).all()
    up = resize_box(img, 16, 16)  # nearest on upscale
    assert up.shape == (16, 16, 3)
    assert (up[::2, ::2] == img).all()


def test_real_media_pipeline_end_to_end(ray_session):
    """documents → real PNG/BMP payloads → real decode: features carry
    the true dims and exact pixel sum; resize output re-decodes to the
    exact box-resize of the rendered source image."""
    import ray.data

    from geofileops_ray.io.synth import docspans_dataset
    from geofileops_ray.textops.imagecodec import decode_image, resize_box
    from geofileops_ray.textops.multimodal import (
        extract_media_features,
        render_image,
        resize_media,
        synth_media_images,
    )

    sf = "/root/testdata/sf0.001"
    docs = docspans_dataset(sf).limit(60)

    for fmt in ("bmp", "png"):
        media = pa.Table.from_pylist(
            synth_media_images(docs, fmt=fmt).take_all()
        )
        assert media.num_rows > 0
        # every payload decodes to the rendered closed-form image
        for r in media.to_pylist()[:5]:
            img, _ = render_image(r["media_ref"], fmt)
            assert (decode_image(r["payload"]) == img).all()
            assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])

    feats = pa.Table.from_pylist(
        extract_media_features(docs, real_images=True).take_all()
    )
    for r in feats.to_pylist()[:5]:
        img, _ = render_image(r["media_ref"])
        assert r["feat_sum"] == int(img.sum(dtype=np.int64))
        assert abs(r["feature"][0] * 256 - img.shape[1]) < 1e-3
        assert abs(r["feature"][2] * 255 - img[:, :, 0].mean()) < 1e-3

    rs = pa.Table.from_pylist(
        resize_media(docs, out_w=12, out_h=10, real_images=True).take_all()
    )
    for r in rs.to_pylist()[:5]:
        img, _ = render_image(r["media_ref"])
        want = resize_box(img, 12, 10)
        got = decode_image(r["payload"])
        assert (got == want).all()
        assert r["resize_sum"] == int(want.sum(dtype=np.int64))


def test_wav_roundtrip_and_audio_features(ray_session):
    """WAV PCM16 round-trips exactly (mono + stereo + odd-length data
    chunk padding); the real audio feature stage reproduces closed-form
    square-wave stats (|x| sum = n·amp, zero crossings = flips)."""
    import numpy as np
    import pyarrow as pa

    from geofileops_ray.textops.audiocodec import decode_wav, encode_wav

    rng = np.random.default_rng(8)
    mono = rng.integers(-32768, 32767, 999, dtype=np.int16)
    st = rng.integers(-32768, 32767, (500, 2), dtype=np.int16)
    w, r = decode_wav(encode_wav(mono, 8000))
    assert r == 8000 and (w[:, 0] == mono).all()
    w2, r2 = decode_wav(encode_wav(st, 44100))
    assert r2 == 44100 and (w2 == st).all()

    from geofileops_ray.io.synth import docspans_dataset
    from geofileops_ray.textops.multimodal import (
        extract_audio_features,
        render_audio,
    )

    docs = docspans_dataset("/root/testdata/sf0.001").limit(40)
    feats = pa.Table.from_pylist(extract_audio_features(docs).take_all())
    assert feats.num_rows > 0
    for row in feats.to_pylist()[:5]:
        wave, rate = render_audio(row["media_ref"])
        assert row["n_samples"] == len(wave)
        assert row["sample_rate"] == rate
        assert row["abs_sum"] == int(np.abs(wave.astype(np.int64)).sum())
        flips = int(((wave[1:] >= 0) != (wave[:-1] >= 0)).sum())
        assert row["zero_crossings"] == flips

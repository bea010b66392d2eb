"""Real dependency-free image codecs (ops/multimodal.py): BMP 24-bit
BI_RGB and binary Netpbm P5/P6 round-trips, header edge cases, the
strict actor-pool decode stage, and NotImplementedError for compressed
formats (the pillow plug-in slot)."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.ops.multimodal import (
    MediaFeatureExtractor, decode_bmp, decode_image, decode_ppm,
    encode_bmp, encode_ppm, extract_media_features,
    media_table_with_images)


@pytest.mark.parametrize("shape", [(5, 5), (7, 6), (3, 7), (1, 1),
                                   (11, 8), (2, 13)])
def test_bmp_roundtrip(shape):
    # widths 5/6/7/1/8/13 exercise every 4-byte row-padding residue
    rng = np.random.default_rng(sum(shape))
    a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(a)) == a).all()


@pytest.mark.parametrize("gray", [False, True])
def test_ppm_roundtrip(gray):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (9, 5) if gray else (9, 5, 3),
                     dtype=np.uint8)
    assert (decode_ppm(encode_ppm(a)) == a).all()


def test_ppm_header_comments():
    data = b"P5\n# a comment\n 4 2 # inline\n255\n" + bytes(range(8))
    img = decode_ppm(data)
    assert img.shape == (2, 4) and img[1, 3] == 7


def test_bmp_top_down_rows():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    enc = bytearray(encode_bmp(a))
    h = struct.unpack_from("<i", enc, 22)[0]
    struct.pack_into("<i", enc, 22, -h)  # negative height = top-down
    stride = (5 * 3 + 3) & ~3
    px = np.frombuffer(bytes(enc[54:]), dtype=np.uint8)
    flipped = px.reshape(4, stride)[::-1].tobytes()
    assert (decode_bmp(bytes(enc[:54]) + flipped) == a).all()


def test_unsupported_formats_raise():
    for bad in (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0JFIF", b"",
                b"P71234", b"RIFFxxxxWAVE"):
        with pytest.raises(NotImplementedError):
            decode_image(bad)
    # 16-bit Netpbm and truncated rasters are unsupported, not garbage
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P5\n2 2\n65535\n" + bytes(8))
    with pytest.raises(NotImplementedError):
        decode_ppm(b"P6\n4 4\n255\n" + bytes(5))
    with pytest.raises(NotImplementedError):
        decode_bmp(encode_bmp(np.zeros((3, 3, 3), np.uint8))[:40])


def test_strict_stage_decodes_planted_images(ray_session):
    doc = pa.table({"doc_id": pa.array(range(30), type=pa.int64())})
    media = media_table_with_images(doc)
    out = pa.concat_tables(
        extract_media_features(
            ray.data.from_arrow(media), decode="strict", batch_size=8)
        .iter_batches(batch_format="pyarrow")).sort_by("media_id")
    for i in range(30):
        w, h = 8 + i % 9, 8 + (i * 3) % 7
        ch = 1 if i % 3 == 2 else 3
        r = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(w, dtype=np.int64)[None, :, None]
        k = np.arange(ch, dtype=np.int64)[None, None, :]
        px = (i + 31 * r + 17 * c + 97 * k) % 256
        row = out.slice(i, 1).to_pylist()[0]
        assert (row["width"], row["height"], row["channels"]) == (w, h, ch)
        assert row["px_mean"] == pytest.approx(px.mean())
        assert row["px_min"] == px.min() and row["px_max"] == px.max()
        wgt = r[:, :, 0] * 1000 + c[:, :, 0]  # (h,1)+(1,w) broadcast
        assert row["px_wsum"] == int((px.sum(axis=2) * wgt).sum())
        assert len(row["features"]) == 16
        assert sum(row["features"]) == pytest.approx(1.0)


def test_strict_raises_on_non_image_payload(ray_session):
    tbl = pa.table({
        "media_id": pa.array([0], type=pa.int64()),
        "kind": pa.array(["image"], type=pa.string()),
        "payload": pa.array([b"\xffnot-an-image"], type=pa.binary()),
    })
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decode="strict")(tbl)

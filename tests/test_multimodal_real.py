"""REAL image decode through the multimodal pipeline (round-8 advice
item 3): actual PNG payloads flow through _decode_payload and the
mapInPandas feature extraction, with features verified against the
known source pixels — not only the deterministic byte stub.

The decoder is the in-repo pure-stdlib PNG codec (png_codec.py), which
is the PIL fallback in this pip-less container; on a PIL-provisioned
image the identical payloads route through Image.open().convert('L')
and must produce the same luma (the codec uses PIL's exact integer
ITU-R 601-2 formula)."""

from __future__ import annotations

import numpy as np
import pytest

from pot_spark.queries.png_codec import decode_png, encode_png, to_grayscale


def _gray_img(seed: int, h: int = 12, w: int = 9) -> np.ndarray:
    # deterministic integer-arithmetic pattern: gradients + a seed stripe
    y, x = np.mgrid[0:h, 0:w]
    return ((y * 31 + x * 7 + seed * 13) % 256).astype(np.uint8)


def _rgb_img(seed: int, h: int = 7, w: int = 11) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    r = (y * 11 + seed) % 256
    g = (x * 29 + seed * 3) % 256
    b = (y * x + seed * 7) % 256
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_grayscale_all_filters(filter_type):
    img = _gray_img(filter_type + 1)
    assert np.array_equal(decode_png(encode_png(img, filter_type)), img)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_rgb_all_filters(filter_type):
    img = _rgb_img(filter_type + 1)
    assert np.array_equal(decode_png(encode_png(img, filter_type)), img)


def test_png_rejects_unsupported_profiles():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a")
    # 16-bit / palette / interlaced profiles must skip loudly
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr16) & 0xFFFFFFFF)
    bad = sig + struct.pack(">I", len(ihdr16)) + b"IHDR" + ihdr16 + crc
    with pytest.raises(ValueError, match="unsupported PNG profile"):
        decode_png(bad)


def test_grayscale_is_pil_itu601():
    """to_grayscale pins PIL's exact integer convert('L') arithmetic —
    checked against the published formula on boundary values."""
    rgb = np.array(
        [[[255, 255, 255], [0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]],
        dtype=np.uint8,
    )
    want = [
        (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
        for r, g, b in rgb[0].tolist()
    ]
    assert to_grayscale(rgb)[0].tolist() == want


def test_real_decode_through_feature_pipeline(spark):
    """End-to-end: a media table of REAL PNG payloads (grayscale and
    RGB) runs through the production mapInPandas feature extraction;
    byte_mean / byte_max / byte_hist must equal the statistics of the
    known decoded luma pixels."""
    from pot_spark.queries.udfs import _extract_features

    rows = []
    truth = {}
    for i in range(12):
        img = _gray_img(i) if i % 2 == 0 else _rgb_img(i)
        payload = encode_png(img, filter_type=i % 5)
        luma = to_grayscale(img).ravel()
        truth[i] = luma
        rows.append((i, bytearray(payload), "image/png", len(payload)))
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string, n_bytes long"
    )
    out = {
        r.doc_id: r
        for r in media.mapInPandas(
            _extract_features,
            schema=(
                "doc_id long, media_type string, byte_mean double,"
                " byte_max int, byte_hist string"
            ),
        ).collect()
    }
    assert len(out) == 12
    for i, luma in truth.items():
        r = out[i]
        assert r.byte_mean == float(np.round(luma.mean(), 6)), i
        assert r.byte_max == int(luma.max()), i
        hist = np.bincount(luma // 64, minlength=4)[:4]
        assert r.byte_hist == ",".join(str(int(x)) for x in hist), i

"""Multimodal pipeline invariants. Since r10 the registered trio
(features/resize/frames) encodes+decodes REAL PNGs through the
production decode path in-batch and is hash-checked against DuckDB
oracles; the generic binary-payload helpers (_extract_features,
_resize_batches, _frame_sample_batches) remain the arbitrary-media
path and keep their stub-level invariants here."""

from __future__ import annotations


from pot_spark import registry

registry.load_all_query_modules()


def test_resize_emits_fixed_thumbnails(spark, sf_dir):
    df = registry.QUERIES["q_multimodal_resize"](spark, sf_dir)
    rows = df.limit(20).collect()
    assert rows
    for r in rows:
        assert r.side % 8 == 0
        # thumb is a serialized 64-float string (array outputs crash the
        # external harness's canonicalizer)
        vals = [float(x) for x in r.thumb.split(",")]
        assert len(vals) == 64
        assert all(0.0 <= x <= 255.0 for x in vals)


def test_frame_sampling_emits_strided_frames_per_doc(spark, sf_dir):
    """q_multimodal_frames (real-PNG path): 256 decoded pixels / 32 px
    per frame / stride 2 -> exactly frames {0, 2, 4, 6} for EVERY doc."""
    df = registry.QUERIES["q_multimodal_frames"](spark, sf_dir)
    rows = df.collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
        assert 0.0 <= r.frame_mean <= 255.0
        # sum of 32 uint8s / 32: exactly representable in quarters of
        # 1/32 — the mean times 32 must be integral
        assert (r.frame_mean * 32) == int(r.frame_mean * 32)
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == [0, 2, 4, 6], (doc_id, idxs)


def test_png_features_match_direct_decode():
    """The features batch fn's output equals numpy stats of the decoded
    luma of the very PNG it generated — pinned on a handful of doc_ids
    including a negative one (the seed fold must stay non-negative)."""
    import pandas as pd

    from pot_spark.queries.png_codec import decode_png, to_grayscale
    from pot_spark.queries.udfs import _PNG_H, _PNG_W, _png_features_batches
    import numpy as np

    ids = [-3, 0, 1, 4, 257]
    out = next(_png_features_batches(iter([pd.DataFrame({"doc_id": ids})])))
    for i, d in enumerate(ids):
        seed = (d * 13) % 256
        y, x = np.mgrid[0:_PNG_H, 0:_PNG_W]
        img = np.stack(
            [
                (y * 11 + seed) % 256,
                (x * 29 + seed * 3) % 256,
                (y * x + seed * 7) % 256,
            ],
            axis=-1,
        ).astype(np.uint8)
        luma = to_grayscale(img).ravel()
        assert out.loc[i, "byte_mean"] == luma.sum() / 256.0
        assert out.loc[i, "byte_max"] == luma.max()
        hist = np.bincount(luma // 64, minlength=4)[:4]
        assert out.loc[i, "byte_hist"] == ",".join(str(int(v)) for v in hist)


def test_resize_block_mean_known_payload():
    from pot_spark.queries.udfs import _resize_batches
    import pandas as pd

    payload = bytes(range(64))  # 64 bytes -> side 8, blk 1: thumb == bytes
    pdf = pd.DataFrame({"doc_id": [1], "payload": [payload]})
    out = next(_resize_batches(iter([pdf])))
    assert out.loc[0, "side"] == 8
    vals = [float(x) for x in out.loc[0, "thumb"].split(",")]
    assert vals[:8] == [float(x) for x in range(8)]
    assert len(vals) == 64


def test_real_image_decode_gate(monkeypatch):
    """The PIL gate: real image/* types raise a loud NotImplementedError
    when PIL is absent, and route through PIL.Image.open().convert('L')
    when a (faked) module is importable — the stub fixture types never
    touch the gate."""
    import sys
    import types

    import numpy as np
    import pytest

    from pot_spark.queries import udfs

    # fixture types bypass the gate entirely
    assert udfs._decode_payload(b"abc", "image/fake").tolist() == [
        97, 98, 99,
    ]
    # no PIL in this container: image/png falls through to the in-repo
    # stdlib codec (REAL pixels — tests/test_multimodal_real.py); other
    # image types are a loud skip, not silent garbage
    from pot_spark.queries.png_codec import encode_png

    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert udfs._decode_payload(
        encode_png(px), "image/png"
    ).tolist() == px.ravel().tolist()
    with pytest.raises(ValueError, match="not a PNG"):
        udfs._decode_payload(b"\x89PNG...", "image/png")
    with pytest.raises(NotImplementedError, match="PIL not installed"):
        udfs._decode_payload(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError, match="no decoder"):
        udfs._decode_payload(b"RIFF", "audio/wav")

    class FakeImg:
        def __init__(self, payload):
            self.payload = payload

        def convert(self, mode):
            assert mode == "L"
            return np.frombuffer(self.payload, dtype=np.uint8).reshape(2, 2)

    class FakeImage:
        @staticmethod
        def open(buf):
            return FakeImg(buf.read())

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = FakeImage
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image", types.ModuleType("PIL.Image")
    )
    out = udfs._decode_payload(bytes([1, 2, 3, 4]), "image/png")
    assert out.tolist() == [1, 2, 3, 4]  # decoded via the gate, raveled

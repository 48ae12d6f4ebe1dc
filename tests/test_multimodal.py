"""Multimodal plumbing invariants: the decode step is a deterministic
stub (no image/audio libs in this container), but schema, batching and
row-expansion are the real Spark-side contract."""

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


def test_frame_sampling_counts_match_payload_size(spark, sf_dir):
    from pot_spark.queries.udfs import _FRAME_BYTES, _FRAME_STRIDE, build_media_table

    df = registry.QUERIES["q_multimodal_frames"](spark, sf_dir)
    got = {
        (r.doc_id, r.n): None
        for r in df.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    media = build_media_table(spark, sf_dir).filter("media_type = 'audio/fake'")
    for r in media.select("doc_id", "n_bytes").collect():
        n_frames = max(-(-r.n_bytes // _FRAME_BYTES), 1)
        expect = -(-n_frames // _FRAME_STRIDE)
        assert (r.doc_id, expect) in got


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

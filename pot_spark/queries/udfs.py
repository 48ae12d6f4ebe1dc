"""User-defined function surface: vectorized scalar Pandas UDF, grouped
Pandas UDAF, a mapInPandas UDTF, and a cogrouped-map two-table UDF —
plus the multimodal-column plumbing (binary payloads + typed metadata +
Arrow-batched feature extraction).

All Python execution is Arrow-batched (pandas_udf / mapInPandas /
applyInPandas); no row-at-a-time Python UDFs anywhere in the engine.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pot_spark.registry import query
from pot_spark.tables import load, load_spread


@F.pandas_udf(T.DoubleType())
def _score_udf(v: pd.Series) -> pd.Series:
    # score = v*1.1 + ln(1+|v|): same IEEE ops the oracle replays inline.
    return v * 1.1 + np.log(1.0 + np.abs(v))


@query(
    "u_udf_scalar",
    oracle="""
    SELECT event_id, value,
           round(value * 1.1 + ln(1 + abs(value)), 6) AS score
    FROM events
    """,
)
def u_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar Pandas UDF; the oracle recomputes the same
    formula inline (rounded for libm 1-ulp tolerance)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", "value", F.round(_score_udf("value"), 6).alias("score")
    )


def _geomean_group(pdf: pd.DataFrame) -> pd.DataFrame:
    v = pdf["value"].to_numpy(dtype=np.float64)
    # SQL aggregate semantics: NULL (NaN after Arrow transfer)
    # measurements are excluded from the mean — np.mean over the raw
    # array would instead poison the whole group's geo_mean with NaN.
    # n stays COUNT(*) (all rows), matching the oracle.
    ok = v[~np.isnan(v)]
    geo = round(float(np.exp(np.mean(np.log(ok)))), 4) if len(ok) else None
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "geo_mean": [geo],
            "n": [len(v)],
        }
    )


@query(
    "u_udaf",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 4) AS geo_mean,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def u_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDAF (applyInPandas): geometric mean of value
    per event type (values are strictly positive in the fixture). Rounded
    to 4 because numpy's pairwise mean and DuckDB's streaming avg
    accumulate in different orders."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        _geomean_group, schema="event_type string, geo_mean double, n long"
    )


def _tokenize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        if not len(pdf):
            continue
        # null text -> zero rows, matching the oracle (unnest over a NULL
        # list yields nothing); without the drop, NaN split lengths crash
        # the vectorized repeat
        pdf = pdf[pdf["text"].notna()]
        if not len(pdf):
            continue
        toks = pdf["text"].str.split(" ")
        lens = toks.str.len().to_numpy()
        # vectorized expansion: no per-token Python loop
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy().repeat(lens),
                "pos": np.concatenate([np.arange(n, dtype=np.int32) for n in lens]),
                "token": np.concatenate(toks.to_numpy()),
            }
        )
        yield out


@query(
    "u_udtf",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(toks))) - 1 AS INTEGER) AS pos,
           unnest(toks) AS token
    FROM t
    """,
)
def u_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function via mapInPandas: one input row (document) expands to
    one output row per token with its position. Arrow-batched; partition-
    parallel (each batch expands independently — no shuffle)."""
    docs = load_spread(spark, sf_dir, "documents", min_bytes=2_000_000).select("doc_id", "text")
    return docs.mapInPandas(
        _tokenize_batches, schema="doc_id long, pos int, token string"
    )


# ---------------------------------------------------------------------------
# Multimodal columns: binary payload + typed metadata + feature extraction.
# The fixture set has no image/audio files, so payloads are derived
# deterministically from documents.text (utf-8 bytes); a real pipeline swaps
# `_decode_payload` for an actual decoder (PIL/librosa), which is NOT in this
# container — the Spark-side plumbing (schema, batching, partitioning) is
# identical either way.
# ---------------------------------------------------------------------------

MULTIMODAL_SCHEMA = (
    "doc_id long, payload binary, media_type string, n_bytes long"
)


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text -> opaque binary payload column + typed metadata."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image/fake").otherwise("audio/fake").alias(
            "media_type"
        ),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def _pil_image_module():
    """Import-gated PIL binding (absent in this container — the gate is
    exercised in tests under a faked module, the same pattern as the
    GCS/fsspec commit backends)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _decode_payload(payload: bytes, media_type: str) -> np.ndarray:
    """Decoder with a REAL-decode path: the deterministic fake handles
    the fixture's synthetic media types; any real image/* type routes
    through PIL (grayscale uint8 pixels) when importable, and
    image/png additionally through the in-repo pure-stdlib codec
    (png_codec.py) when PIL is absent — so REAL pixels flow through the
    feature pipeline even in this pip-less container (round-8 advice:
    the production decode branch must be exercised, not only the stub).
    The two paths are bit-identical for the supported profile (the
    codec uses PIL's exact integer ITU-R 601-2 luma). Raises
    NotImplementedError for types nothing can decode (a loud skip beats
    silent garbage features)."""
    if media_type in ("image/fake", "audio/fake"):
        return np.frombuffer(payload, dtype=np.uint8)
    if media_type.startswith("image/"):
        image_mod = _pil_image_module()
        if image_mod is not None:
            import io as _io

            img = image_mod.open(_io.BytesIO(payload)).convert("L")
            return np.asarray(img, dtype=np.uint8).ravel()
        if media_type == "image/png":
            from pot_spark.queries.png_codec import decode_png, to_grayscale

            return to_grayscale(decode_png(payload)).ravel()
        raise NotImplementedError(
            f"no decoder for {media_type!r} (PIL not installed)"
        )
    raise NotImplementedError(f"no decoder for {media_type!r}")


def _extract_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads: byte mean /
    max and a 4-bin byte histogram (stand-in for pixel stats / MFCCs)."""
    for pdf in it:
        feats = []
        for payload, mt in zip(pdf["payload"], pdf["media_type"]):
            # NULL payloads decode as zero-byte media, not worker crashes
            arr = _decode_payload(payload if payload is not None else b"", mt)
            if arr.size == 0:
                # zero-byte payload: defined stats instead of numpy's
                # zero-size-reduction crash taking down the whole stage
                feats.append((0.0, 0, "0,0,0,0"))
                continue
            hist = np.bincount(arr // 64, minlength=4)[:4]
            feats.append(
                (
                    float(np.round(arr.mean(), 6)),
                    int(arr.max()),
                    ",".join(str(int(x)) for x in hist),
                )
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_mean": [f[0] for f in feats],
                "byte_max": [f[1] for f in feats],
                "byte_hist": [f[2] for f in feats],
            }
        )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END
             AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary media columns (payload itself
    excluded from the oracle projection — DuckDB hashes blobs differently)."""
    return build_media_table(spark, sf_dir).select("doc_id", "media_type", "n_bytes")


_PNG_H, _PNG_W = 16, 16


def _png_stats_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per doc: ENCODE a deterministic grayscale image to a real PNG,
    run it through the production decode path (_decode_payload with
    media_type image/png — PIL where installed, the stdlib codec here),
    and report integer luma statistics. Both the encode and the decode
    sit INSIDE the measured pipeline, so an oracle computing the same
    statistics straight from the pixel formula proves the whole
    PNG roundtrip lossless, row by row."""
    from pot_spark.queries.png_codec import encode_png

    y, x = np.mgrid[0:_PNG_H, 0:_PNG_W]  # doc-invariant: hoisted (r10)
    base = y * 31 + x * 7
    for pdf in it:
        ids, sums, maxs, hists, nbytes = [], [], [], [], []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            # the seed folds to [0, 256) in PYTHON (arbitrary precision,
            # non-negative remainder) so a negative or huge doc_id can
            # never diverge from the oracle's sign-normalized %
            seed = (d * 13) % 256
            img = ((base + seed) % 256).astype(np.uint8)
            payload = encode_png(img, filter_type=d % 5)
            luma = _decode_payload(payload, "image/png")
            hist = np.bincount(luma // 64, minlength=4)[:4]
            ids.append(d)
            sums.append(int(luma.sum()))
            maxs.append(int(luma.max()))
            hists.append(",".join(str(int(v)) for v in hist))
            nbytes.append(len(payload))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "luma_sum": sums,
                "luma_max": maxs,
                "luma_hist": hists,
                "png_bytes": nbytes,
            }
        )


@query(
    "q_multimodal_png_stats",
    oracle=f"""
    WITH px AS (
        -- sign-normalized %: DuckDB's remainder follows the dividend's
        -- sign, so a negative doc_id would diverge from the Spark
        -- side's non-negative Python % without the +256 fold
        SELECT d.doc_id,
               (y.y * 31 + x.x * 7
                + ((d.doc_id * 13) % 256 + 256) % 256) % 256 AS v
        FROM (SELECT doc_id FROM documents) d,
             (SELECT unnest(generate_series(0, {_PNG_H - 1})) AS y) y,
             (SELECT unnest(generate_series(0, {_PNG_W - 1})) AS x) x
    )
    SELECT doc_id,
           CAST(SUM(v) AS BIGINT) AS luma_sum,
           CAST(MAX(v) AS BIGINT) AS luma_max,
           CAST(SUM(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS VARCHAR)
             || ',' ||
           CAST(SUM(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END)
                AS VARCHAR)
             || ',' ||
           CAST(SUM(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END)
                AS VARCHAR)
             || ',' ||
           CAST(SUM(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS VARCHAR)
             AS luma_hist
    FROM px GROUP BY doc_id
    """,
)
def q_multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-CHECKED real image decode (r9): each doc gets a
    deterministic 16x16 grayscale image, encoded to an actual PNG
    (rotating through all five scanline filters) and decoded back
    through the production decode path inside a mapInPandas batch; the
    DuckDB oracle computes the same integer luma statistics directly
    from the generating formula — so a hash match proves the PNG
    encode/decode roundtrip (and the batching/schema plumbing around
    it) is lossless for every row, not merely deterministic. png_bytes
    is excluded from the oracle projection (compression size is
    zlib-version-dependent); the stats columns are pure integers.

    Scale posture: embarrassingly parallel mapInPandas; decode cost
    scales linearly with executors (the same shape a real corpus-wide
    thumbnailing pass has). The input is EXPLICITLY repartitioned to
    the session's parallelism first: the doc-id list arrives as one
    small parquet split, and without the round-robin fan-out the whole
    Python-side encode/decode would run on a single core (measured:
    5.8 s -> sub-second at sf0.1 on local[32]) — the repartition cost
    is 8 bytes/row against seconds of per-row Python. No reference
    counterpart (SURVEY.md §2-A)."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return docs.mapInPandas(
        _png_stats_batches,
        schema=(
            "doc_id long, luma_sum long, luma_max long, luma_hist string,"
            " png_bytes long"
        ),
    ).drop("png_bytes")


def _png_features_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per doc: encode a deterministic 16x16 RGB image to a real PNG,
    decode it through the production path (_decode_payload ->
    decode_png + the exact integer ITU-R 601-2 to_grayscale), and emit
    the same feature battery as the generic extractor. RGB on purpose:
    unlike q_multimodal_png_stats (grayscale), this pins the
    color->luma conversion too. byte_mean is sum/256 — division by a
    power of two, so the double is EXACT and the DuckDB oracle's
    SUM(v)/256 reproduces it bit-for-bit."""
    from pot_spark.queries.png_codec import encode_png

    y, x = np.mgrid[0:_PNG_H, 0:_PNG_W]  # doc-invariant: hoisted (r10)
    ry, gx, byx = y * 11, x * 29, y * x
    for pdf in it:
        ids, means, maxs, hists = [], [], [], []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            seed = (d * 13) % 256  # Python %: non-negative for any doc_id
            img = np.stack(
                [
                    (ry + seed) % 256,
                    (gx + seed * 3) % 256,
                    (byx + seed * 7) % 256,
                ],
                axis=-1,
            ).astype(np.uint8)
            payload = encode_png(img, filter_type=d % 5)
            luma = _decode_payload(payload, "image/png")
            hist = np.bincount(luma // 64, minlength=4)[:4]
            ids.append(d)
            means.append(float(int(luma.sum()) / 256.0))
            maxs.append(int(luma.max()))
            hists.append(",".join(str(int(v)) for v in hist))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "media_type": "image/png",
                "byte_mean": means,
                "byte_max": pd.Series(maxs, dtype="int32"),
                "byte_hist": hists,
            }
        )


@query(
    "q_multimodal_features",
    oracle=f"""
    WITH px AS (
        -- the Spark side decodes a real RGB PNG; luma is PIL's exact
        -- integer ITU-R 601-2 convert('L'): (r*19595+g*38470+b*7471
        -- +0x8000) >> 16. The +256 fold sign-normalizes the seed for
        -- negative doc_ids (DuckDB % follows the dividend's sign).
        SELECT d.doc_id,
               ((y.y * 11 + d.seed) % 256 * 19595
                + (x.x * 29 + d.seed * 3) % 256 * 38470
                + (y.y * x.x + d.seed * 7) % 256 * 7471
                + 32768) // 65536 AS v
        FROM (SELECT doc_id, ((doc_id * 13) % 256 + 256) % 256 AS seed
              FROM documents) d,
             (SELECT unnest(generate_series(0, {_PNG_H - 1})) AS y) y,
             (SELECT unnest(generate_series(0, {_PNG_W - 1})) AS x) x
    )
    SELECT doc_id,
           'image/png' AS media_type,
           CAST(SUM(v) AS DOUBLE) / 256 AS byte_mean,
           CAST(MAX(v) AS INTEGER) AS byte_max,
           CAST(SUM(CASE WHEN v < 64 THEN 1 ELSE 0 END) AS VARCHAR)
             || ',' ||
           CAST(SUM(CASE WHEN v >= 64 AND v < 128 THEN 1 ELSE 0 END)
                AS VARCHAR)
             || ',' ||
           CAST(SUM(CASE WHEN v >= 128 AND v < 192 THEN 1 ELSE 0 END)
                AS VARCHAR)
             || ',' ||
           CAST(SUM(CASE WHEN v >= 192 THEN 1 ELSE 0 END) AS VARCHAR)
             AS byte_hist
    FROM px GROUP BY doc_id
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-CHECKED real-decode feature extraction (r10, was rows-only):
    each doc gets a deterministic 16x16 RGB image encoded to an actual
    PNG and decoded back through the production path (PIL where
    installed, the in-repo stdlib codec here — bit-identical luma)
    inside the mapInPandas batch; the oracle computes byte_mean /
    byte_max / byte_hist straight from the pixel+luma formula, so a
    hash match proves the color PNG roundtrip AND the ITU-R 601-2
    grayscale conversion lossless for every row. The generic
    binary-payload extractor (_extract_features) remains the
    arbitrary-media path (tests/test_multimodal_real.py drives real
    payloads through it end-to-end). Embarrassingly parallel — the
    doc-id list is repartitioned to the session's parallelism first so
    the Python-side encode/decode uses every core (same rationale as
    q_multimodal_png_stats). No reference counterpart (SURVEY.md §2-A)."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return docs.mapInPandas(
        _png_features_batches,
        schema=(
            "doc_id long, media_type string, byte_mean double, byte_max int,"
            " byte_hist string"
        ),
    )


def _resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Block-mean downsampling to an 8x8 thumbnail: the payload is viewed
    as the largest square uint8 'image' it contains (a real pipeline
    swaps this for PIL decode+resize; the batching/schema is identical)."""
    for pdf in it:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload or b"", dtype=np.uint8)
            side = max(int(np.sqrt(arr.size)) // 8 * 8, 8)
            img = np.resize(arr, (side, side))  # deterministic tiling pad
            blk = side // 8
            thumb = img.reshape(8, blk, 8, blk).mean(axis=(1, 3))
            rows.append(
                (
                    int(doc_id),
                    side,
                    ",".join(format(round(x, 4), "g") for x in thumb.ravel()),
                )
            )
        yield pd.DataFrame(rows, columns=["doc_id", "side", "thumb"])


def _png_resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per doc: encode a deterministic 16x16 grayscale image to a real
    PNG, decode through the production path, block-mean downsample to
    an 8x8 uint8 thumbnail (2x2 block sum floor-divided by 4 — the
    standard integer image resize), and emit the 64 values as a joined
    string in row-major order."""
    from pot_spark.queries.png_codec import encode_png

    y, x = np.mgrid[0:_PNG_H, 0:_PNG_W]  # doc-invariant: hoisted (r10)
    base = y * 13 + x * 5
    for pdf in it:
        ids, thumbs = [], []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            seed = (d * 7) % 256
            img = ((base + seed) % 256).astype(np.uint8)
            payload = encode_png(img, filter_type=d % 5)
            luma = _decode_payload(payload, "image/png").reshape(_PNG_H, _PNG_W)
            thumb = luma.reshape(8, 2, 8, 2).astype(np.int64).sum(axis=(1, 3)) // 4
            ids.append(d)
            thumbs.append(",".join(str(int(v)) for v in thumb.ravel()))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "side": pd.Series([_PNG_H] * len(ids), dtype="int32"),
                "thumb": thumbs,
            }
        )


@query(
    "q_multimodal_resize",
    oracle=f"""
    WITH px AS (
        SELECT d.doc_id, y.y // 2 AS by, x.x // 2 AS bx,
               (y.y * 13 + x.x * 5
                + ((d.doc_id * 7) % 256 + 256) % 256) % 256 AS v
        FROM (SELECT doc_id FROM documents) d,
             (SELECT unnest(generate_series(0, {_PNG_H - 1})) AS y) y,
             (SELECT unnest(generate_series(0, {_PNG_W - 1})) AS x) x
    ),
    blk AS (
        SELECT doc_id, by, bx, SUM(v) // 4 AS bv
        FROM px GROUP BY doc_id, by, bx
    )
    SELECT doc_id,
           CAST({_PNG_H} AS INTEGER) AS side,
           string_agg(CAST(bv AS VARCHAR), ',' ORDER BY by, bx) AS thumb
    FROM blk GROUP BY doc_id
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-CHECKED real-decode image resize (r10, was rows-only): a
    deterministic 16x16 grayscale image per doc, encoded to an actual
    PNG (rotating scanline filters) and decoded back through the
    production path inside the batch, then block-mean downsampled to
    an 8x8 integer thumbnail; the oracle computes the identical
    thumbnail straight from the pixel formula (per-block SUM // 4,
    string_agg in row-major block order), so a hash match proves the
    decode AND the resize arithmetic exact for every row. The generic
    binary-payload resizer (_resize_batches) remains the
    arbitrary-media path. Partition-parallel with no shuffle; the
    doc-id list is repartitioned to the session's parallelism so the
    Python-side codec work spreads across every core."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return docs.mapInPandas(
        _png_resize_batches, schema="doc_id long, side int, thumb string"
    )


_FRAME_BYTES = 256
_FRAME_STRIDE = 4  # keep every 4th frame


def _frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fixed-size frame split + strided sampling (stand-in for video
    keyframe / audio chunk extraction). Row-expanding: one output row per
    sampled frame."""
    for pdf in it:
        ids, idxs, means = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload or b"", dtype=np.uint8)
            n_frames = max((arr.size + _FRAME_BYTES - 1) // _FRAME_BYTES, 1)
            for fi in range(0, n_frames, _FRAME_STRIDE):
                frame = arr[fi * _FRAME_BYTES : (fi + 1) * _FRAME_BYTES]
                ids.append(int(doc_id))
                idxs.append(fi)
                means.append(float(round(frame.mean(), 6)) if frame.size else 0.0)
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_mean": means})


_PNG_FRAME_PX = 32  # pixels per frame over the decoded 256-px stream
_PNG_FRAME_STRIDE = 2  # keep every 2nd frame


def _png_frame_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per doc: encode/decode a real PNG through the production path,
    then frame-split the decoded 256-pixel luma stream (32 px/frame,
    every 2nd kept) — row-expanding, one output row per sampled frame.
    frame_mean is sum/32 (power of two), so the double is exact and
    oracle-reproducible."""
    from pot_spark.queries.png_codec import encode_png

    y, x = np.mgrid[0:_PNG_H, 0:_PNG_W]  # doc-invariant: hoisted (r10)
    base = y * 31 + x * 7
    for pdf in it:
        ids, idxs, means = [], [], []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            seed = (d * 5) % 256
            img = ((base + seed) % 256).astype(np.uint8)
            payload = encode_png(img, filter_type=d % 5)
            luma = _decode_payload(payload, "image/png")
            n_frames = luma.size // _PNG_FRAME_PX
            for fi in range(0, n_frames, _PNG_FRAME_STRIDE):
                frame = luma[fi * _PNG_FRAME_PX : (fi + 1) * _PNG_FRAME_PX]
                ids.append(d)
                idxs.append(fi)
                means.append(float(int(frame.sum()) / _PNG_FRAME_PX))
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_mean": means,
            }
        )


@query(
    "q_multimodal_frames",
    oracle=f"""
    WITH px AS (
        SELECT d.doc_id,
               (y.y * {_PNG_W} + x.x) // {_PNG_FRAME_PX} AS fi,
               (y.y * 31 + x.x * 7
                + ((d.doc_id * 5) % 256 + 256) % 256) % 256 AS v
        FROM (SELECT doc_id FROM documents) d,
             (SELECT unnest(generate_series(0, {_PNG_H - 1})) AS y) y,
             (SELECT unnest(generate_series(0, {_PNG_W - 1})) AS x) x
    )
    SELECT doc_id,
           CAST(fi AS INTEGER) AS frame_idx,
           CAST(SUM(v) AS DOUBLE) / {_PNG_FRAME_PX} AS frame_mean
    FROM px
    WHERE fi % {_PNG_FRAME_STRIDE} = 0
    GROUP BY doc_id, fi
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HASH-CHECKED real-decode frame sampling (r10, was rows-only): a
    real PNG per doc decoded through the production path in-batch, the
    decoded 256-pixel luma stream split into 32-px frames with every
    2nd kept — one output row per sampled frame, the row-expanding
    shape a real ffmpeg keyframe/audio-chunk sampler emits. The oracle
    derives each frame's exact mean (SUM / 32, a power-of-two division
    so the double matches bit-for-bit) straight from the pixel
    formula, so a hash match proves decode + frame arithmetic exact
    for every row. The generic byte-stream sampler
    (_frame_sample_batches) remains the arbitrary-media path.
    Partition-parallel, repartitioned to full parallelism first."""
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return docs.mapInPandas(
        _png_frame_batches, schema="doc_id long, frame_idx int, frame_mean double"
    )


def _token_count_arrow(it):
    """mapInArrow: pyarrow.compute only — no pandas materialization, no
    per-row Python. The C++ kernels split and count in one pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        toks = pc.split_pattern(batch.column("text"), " ")
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), pc.cast(pc.list_value_length(toks), pa.int32())],
            ["doc_id", "n_tokens"],
        )


@query(
    "u_map_in_arrow",
    oracle="""
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def u_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native table function (mapInArrow): token counts computed by
    pyarrow.compute kernels directly on the Arrow batches Spark already
    ships — one less conversion than a Pandas UDF, zero Python-object
    churn. Partition-parallel, no shuffle."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(_token_count_arrow, schema="doc_id long, n_tokens int")


@query("q_hll_sketch")  # sketch bytes are engine-specific -> rows-only check;
#                         tests/test_sketches.py bounds the estimate error
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct-count sketches: per-priority
    partial sketches merged to a global estimate — the pattern that lets
    10^6 partitions compute a distinct count with map-side-combined
    sketch bytes instead of shuffling raw keys. The per-group estimates
    and the merged-global estimate come from the same sketch column."""
    orders = load(spark, sf_dir, "orders")
    sketches = orders.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count("*").alias("n_rows"),
    )
    per_group = sketches.select(
        "o_orderpriority",
        F.hll_sketch_estimate("sk").alias("approx_customers"),
        "n_rows",
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_customers")
    ).select(F.lit("__all__").alias("o_orderpriority"), "approx_customers",
             F.lit(-1).cast("long").alias("n_rows"))
    return per_group.unionByName(merged)


def _reconcile_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Per-customer reconciliation of the customer row against its orders.
    Order totals are quantized to cents and summed exactly (decimal), the
    same arithmetic contract the engine's DECIMAL(18,2) aggregations use,
    so the result hash-matches the oracle's CAST-to-DECIMAL sum."""
    if not len(left):  # orders whose customer is absent: nothing to emit
        return pd.DataFrame(
            {
                "custkey": pd.Series([], dtype="int64"),
                "c_acctbal": pd.Series([], dtype="float64"),
                "n_orders": pd.Series([], dtype="int64"),
                "sum_price": pd.Series([], dtype="float64"),
                "bal_ratio": pd.Series([], dtype="float64"),
            }
        )
    # exact integer-cents summation (o_totalprice carries 2 decimals):
    # equivalent to the DECIMAL(18,2) contract but ~10x cheaper per call
    # than per-row Decimal quantization — per-key Python dispatch is the
    # dominant cogroup cost, keep the body lean
    # skip NULL/NaN prices (v == v filters NaN): a null-priced order
    # contributes nothing to the sum instead of crashing the int cast
    sp = (
        float(
            sum(
                int(round(float(v) * 100))
                for v in right["o_totalprice"]
                if v is not None and v == v
            )
        )
        / 100.0
    )
    bal = float(left["c_acctbal"].iloc[0])
    return pd.DataFrame(
        {
            "custkey": [int(left["c_custkey"].iloc[0])],
            "c_acctbal": [bal],
            "n_orders": [int(len(right))],
            "sum_price": [sp],
            "bal_ratio": [round(bal / sp, 6) if sp != 0.0 else None],
        }
    )


@query(
    "u_cogroup",
    oracle="""
    SELECT c.c_custkey AS custkey,
           c.c_acctbal,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))),
                         0) AS DOUBLE) AS sum_price,
           round(c.c_acctbal /
                 NULLIF(CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))),
                                      0) AS DOUBLE), 0), 6) AS bal_ratio
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey % 10 = 0
    GROUP BY c.c_custkey, c.c_acctbal
    """,
)
def u_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map Pandas UDF (groupBy.cogroup.applyInPandas): both
    tables are shuffled once on the key and each key's two groups arrive
    as a pair of pandas frames — the escape hatch for keyed two-table
    logic no built-in join+agg expresses (custom matching, per-key model
    scoring, reconciliation). Here: account balance vs exact order-total
    sum per customer, including order-less customers (empty right
    group). The key set is bounded to a 10% customer slice: cogroup
    dispatches one Python call per key (~1-2 ms each), which is the
    right price when per-key work is heavy (model scoring) and the
    wrong one for micro-aggregates over every key — the unbounded form
    of this reconciliation belongs to the join+agg the oracle runs."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_acctbal")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 10 == 0)
        .select("o_custkey", "o_totalprice")
    )
    return (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(
            _reconcile_cogroup,
            schema=(
                "custkey long, c_acctbal double, n_orders long,"
                " sum_price double, bal_ratio double"
            ),
        )
    )


@query(
    "u_python_udtf",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(unnest(generate_series(1, len(toks) - 1)) - 1 AS INTEGER) AS pos,
           unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM t WHERE len(toks) >= 2
    """,
)
def u_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native Python UDTF (the @udtf class API, a separate
    surface from mapInPandas): a registered table function expanded with
    SQL LATERAL — each document yields its adjacent-bigram rows. The
    UDTF runs per-partition with no shuffle (lateral expansion is
    pipeline-parallel like any Generate); a real pipeline hangs
    tokenizers or parsers here when the logic doesn't fit column
    expressions. The mapInPandas twin (u_udtf) stays the Arrow-batched
    fast path; this covers the declarative SQL-callable form.

    No reference counterpart: the reference has no extension points at
    all (SURVEY.md §2-A)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("bigrams", Bigrams)
    load_spread(spark, sf_dir, "documents", min_bytes=2_000_000).createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT d.doc_id, b.pos, b.bigram "
        "FROM documents d, LATERAL bigrams(d.text) b"
    )


@query(
    "q_source_binaryfile",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    WHERE doc_id % 10 = 0 AND text IS NOT NULL
      AND octet_length(encode(text)) > 0
    """,
)
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-file source (`spark.read.format("binaryFile")`): the
    ingest path for raw media — each payload written as one opaque file,
    read back distributed as (path, content) rows, identity recovered
    from the filename. This is how images/audio enter the engine before
    the mapInPandas decode stage; at 100 TB the file listing is driver-
    side but the content reads are executor-parallel, and
    `pathGlobFilter`/`recursiveFileLookup` prune at the index. The
    oracle recomputes the expected byte lengths straight from the
    documents table (write->read roundtrip, csv-roundtrip pattern)."""
    import hashlib
    import shutil

    media = build_media_table(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    # cache key = fixture identity (absolute path + source file mtime and
    # size), NOT the dir basename: two fixtures sharing a basename must
    # not collide, and regenerating a fixture in place must invalidate
    src_stat = os.stat(os.path.join(sf_dir, "documents.parquet"))
    cache_key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}:{src_stat.st_mtime_ns}:{src_stat.st_size}".encode()
    ).hexdigest()[:16]
    out = os.path.join(tempfile.gettempdir(), f"pot_spark_binsrc_{cache_key}")
    if not os.path.isdir(out):
        # executor-side staging: each partition writes its own payload
        # files (on a cluster this is a shared filesystem path). Never
        # collect() payloads to the driver — at media scale that is the
        # whole corpus through one process. Stage into a private dir and
        # publish with one atomic rename, so a crashed stager can never
        # leave a half-written (or orphan-carrying) published dir.
        stage = tempfile.mkdtemp(prefix="pot_spark_binsrc_stage_")

        def _write_partition(rows):
            for r in rows:
                # NULL/empty payloads are SKIPPED, not written as
                # zero-byte files: Spark's binaryFile source silently
                # drops 0-byte files from its listing, so writing them
                # would make the sink and the read-back disagree — the
                # skip makes "no bytes -> no media file" the explicit
                # contract (the oracle filters identically)
                if not r["payload"]:
                    continue
                with open(os.path.join(stage, f"{r['doc_id']}.bin"), "wb") as f:
                    f.write(r["payload"])

        media.select("doc_id", "payload").foreachPartition(_write_partition)
        try:
            os.rename(stage, out)
        except OSError:  # a concurrent stager published first
            shutil.rmtree(stage, ignore_errors=True)
    return (
        spark.read.format("binaryFile")
        .load(out)
        .select(
            F.regexp_extract(
                F.col("path"), r"/(\d+)\.bin$", 1
            ).cast("bigint").alias("doc_id"),
            F.col("length").alias("n_bytes"),
        )
    )


@query(
    "q_multimodal_dedup",
    oracle="""
    SELECT md5(text) AS payload_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS n_bytes
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the opaque BINARY payload column — the first pass
    of any media pipeline (identical files dropped before a byte is
    decoded). Hashing happens scan-side on the binary, the shuffle
    carries 32-byte digests + metadata, and — unlike the feature/resize
    stages — this one is fully oracle-checked because md5-of-bytes is
    engine-independent (the oracle hashes the text whose utf-8 encoding
    IS the payload): the multimodal family's hash-verified anchor."""
    media = build_media_table(spark, sf_dir)
    return media.groupBy(F.md5("payload").alias("payload_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
    )


def _rank_in_group(pdf):
    import pandas as pd  # noqa: F401 - worker-side import

    pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
    pdf["rank_in_type"] = pdf.index + 1
    return pdf[["event_id", "event_type", "rank_in_type"]]


@query(
    "u_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY value, event_id) AS BIGINT)
             AS rank_in_type
    FROM events
    """,
)
def u_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (groupBy.applyInPandas): each group
    arrives as one pandas frame and returns an arbitrary-shape frame —
    the escape hatch for per-group logic (model fitting, custom
    resampling, library calls) that no window/agg composition expresses.
    The demo body ranks each group's events by (value, event_id):
    deliberately something a window ALSO expresses, so the DuckDB oracle
    can verify the grouped-map machinery end-to-end — integer ranks over
    a total order, immune to float formatting drift.

    Scale posture: one shuffle on the grouping key (same exchange a
    window would need); groups stream through Arrow in batches. The
    caveat is cardinality-inverse to u_cogroup's: a handful of giant
    groups (here: event types) must each FIT IN ONE WORKER'S MEMORY —
    at 10^9 rows/group this op must re-key to (type, shard) or move to
    the built-in window; the plan shape itself is scale-clean."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        _rank_in_group,
        schema="event_id long, event_type string, rank_in_type long",
    )

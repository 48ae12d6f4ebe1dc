"""Similarity search over the embeddings table: brute-force cosine top-k
(the correctness baseline) and an LSH-bucketed ANN variant (the scale
path).

100 TB design: brute-force is one broadcast of the probe + a linear scan
with a TakeOrdered top-k (no shuffle of the vectors); the ANN variant
prunes the scan to hash-bucket collisions so the per-query cost is
O(candidates), with the buckets computable incrementally at ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pot_spark.registry import query
from pot_spark.session import reliable_checkpoint
from pot_spark.tables import load, load_spread


def _as_double(col: str = "embedding") -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: str, b: str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: str) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


@query(
    "q_sim_topk",
    oracle="""
    WITH probe AS (
        SELECT CAST(embedding AS DOUBLE[]) AS p FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id, label,
           round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), probe.p), 6)
             AS cos_sim
    FROM embeddings, probe
    WHERE vec_id <> 0
    ORDER BY round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), probe.p), 6)
             DESC, vec_id
    LIMIT 10
    """,
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0. The probe is a
    1-row broadcast; orderBy+limit plans as TakeOrderedAndProject (per-
    partition heap, k-row merge) — the whole table is scanned once and
    never shuffled."""
    emb = load_spread(spark, sf_dir, "embeddings", min_bytes=2_000_000)
    probe = emb.filter(F.col("vec_id") == 0).select(_as_double().alias("p"))
    emb_d = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "label", _as_double().alias("v")
    )
    scored = (
        emb_d.join(F.broadcast(probe))
        .select(
            "vec_id",
            "label",
            F.round(_dot("v", "p") / (_norm("v") * _norm("p")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(10)


# Deterministic pseudo-random hyperplanes with INTEGER components:
# w[t][j][d] = ((1 + t*1009 + j*101 + d) * 2654435761) % 2003 - 1001
# (Knuth multiplicative hash — no RNG, no libm; replayable bit-exactly
# on any engine/executor, which is what lets the LSH bucketing carry a
# DuckDB oracle: sin()-derived planes were last-ulp engine-dependent
# at the dot >= 0 boundary).
_N_TABLES = 4
_N_BITS = 6
_DIM = 64
_LSH_MUL = 2654435761
_LSH_MOD = 2003


def _hyperplane(t: int, j: int) -> list[int]:
    return [
        ((1 + t * 1009 + j * 101 + d) * _LSH_MUL) % _LSH_MOD - 1001
        for d in range(_DIM)
    ]


def _lsh_sql() -> str:
    """DuckDB twin of the integer LSH: identical floor(x*1000) vector
    quantization, identical hash-derived integer hyperplanes, identical
    bucket arithmetic — bit-for-bit the same candidate set, then the
    same rounded exact cosine re-rank as q_sim_topk."""
    return f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    iv AS (
        SELECT vec_id, d, CAST(floor(v[d] * 1000) AS BIGINT) AS x
        FROM e, dims
    ),
    w AS (
        SELECT t.t, j.j, dims.d,
               ((1 + t.t * {1009} + j.j * {101} + (dims.d - 1))
                * {_LSH_MUL}) % {_LSH_MOD} - 1001 AS w
        FROM (SELECT unnest(generate_series(0, {_N_TABLES - 1})) AS t) t,
             (SELECT unnest(generate_series(0, {_N_BITS - 1})) AS j) j,
             dims
    ),
    dots AS (
        SELECT iv.vec_id, w.t, w.j, SUM(iv.x * w.w) AS dot
        FROM iv JOIN w ON iv.d = w.d
        GROUP BY iv.vec_id, w.t, w.j
    ),
    buckets AS (
        SELECT vec_id, t,
               SUM(CASE WHEN dot >= 0 THEN (1 << j) ELSE 0 END) AS b
        FROM dots GROUP BY vec_id, t
    ),
    probe AS (SELECT t, b FROM buckets WHERE vec_id = 0),
    cand AS (
        SELECT DISTINCT buckets.vec_id AS vec_id
        FROM buckets JOIN probe
          ON buckets.t = probe.t AND buckets.b = probe.b
        WHERE buckets.vec_id <> 0
    ),
    pv AS (SELECT v AS p FROM e WHERE vec_id = 0)
    SELECT e.vec_id,
           round(list_cosine_similarity(e.v, pv.p), 6) AS cos_sim
    FROM cand JOIN e ON e.vec_id = cand.vec_id, pv
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """


@query("q_sim_ann_lsh", oracle=_lsh_sql())
def q_sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via random-hyperplane LSH: 4 tables x 6-bit signatures. A vector
    lands in one bucket per table; the probe scans only its bucket
    collisions and re-ranks them exactly. At scale the bucket ids are
    precomputed at ingest and the per-query join touches ~n/2^bits rows
    per table instead of n.

    Hash-checked (round 9): the bucketing runs on floor(x*1000) int64
    components against integer hyperplanes, so the candidate set is
    bit-identical cross-engine (the q_ann_pq determinism pattern); the
    re-rank is the exact rounded cosine q_sim_topk already pins. The
    pruning is still genuinely approximate vs brute force — the exact
    re-rank + bucket-collision contract stays pinned by
    test_ann_lsh_scores_exact_and_candidates_subset
    (tests/test_sketches.py)."""
    emb = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    emb = emb.withColumn(
        "ix", F.transform("v", lambda x: F.floor(x * 1000).cast("long"))
    )

    def bucket_col(t: int) -> Column:
        bits = []
        for j in range(_N_BITS):
            plane = F.array(*[F.lit(wv) for wv in _hyperplane(t, j)])
            dot = F.aggregate(
                F.zip_with("ix", plane, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        return acc

    buckets = emb.select(
        "vec_id",
        "v",
        *[bucket_col(t).alias(f"b{t}") for t in range(_N_TABLES)],
    )
    probe = buckets.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("p"), *[F.col(f"b{t}").alias(f"pb{t}") for t in range(_N_TABLES)]
    )
    collide = None
    for t in range(_N_TABLES):
        c = F.col(f"b{t}") == F.col(f"pb{t}")
        collide = c if collide is None else (collide | c)
    cand = (
        buckets.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))
        .filter(collide)
        .select(
            "vec_id",
            F.round(_dot("v", "p") / (_norm("v") * _norm("p")), 6).alias("cos_sim"),
        )
    )
    return cand.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(10)


@query(
    "q_sim_centroid",
    oracle="""
    WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    expanded AS (
        SELECT label, u.d AS d, v[u.d] AS x
        FROM e, (SELECT unnest(generate_series(1, 64)) AS d) u
    )
    SELECT label, d, round(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) AS centroid_val
    FROM expanded
    WHERE d <= 4
    GROUP BY label, d
    """,
)
def q_sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (first 4 dims) — the IVF coarse-
    quantizer build step, expressed as explode + groupBy. Rounded because
    double summation order differs across engines."""
    emb = load(spark, sf_dir, "embeddings").select("label", _as_double().alias("v"))
    exploded = emb.select(
        "label", F.posexplode("v").alias("d0", "x")
    ).select("label", (F.col("d0") + 1).cast("bigint").alias("d"), "x")
    return (
        exploded.filter(F.col("d") <= 4)
        .groupBy("label", "d")
        .agg(F.round(F.sum("x") / F.count("*"), 6).alias("centroid_val"))
    )


@query(
    "q_sim_topk_batch",
    oracle="""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, v AS p FROM e WHERE vec_id < 10),
    scored AS (
        SELECT probes.probe_id, e.vec_id,
               round(list_cosine_similarity(e.v, probes.p), 6) AS cos_sim
        FROM e, probes
        WHERE e.vec_id <> probes.probe_id
    )
    SELECT probe_id, vec_id, cos_sim
    FROM (
        SELECT probe_id, vec_id, cos_sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY cos_sim DESC, vec_id) AS rn
        FROM scored
    )
    WHERE rn <= 5
    """,
)
def q_sim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched similarity search: top-5 cosine neighbors for EACH of 10
    probe vectors in one pass — the probe batch is broadcast, the vector
    table is scanned once (probes x vectors scored in-line), and the
    per-probe top-k is a window partitioned by probe. At scale this is
    the shape of 'embed a query batch, retrieve for all of them': one
    scan amortized over the whole batch instead of k scans."""
    emb = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double().alias("v")
    )
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("p")
    )
    scored = (
        emb.join(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(_dot("v", "p") / (_norm("v") * _norm("p")), 6).alias("cos_sim"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(F.col("cos_sim").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "vec_id", "cos_sim")
    )


_KNN_SQL = """
    SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6)
             AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id <> b.vec_id
    QUALIFY row_number() OVER (
        PARTITION BY a.vec_id
        ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])), 6)
                 DESC, b.vec_id
    ) <= 3
    """


_KNN_SALT = 32  # label keys << cores: spread each block's pair volume


@query("q_knn_graph", oracle=_KNN_SQL)
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN graph build (k=3) within label blocks — the core primitive
    under near-dup clustering and diversity sampling.

    r12 rewrite (the extended true-sf1 tier caught the old plan at
    126x for 10x data — 717 s): same exact output, three physical
    fixes borrowed from q_semdedup's measured pair machinery:

    - FLAT double component columns (x1..x64) with the per-pair dot as
      one whole-stage-codegen `a1*b1 + a2*b2 + ...` chain — no
      interpreted array lambda in the O(block²) hot loop. The chain
      evaluates left-to-right, the same sequential summation order as
      the old F.aggregate fold and DuckDB's list_cosine_similarity, so
      every rounded double is BIT-IDENTICAL to the oracle's.
    - norms precomputed ONCE per vector (the old plan re-folded both
      64-element norms per PAIR — three interpreted folds per pair).
    - the label join SALTED _KNN_SALT ways: there are only a handful of
      label keys, so the unsalted equi-join parked each block's entire
      pair volume on ONE reducer (the dominant term of the 717 s).

    Measured at true-sf1: 717 s -> 26.4 s (sf0.1: 5.7 -> 3.9 s), hash
    output unchanged (oracle green). The r12 Catalyst lesson still
    binds the plan above the pair stage: the cosine is computed INSIDE
    the top-k aggregate and top-3 is sort_array+slice, never a
    Filter-over-Window above a big alias (constraint-derivation
    blow-up, the r12 hang).

    r13 opt (q_semdedup's finding 8 applied to the double-typed pair
    stage): the salted label JOIN + 127-node codegen dot chain became a
    salted label GROUPING whose blocks run as vectorized numpy batches
    in a grouped Arrow op. Bit-exactness of the doubles is preserved by
    construction: the batch accumulates the dot with one IEEE add per
    dimension in ascending order (acc += outer(A[:,d], B[:,d])) — the
    identical operation sequence to the codegen chain a0*b0 + a1*b1 +
    ... and to DuckDB's list_cosine_similarity — and the HALF_UP
    round(·, 6) plus the (cos DESC, nbr ASC) top-3 stay in the JVM: the
    batch only emits a provably-safe candidate SUPERSET per src (every
    nbr with cos >= t3 - 2e-6 where t3 is the 3rd-largest unrounded
    cos; rounding moves any value by <= 5e-7, so nothing below the
    threshold can reach the 3rd rounded rank — NaN cosines are masked
    to -inf for the threshold, which keeps the <3-real-candidates
    degenerate case emitting the whole block exactly like the join
    did). The per-vector norm moved to a flat array fold (same
    ascending-order IEEE sum as the old d-sorted fold), killing the
    posexplode + 65-aggregate pivot and its exchange. Verified
    BIT-IDENTICAL (packed-double compare of every row) at sf0.1 and
    true-sf1; interleaved timing: sf0.1 2.77 -> 1.23 s, sf1 45.9 ->
    8.1 s in the same window. Shuffle bytes are the old join's (probe
    side once, build side replicated _KNN_SALT ways).

    At 100 TB the blocking key swaps from `label` to an LSH bucket or
    IVF cell id (q_sim_ann_lsh / q_sim_ivf) so block sizes stay bounded
    — the graph shape and ranking logic are unchanged."""
    vecs = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "label", _as_double().alias("xs"))
        .select(
            "vec_id",
            "label",
            "xs",
            # same left-to-right IEEE summation order as the oracle's
            # list_cosine_similarity (array order == ascending d)
            F.sqrt(
                F.aggregate("xs", F.lit(0.0), lambda acc, x: acc + x * x)
            ).alias("nrm"),
        )
    )
    a = vecs.select(
        F.lit(0).alias("side"),
        F.pmod(F.col("vec_id"), F.lit(_KNN_SALT)).cast("int").alias("salt"),
        "label",
        "vec_id",
        "nrm",
        "xs",
    )
    b = vecs.select(
        F.lit(1).alias("side"),
        F.explode(F.sequence(F.lit(0), F.lit(_KNN_SALT - 1))).alias("salt"),
        "label",
        "vec_id",
        "nrm",
        "xs",
    )
    both = a.unionByName(b).repartition(
        spark.sparkContext.defaultParallelism, "label", "salt"
    )

    def _knn_block(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "src_id": pd.Series([], dtype="int64"),
                "nbr_id": pd.Series([], dtype="int64"),
                "dot": pd.Series([], dtype="float64"),
                "na": pd.Series([], dtype="float64"),
                "nb": pd.Series([], dtype="float64"),
            }
        )
        left = pdf[pdf["side"] == 0]
        right = pdf[pdf["side"] == 1]
        if len(left) == 0 or len(right) == 0:
            return empty
        A = np.stack(left["xs"].to_numpy()).astype("float64")
        B = np.stack(right["xs"].to_numpy()).astype("float64")
        va = left["vec_id"].to_numpy(dtype="int64")
        vb = right["vec_id"].to_numpy(dtype="int64")
        na = left["nrm"].to_numpy(dtype="float64")
        nb = right["nrm"].to_numpy(dtype="float64")
        # one IEEE add per dimension, ascending — bit-identical to the
        # JVM chain (never a BLAS matmul here: pairwise summation would
        # round differently)
        D = np.multiply.outer(A[:, 0], B[:, 0])
        for d in range(1, A.shape[1]):
            D += np.multiply.outer(A[:, d], B[:, d])
        C = D / np.multiply.outer(na, nb)
        self_mask = va[:, None] == vb[None, :]
        Cm = np.where(self_mask | np.isnan(C), -np.inf, C)
        k = 3
        if Cm.shape[1] > k:
            t3 = np.partition(Cm, -k, axis=1)[:, -k]
        else:
            t3 = np.full(Cm.shape[0], -np.inf)
        keep = (Cm >= (t3[:, None] - 2e-6)) & ~self_mask
        ii, jj = np.nonzero(keep)
        return pd.DataFrame(
            {
                "src_id": va[ii],
                "nbr_id": vb[jj],
                "dot": D[ii, jj],
                "na": na[ii],
                "nb": nb[jj],
            }
        )

    pairs = both.groupBy("label", "salt").applyInPandas(
        _knn_block, "src_id long, nbr_id long, dot double, na double, nb double"
    )
    # Ordering inside the struct: (-cos, nbr_id) ascending == (cos
    # DESC, nbr_id ASC); double negation is sign-exact, so the emitted
    # cos_sim is bit-identical to round(dot/(na*nb), 6). The rounding
    # and ranking run HERE in the JVM over the candidate superset, so
    # Spark's HALF_UP round never has to be replicated in Python.
    neg_cos = -F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
    top = F.slice(
        F.sort_array(
            F.collect_list(
                F.struct(neg_cos.alias("nc"), F.col("nbr_id").alias("nbr"))
            )
        ),
        1,
        3,
    )
    return (
        pairs.groupBy("src_id")
        .agg(top.alias("top3"))
        .select("src_id", F.explode("top3").alias("t"))
        .select(
            "src_id",
            F.col("t.nbr").alias("nbr_id"),
            (-F.col("t.nc")).alias("cos_sim"),
        )
    )


_PR_TELEPORT = 18  # 0.15 scaled by 120
_PR_EDGE = 102  # 0.85 * 120; divisible by every out-degree <= 3


@query(
    "q_pagerank",
    oracle="""
    WITH knn AS (
        SELECT a.vec_id AS src_id, b.vec_id AS nbr_id
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id
        QUALIFY row_number() OVER (
            PARTITION BY a.vec_id
            ORDER BY round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])), 6)
                     DESC, b.vec_id
        ) <= 3
    ),
    deg AS (SELECT src_id AS src, COUNT(*) AS d FROM knn GROUP BY src_id),
    we AS (
        SELECT k.src_id AS src, k.nbr_id AS dst, 102 // d.d AS w
        FROM knn k JOIN deg d ON d.src = k.src_id
    ),
    r1 AS (
        SELECT n.vec_id, 18 + COALESCE(c.s, 0) AS r FROM embeddings n
        LEFT JOIN (SELECT dst, SUM(w) AS s FROM we GROUP BY dst) c
          ON c.dst = n.vec_id
    ),
    r2 AS (
        SELECT n.vec_id, 18 * 120 + COALESCE(c.s, 0) AS r FROM embeddings n
        LEFT JOIN (SELECT w.dst, SUM(w.w * r1.r) AS s
                   FROM we w JOIN r1 ON r1.vec_id = w.src GROUP BY w.dst) c
          ON c.dst = n.vec_id
    ),
    r3 AS (
        SELECT n.vec_id, 18 * 120 * 120 + COALESCE(c.s, 0) AS r FROM embeddings n
        LEFT JOIN (SELECT w.dst, SUM(w.w * r2.r) AS s
                   FROM we w JOIN r2 ON r2.vec_id = w.src GROUP BY w.dst) c
          ON c.dst = n.vec_id
    )
    SELECT vec_id, CAST(r AS BIGINT) AS pr_scaled FROM r3
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the label-blocked k-NN
    graph — the iterative-algorithm pattern (driver loop over DataFrames)
    beyond q_dedup_cluster's closure. All arithmetic is EXACT integers:
    ranks are scaled by 120 per iteration, so the teleport term is 18·120^t
    and each edge carries weight 102/out-degree (102 is divisible by every
    degree ≤ 3) — no float summation order to disagree on, which is what
    lets a fixed-point iteration hash-match across engines. The edge list
    is checkpointed once (the O(block²) knn build never re-runs per
    iteration); each iteration is one shuffle on dst sharing the node
    partitioning."""
    edges = (
        q_knn_graph(spark, sf_dir)
        .select(F.col("src_id").alias("src"), F.col("nbr_id").alias("dst"))
        .transform(reliable_checkpoint)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    we = edges.join(deg, "src").select(
        "src", "dst", F.expr(f"{_PR_EDGE} div d").alias("w")
    )
    nodes = load(spark, sf_dir, "embeddings").select("vec_id")
    r = None  # r_0 = 1 for every node (scaled: 120^0)
    for t in range(3):
        if r is None:
            contrib = we.groupBy("dst").agg(F.sum("w").alias("s"))
        else:
            contrib = (
                we.join(r.withColumnRenamed("vec_id", "src"), "src")
                .groupBy("dst")
                .agg(F.sum(F.col("w") * F.col("r")).alias("s"))
            )
        teleport = _PR_TELEPORT * (120**t)
        r = nodes.join(contrib, nodes.vec_id == contrib.dst, "left").select(
            "vec_id",
            (F.lit(teleport) + F.coalesce("s", F.lit(0))).cast("long").alias("r"),
        )
    return r.select("vec_id", F.col("r").alias("pr_scaled"))


@query(
    "q_embed_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    sc AS (
        SELECT vec_id, label, v,
               list_reduce(list_transform(v, x -> abs(x)),
                           (a, b) -> greatest(a, b)) / 127.0 AS scale
        FROM e
    ),
    q AS (
        SELECT vec_id, label, v, scale,
               list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
                                           ELSE floor(x / scale + 0.5) END) AS qv
        FROM sc
    )
    SELECT vec_id, label,
           CAST(floor(scale * 1000000000.0) AS BIGINT) AS scale_e9,
           CAST(list_reduce(list_prepend(0.0, qv), (a, b) -> a + b) AS BIGINT)
             AS q_sum,
           CAST(list_reduce(list_prepend(-128.0, qv),
                            (a, b) -> greatest(a, b)) AS BIGINT) AS q_max,
           CAST(floor(sqrt(list_reduce(
               list_prepend(0.0,
                   list_transform(list_zip(v, qv),
                       p -> (p[1] - p[2] * scale) * (p[1] - p[2] * scale))),
               (a, b) -> a + b)) * 1000000.0) AS BIGINT) AS recon_err_e6
    FROM q
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric scalar quantization of the embedding column — the
    4x memory-compression step a billion-vector ANN index applies at
    ingest (per-vector scale = max|x|/127, q_i = floor(x_i/scale + .5)) —
    plus the per-vector L2 reconstruction error that tells you whether
    the compressed index can still be trusted for re-ranking. Pure
    per-row higher-order array expressions: one scan, zero shuffles,
    nothing leaves the JVM. Fold order is pinned left-associative in
    both engines (aggregate with 0-init vs list_reduce over a 0-prepended
    list), so the double sums are bit-identical.

    No reference counterpart: petomalina/pot stores opaque JSON
    documents only (SURVEY.md §2-A)."""
    emb = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("v")
    )
    maxabs = F.aggregate(
        F.transform("v", lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    sc = emb.select("vec_id", "label", "v", (maxabs / 127.0).alias("scale"))
    qv = F.transform(
        "v",
        lambda x: F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
            F.floor(x / F.col("scale") + 0.5).cast("double")
        ),
    )
    q = sc.select("vec_id", "label", "v", "scale", qv.alias("qv"))
    err_sq = F.aggregate(
        F.zip_with(
            "v", "qv", lambda x, qi: (x - qi * F.col("scale")) * (x - qi * F.col("scale"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # floor-scaled integers, not round(): Spark rounds the exact binary
    # value via BigDecimal while DuckDB rounds a scaled multiply, and they
    # disagree on boundary values; floor of the same IEEE multiply is
    # bit-deterministic in both engines
    return q.select(
        "vec_id",
        "label",
        F.floor(F.col("scale") * 1000000000.0).cast("bigint").alias("scale_e9"),
        F.aggregate("qv", F.lit(0.0), lambda a, x: a + x)
        .cast("bigint")
        .alias("q_sum"),
        F.aggregate("qv", F.lit(-128.0), lambda a, x: F.greatest(a, x))
        .cast("bigint")
        .alias("q_max"),
        F.floor(F.sqrt(err_sq) * 1000000.0).cast("bigint").alias("recon_err_e6"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): the memory-scale path of billion-vector ANN —
# vectors become m small codebook ids; distances are looked up, not computed.
# ---------------------------------------------------------------------------

_PQ_M = 4  # subspaces
_PQ_SUBDIM = _DIM // _PQ_M  # 16 dims per subspace


def _pq_sql() -> str:
    return f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    iv AS (
        SELECT vec_id, label, d,
               CAST(floor((d - 1) / {_PQ_SUBDIM}) AS INTEGER) AS m,
               CAST(floor(v[d] * 1000) AS BIGINT) AS x
        FROM e, dims
    ),
    cb AS (
        SELECT label AS code, d, CAST(floor((d - 1) / {_PQ_SUBDIM}) AS INTEGER) AS m,
               CAST(floor(SUM(x) * 1.0 / COUNT(*)) AS BIGINT) AS c
        FROM iv GROUP BY label, d
    ),
    dist AS (
        SELECT iv.vec_id, iv.m, cb.code,
               SUM((iv.x - cb.c) * (iv.x - cb.c)) AS sd
        FROM iv JOIN cb ON iv.d = cb.d
        GROUP BY iv.vec_id, iv.m, cb.code
    ),
    enc AS (
        SELECT vec_id, m, code
        FROM dist
        QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY sd, code) = 1
    ),
    pd AS (SELECT m, code, sd AS psd FROM dist WHERE vec_id = 0),
    adc AS (
        SELECT enc.vec_id,
               CAST(SUM(pd.psd) AS BIGINT) AS adc,
               CAST(MAX(CASE WHEN enc.m = 0 THEN enc.code END) AS INTEGER) AS code0,
               CAST(MAX(CASE WHEN enc.m = 1 THEN enc.code END) AS INTEGER) AS code1,
               CAST(MAX(CASE WHEN enc.m = 2 THEN enc.code END) AS INTEGER) AS code2,
               CAST(MAX(CASE WHEN enc.m = 3 THEN enc.code END) AS INTEGER) AS code3
        FROM enc JOIN pd ON enc.m = pd.m AND enc.code = pd.code
        WHERE enc.vec_id <> 0
        GROUP BY enc.vec_id
    )
    SELECT vec_id, code0, code1, code2, code3, adc
    FROM adc ORDER BY adc, vec_id LIMIT 10
    """


@query("q_ann_pq", oracle=_pq_sql())
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: each vector is split into 4
    16-dim subvectors, each encoded as the id of its nearest per-subspace
    codebook centroid (codebooks here are per-label subvector means — the
    deterministic stand-in for trained k-means codebooks), and the probe
    ranks candidates by the ADC (asymmetric-distance-computation) sum of
    4 precomputed sub-distances — a table lookup per subspace
    instead of a 64-dim dot product. This is the memory-scale path of
    billion-vector ANN: the index stores 4 bytes/vector, not 256.

    Determinism: everything runs on floor(x*1000) int64 components —
    codebook build, encode argmin (ties to the lower code id), and ADC
    are exact integer arithmetic, bit-identical on any engine.

    Scale posture: codebooks are tiny (codes x dims — always broadcast);
    encoding is one rollup shuffled on (vec_id, m); at serving time the
    codes are precomputed at ingest and a probe touches only the
    (m x codes) lookup table plus the packed code columns."""
    e = load_spread(spark, sf_dir, "embeddings", min_bytes=2_000_000).select(
        "vec_id", "label", _as_double().alias("v")
    )
    iv = e.select(
        "vec_id",
        "label",
        F.posexplode("v").alias("d0", "xd"),
    ).select(
        "vec_id",
        "label",
        (F.col("d0") + 1).alias("d"),
        (F.col("d0") / _PQ_SUBDIM).cast("int").alias("m"),
        F.floor(F.col("xd") * 1000).cast("bigint").alias("x"),
    )
    cb = (
        iv.groupBy(F.col("label").alias("code"), "d")
        .agg(
            F.floor(F.sum("x") / F.count("*")).cast("bigint").alias("c"),
        )
        .withColumn("m", ((F.col("d") - 1) / _PQ_SUBDIM).cast("int"))
    )
    dist = (
        iv.join(F.broadcast(cb.select("code", "d", "c")), "d")
        .groupBy("vec_id", "m", "code")
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("sd"))
    )
    enc = (
        dist.groupBy("vec_id", "m")
        .agg(F.min(F.struct("sd", "code")).alias("mn"))
        .select("vec_id", "m", F.col("mn.code").alias("code"))
    )
    pd = dist.filter(F.col("vec_id") == 0).select("m", "code", F.col("sd").alias("psd"))
    adc = (
        enc.filter(F.col("vec_id") != 0)
        .join(F.broadcast(pd), ["m", "code"])
        .groupBy("vec_id")
        .agg(
            F.sum("psd").cast("bigint").alias("adc"),
            *[
                F.max(F.when(F.col("m") == i, F.col("code")))
                .cast("int")
                .alias(f"code{i}")
                for i in range(_PQ_M)
            ],
        )
    )
    return adc.select(
        "vec_id", "code0", "code1", "code2", "code3", "adc"
    ).orderBy("adc", "vec_id").limit(10)


# ---------------------------------------------------------------------------
# Lloyd's k-means over integer-quantized vectors: the codebook/IVF training
# loop itself, exact on any engine.
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_ITERS = 2


def _kmeans_cte() -> str:
    """Shared exact-integer k-means CTE chain (through the final
    assignment ``a{_KM_ITERS}``) — one definition of the clustering for
    q_kmeans and q_semdedup, so both oracles agree on every tie-break."""
    parts = [
        f"""e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    iv AS (
        SELECT vec_id, d, CAST(floor(v[d] * 1000) AS BIGINT) AS x
        FROM e, dims
    ),
    c0 AS (SELECT vec_id AS cluster, d, x AS c FROM iv WHERE vec_id < {_KM_K})"""
    ]
    for i in range(1, _KM_ITERS + 1):
        parts.append(f""",
    a{i} AS (
        SELECT iv.vec_id, c.cluster,
               SUM((iv.x - c.c) * (iv.x - c.c)) AS sd
        FROM iv JOIN c{i - 1} c ON iv.d = c.d
        GROUP BY iv.vec_id, c.cluster
        QUALIFY row_number() OVER (PARTITION BY iv.vec_id ORDER BY sd, cluster) = 1
    )""")
        if i < _KM_ITERS:
            parts.append(f""",
    c{i} AS (
        SELECT a.cluster, iv.d,
               CAST(floor(SUM(iv.x) * 1.0 / COUNT(*)) AS BIGINT) AS c
        FROM iv JOIN a{i} a ON iv.vec_id = a.vec_id
        GROUP BY a.cluster, iv.d
    )""")
    return "".join(parts)


def _kmeans_sql() -> str:
    return f"""
    WITH {_kmeans_cte()}
    SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(sd) AS BIGINT) AS inertia
    FROM a{_KM_ITERS} GROUP BY cluster"""


def _emb_int_vectors(spark: SparkSession, sf_dir: str, spread: bool = False):
    """The quantized-vector relation ``(vec_id, xs)`` with ``xs`` the
    int64 ``floor(x*1000)`` component array (JVM arithmetic, the same
    values the exploded ``iv`` stream carries). Empty/null embeddings
    are dropped, matching posexplode's behavior on them."""
    # spread=True round-robins the single-split fixture scan
    # (tables.spread_scan; no-op once the vector table has >= cores
    # splits) so per-row vector math runs on every core.
    if spread:
        e = load_spread(spark, sf_dir, "embeddings")
    else:
        e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.transform(_as_double(), lambda x: F.floor(x * 1000).cast("long")).alias(
            "xs"
        ),
    ).where(F.size("xs") > 0)


def _km_exact_parts(spark: SparkSession, sf_dir: str, spread: bool = False):
    """Shared exact-integer k-means machinery: returns ``(iv, assign)``
    where ``iv`` is the exploded (vec_id, d, x) int64 component table and
    ``assign`` the final (vec_id, cluster, sd) assignment after
    ``_KM_ITERS`` Lloyd iterations (init pinned to vec_id 0..k-1, argmin
    ties to the lower cluster id) — one definition for q_kmeans and
    q_semdedup, mirroring ``_kmeans_cte()`` on the oracle side.

    r13 note (measured, rejected): a collected-centroid rewrite — k x
    dim literals with a flat per-row argmin, zero joins per iteration —
    was built and REVERTED: the ~900-node literal argmin alias sent
    query CONSTRUCTION to 4-16 s/rep (the r12 Catalyst constraint-
    derivation hazard: every rule above the alias re-substitutes it;
    plus two driver collect jobs and a fresh codegen compile per rep,
    since the literals change with the data). The join-based chain
    below plans in milliseconds, its shapes are stable across reps
    (codegen cache hits), and centroid tables stay k x dim broadcasts."""
    # spread=True round-robins the single-split fixture scan before the
    # 64x component explode (tables.spread_scan; no-op once the vector
    # table has >= cores splits). Opt-in because only consumers with a
    # CPU-dense stage pipelined on the scan win: the light Lloyd-only
    # consumers (q_kmeans, q_cluster_purity) measured +40-70% from the
    # extra exchange + per-task overhead across the iterative chain's
    # many tiny stages (r13 bench).
    if spread:
        e = load_spread(spark, sf_dir, "embeddings")
    else:
        e = load(spark, sf_dir, "embeddings")
    e = e.select("vec_id", _as_double().alias("v"))
    iv = e.select("vec_id", F.posexplode("v").alias("d0", "xd")).select(
        "vec_id",
        (F.col("d0") + 1).alias("d"),
        F.floor(F.col("xd") * 1000).cast("bigint").alias("x"),
    )
    cent = iv.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cluster"), "d", F.col("x").alias("c")
    )
    assign = None
    for i in range(_KM_ITERS):
        if i > 0:
            cent = (
                iv.join(assign, "vec_id")
                .groupBy("cluster", "d")
                .agg(F.floor(F.sum("x") / F.count("*")).cast("bigint").alias("c"))
            )
        sd = (
            iv.join(F.broadcast(cent), "d")
            .groupBy("vec_id", "cluster")
            .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("sd"))
        )
        assign = (
            sd.groupBy("vec_id")
            .agg(F.min(F.struct("sd", "cluster")).alias("mn"))
            .select("vec_id", F.col("mn.cluster").alias("cluster"), F.col("mn.sd").alias("sd"))
        )
    return iv, assign


@query("q_kmeans", oracle=_kmeans_sql())
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=4, 2 iterations) — the training
    loop that produces IVF cells and PQ codebooks. Deterministic and
    engine-exact: components are floor(x*1000) int64, distances and
    inertia are exact integer sums, centroid updates floor the exact
    mean, argmin ties break to the lower cluster id, and init is pinned
    to vec_id 0..3 (k-means|| with a fixed seed at scale).

    Scale posture per iteration: centroids are k x dim rows — always a
    broadcast; assignment is one rollup of the exploded components
    (shuffles on (vec_id, cluster), partial-agg'd map-side); the update
    is one rollup on (cluster, d). Nothing driver-side between
    iterations — the loop composes lazily and Spark pipelines it."""
    _iv, assign = _km_exact_parts(spark, sf_dir)
    return assign.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum("sd").cast("bigint").alias("inertia"),
    )


# ---------------------------------------------------------------------------
# Triangle counting over the near-duplicate graph: the clustering-
# coefficient primitive of duplicate-cluster structure analysis.
# ---------------------------------------------------------------------------


def _tri_sql() -> str:
    from pot_spark.queries.llm_dedup import _NEAR_PAIRS_SQL

    return f"""
    WITH knn AS ({_NEAR_PAIRS_SQL}),
    und AS (
        SELECT LEAST(doc_a, doc_b) AS a, GREATEST(doc_a, doc_b) AS b
        FROM knn GROUP BY 1, 2
    ),
    tri AS (
        SELECT e1.a, e1.b, e2.b AS c
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(DISTINCT v) FROM (
               SELECT a AS v FROM und UNION SELECT b FROM und)) AS BIGINT)
             AS n_nodes
    """


@query("q_triangle_count", oracle=_tri_sql())
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the verified near-duplicate graph (node-
    iterator join: wedge a<b<c closed by the a-c edge) plus edge/node
    counts — the clustering-coefficient statistic that tells you whether
    near-dups form tight cliques (template families, mirrored sites) or
    loose chains, which decides how aggressive cluster-collapse dedup
    (q_dedup_cluster) can be. Ordering every edge (a < b) before the
    two-hop join produces each triangle exactly once.

    Scale posture: edges come from q_dedup_near — MinHash-LSH banding,
    so the edge list is O(true dups), never quadratic in the corpus; it
    is checkpointed once and the three join legs reuse the materialized
    relation. Wedge volume is bounded by the dup-cluster degree
    distribution; both joins shuffle on a vertex id. (A k-NN-graph
    variant is the same plan with q_knn_graph edges — bounded-degree by
    construction.)"""
    from pot_spark.queries.llm_dedup import q_dedup_near

    pairs = q_dedup_near(spark, sf_dir)
    # the edge list feeds three join legs and the node count: checkpoint
    # it so the banding+verify pipeline runs once, not four times
    und = reliable_checkpoint(
        pairs.select(
            F.least("doc_a", "doc_b").alias("a"),
            F.greatest("doc_a", "doc_b").alias("b"),
        ).distinct()
    )
    e1 = und
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
    )
    n_tri = tri.agg(F.count("*").alias("n_triangles"))
    n_edges = und.agg(F.count("*").alias("n_edges"))
    n_nodes = und.select(
        F.explode(F.array("a", "b")).alias("v")
    ).agg(F.countDistinct("v").alias("n_nodes"))
    return n_tri.crossJoin(n_edges).crossJoin(n_nodes)


@query(
    "q_hard_negatives",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    a AS (
        SELECT vec_id AS a_id, label AS a_label, v AS va
        FROM e WHERE vec_id < 16
    ),
    p AS (
        SELECT a.a_id, e.vec_id AS nbr_id, e.label AS nbr_label,
               round(list_cosine_similarity(a.va, e.v), 6) AS cos_sim
        FROM a JOIN e ON e.label <> a.a_label
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY a_id
                                     ORDER BY cos_sim DESC, nbr_id) AS rn
        FROM p
    )
    SELECT a_id, nbr_id, nbr_label, cos_sim FROM r WHERE rn <= 2
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: for each
    anchor in the current batch (vec_id < 16 stands in for a training
    microbatch), the two most-similar vectors with a DIFFERENT label —
    the near-miss impostors whose gradients matter, which plain top-k
    retrieval (q_sim_topk_batch) can't produce because its neighbors are
    label-blind. Cosine rounded at 1e-6 with an id tie-break, the same
    engine-exact ranking contract as the other similarity queries.

    Plan shape: the anchor batch broadcasts (BroadcastNestedLoopJoin on
    the label-inequality predicate) into ONE corpus scan; per-anchor
    top-2 is a window partitioned by anchor id. At training scale the
    batch is thousands of anchors, so the pair shuffle keys spread over
    thousands of partitions (anchors ~ partition count — no skew); with
    corpus >> memory the label-inequality join swaps its corpus leg for
    the IVF-pruned cell scan of q_sim_ivf, keeping the window unchanged."""
    e = load_spread(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double().alias("v")
    )
    anchors = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("v").alias("va"),
    )
    pairs = e.join(
        F.broadcast(anchors), F.col("label") != F.col("a_label")
    ).select(
        "a_id",
        F.col("vec_id").alias("nbr_id"),
        F.col("label").alias("nbr_label"),
        F.round(_dot("va", "v") / (_norm("va") * _norm("v")), 6).alias("cos_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a_id").orderBy(F.desc("cos_sim"), F.asc("nbr_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Embedding QA audit: the vector-data-quality pass an embedding pipeline
# runs before indexing — null/NaN payloads and norm drift per label.
# ---------------------------------------------------------------------------


@query(
    "q_embedding_audit",
    oracle="""
    WITH s AS (
        SELECT label,
               embedding IS NULL AS is_null,
               CASE WHEN embedding IS NULL THEN NULL
                    ELSE len(list_filter(embedding,
                             x -> isnan(CAST(x AS DOUBLE)))) > 0
               END AS has_nan,
               CASE WHEN embedding IS NULL THEN NULL
                    WHEN len(list_filter(embedding,
                             x -> isnan(CAST(x AS DOUBLE)))) > 0 THEN NULL
                    ELSE round(sqrt(list_reduce(
                        list_prepend(0.0, list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                        (a, b) -> a + b)), 6)
               END AS norm6
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) FILTER (is_null) AS BIGINT) AS n_null,
           CAST(COUNT(*) FILTER (has_nan) AS BIGINT) AS n_nan,
           MIN(norm6) AS min_norm,
           MAX(norm6) AS max_norm,
           round(CAST(SUM(CAST(norm6 AS DECIMAL(28,12))) AS DOUBLE)
                 / COUNT(norm6), 6) AS avg_norm
    FROM s GROUP BY label
    """,
)
def q_embedding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table QA: per label, the counts an indexer checks before
    building an ANN index — null payloads, NaN-poisoned vectors (one NaN
    silently corrupts every distance it touches), and the L2-norm
    min/max/mean (norm drift is the classic symptom of a bad encoder
    batch). Norms fold sequentially (aggregate vs 0-prepended
    list_reduce — the established engine-exact pattern), round to 6
    before aggregating, and NaN vectors are EXCLUDED from norm stats
    rather than poisoning min/max (engines disagree on NaN ordering).
    Scan-side map work + one label rollup: trivially 100 TB-safe."""
    emb = load(spark, sf_dir, "embeddings")
    v = _as_double()
    has_nan = F.exists(v, lambda x: F.isnan(x))
    norm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    s = emb.select(
        "label",
        F.col("embedding").isNull().alias("is_null"),
        F.when(F.col("embedding").isNotNull(), has_nan).alias("has_nan"),
        F.when(
            F.col("embedding").isNotNull() & ~has_nan, F.round(norm, 6)
        ).alias("norm6"),
    )
    return s.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.count(F.when(F.col("is_null"), 1)).cast("bigint").alias("n_null"),
        F.count(F.when(F.col("has_nan"), 1)).cast("bigint").alias("n_nan"),
        F.min("norm6").alias("min_norm"),
        F.max("norm6").alias("max_norm"),
        F.round(
            F.sum(F.col("norm6").cast("decimal(28,12)")).cast("double")
            / F.count("norm6"),
            6,
        ).alias("avg_norm"),
    )


# ---------------------------------------------------------------------------
# ANN recall measurement: IVF candidates vs exact ground truth on a
# deterministic probe sample.
# ---------------------------------------------------------------------------

_RECALL_MOD = 25  # probe stride: vec_id % 25 == 0 ...
_RECALL_Q = 20  # ... capped at the FIRST 20 such ids (vec_id < 500):
# the sample size is absolute, so the exact ground-truth cost is fixed
# regardless of corpus size — a modulus alone would grow probes (and the
# brute-force scan volume) linearly with the corpus
_RECALL_NPROBE = 2  # IVF cells scanned per probe
_RECALL_K = 10  # recall@K


@query(
    "q_ann_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, v AS p FROM e
               WHERE vec_id % {_RECALL_MOD} = 0
                 AND vec_id < {_RECALL_MOD * _RECALL_Q}),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    comp AS (
        SELECT label, d,
               CAST(SUM(CAST(v[d] AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c
        FROM e, dims GROUP BY label, d
    ),
    pc AS (SELECT probe_id, d, p[d] AS pv FROM probes, dims),
    cellscore AS (
        SELECT probe_id, label,
               CAST(SUM(CAST(c * pv AS DECIMAL(30,12))) AS DOUBLE) AS dot,
               CAST(SUM(CAST(c * c AS DECIMAL(30,12))) AS DOUBLE) AS cc
        FROM comp JOIN pc USING (d) GROUP BY probe_id, label
    ),
    toplab AS (
        SELECT probe_id, label FROM (
            SELECT probe_id, label,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                       ORDER BY dot / sqrt(cc) DESC, label) AS r
            FROM cellscore) WHERE r <= {_RECALL_NPROBE}
    ),
    exact AS (
        SELECT probe_id, vec_id FROM (
            SELECT pr.probe_id, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY pr.probe_id
                       ORDER BY round(list_cosine_similarity(e.v, pr.p), 6)
                                DESC, e.vec_id) AS r
            FROM e, probes pr WHERE e.vec_id <> pr.probe_id
        ) WHERE r <= {_RECALL_K}
    ),
    ivf AS (
        SELECT probe_id, vec_id, n_cand FROM (
            SELECT pr.probe_id, e.vec_id,
                   ROW_NUMBER() OVER (PARTITION BY pr.probe_id
                       ORDER BY round(list_cosine_similarity(e.v, pr.p), 6)
                                DESC, e.vec_id) AS r,
                   COUNT(*) OVER (PARTITION BY pr.probe_id) AS n_cand
            FROM e JOIN toplab tl ON e.label = tl.label
                   JOIN probes pr ON pr.probe_id = tl.probe_id
            WHERE e.vec_id <> pr.probe_id
        ) WHERE r <= {_RECALL_K}
    )
    SELECT CAST(i.probe_id AS BIGINT) AS probe_id,
           CAST(MAX(i.n_cand) AS BIGINT) AS n_cand,
           CAST(COUNT(x.vec_id) AS BIGINT) AS hits_at_10,
           CAST(COUNT(x.vec_id) * 100000 AS BIGINT) AS recall_ppm
    FROM ivf i LEFT JOIN exact x
      ON i.probe_id = x.probe_id AND i.vec_id = x.vec_id
    GROUP BY i.probe_id
    ORDER BY probe_id
    """,
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index (q_sim_ivf's per-label-centroid coarse
    quantizer, nprobe=2 of 10 cells) against exact brute-force ground
    truth, per probe of a deterministic sample (vec_id % 25 == 0) — the
    eval every ANN deployment needs before trusting its index, as a
    query (sibling of q_dedup_audit, which plays this role for the LSH
    dedup family).

    Scale posture: ground truth is sample-bounded BY CONTRACT — exact
    scoring touches |sample| x corpus rows via a broadcast of the probe
    vectors, the same shape as q_sim_topk_batch, and the sample size is
    an absolute cap (first Q stride-selected ids), NOT a fraction of the
    corpus: the 10x smoke on the modulus-only draft measured 9.9x
    because probes grew with the data; the cap fixes the eval cost. The IVF side reuses the real
    index path (broadcast centroid scores -> nprobe-cell scan). Both
    top-10 cuts are per-probe window heaps (WindowGroupLimit), never a
    global sort; centroid components use exact DECIMAL sums so cell
    ranking is engine-identical (q_sim_ivf precedent, driver
    hash-green)."""
    emb = load_spread(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", _as_double().alias("v"))
    probes = e.filter(
        (F.col("vec_id") % _RECALL_MOD == 0)
        & (F.col("vec_id") < _RECALL_MOD * _RECALL_Q)
    ).select(F.col("vec_id").alias("probe_id"), F.col("v").alias("p"))

    # per-(label, dim) centroid components via exact decimal sums
    comp = (
        e.select("label", F.posexplode("v").alias("d0", "x"))
        .select("label", (F.col("d0") + 1).alias("d"), "x")
        .groupBy("label", "d")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("c")
        )
    )
    pc = probes.select(
        "probe_id", F.posexplode("p").alias("d0", "pv")
    ).select("probe_id", (F.col("d0") + 1).alias("d"), "pv")
    cellscore = (
        comp.join(F.broadcast(pc), "d")
        .groupBy("probe_id", "label")
        .agg(
            F.sum((F.col("c") * F.col("pv")).cast("decimal(30,12)"))
            .cast("double")
            .alias("dot"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(30,12)"))
            .cast("double")
            .alias("cc"),
        )
    )
    w_cell = Window.partitionBy("probe_id").orderBy(
        (F.col("dot") / F.sqrt("cc")).desc(), "label"
    )
    toplab = (
        cellscore.withColumn("r", F.row_number().over(w_cell))
        .filter(F.col("r") <= _RECALL_NPROBE)
        .select("probe_id", "label")
    )

    cos = F.round(_dot("v", "p") / (_norm("v") * _norm("p")), 6)
    w_rank = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), "vec_id"
    )
    exact = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") <= _RECALL_K)
        .select("probe_id", "vec_id")
    )
    ivf_scored = (
        e.join(F.broadcast(toplab), "label")
        .join(
            F.broadcast(probes.withColumnRenamed("probe_id", "pid2")),
            (F.col("probe_id") == F.col("pid2"))
            & (F.col("vec_id") != F.col("pid2")),
        )
        .select("probe_id", "vec_id", cos.alias("cos_sim"))
    )
    ivf = (
        ivf_scored.withColumn("r", F.row_number().over(w_rank))
        .withColumn(
            "n_cand", F.count("*").over(Window.partitionBy("probe_id"))
        )
        .filter(F.col("r") <= _RECALL_K)
        .select("probe_id", "vec_id", "n_cand")
    )
    hit = exact.withColumn("hit", F.lit(1)).select("probe_id", "vec_id", "hit")
    return (
        ivf.join(hit, ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.max("n_cand").cast("bigint").alias("n_cand"),
            F.count("hit").cast("bigint").alias("hits_at_10"),
            (F.count("hit") * 100000).cast("bigint").alias("recall_ppm"),
        )
        .orderBy("probe_id")
    )


# ---------------------------------------------------------------------------
# MMR: maximal marginal relevance — diversity-aware top-k selection.
# ---------------------------------------------------------------------------

_MMR_C = 30  # bounded candidate pool (top-C by relevance)
_MMR_K = 10  # selections
_MMR_L = 0.5  # lambda: relevance vs diversity trade-off


@query(
    "q_mmr_select",
    oracle=f"""
    WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                         FROM embeddings),
    probe AS (SELECT v AS p FROM e WHERE vec_id = 0),
    cand AS (
        SELECT vec_id, v, round(list_cosine_similarity(v, probe.p), 6) AS rel
        FROM e, probe WHERE vec_id <> 0
        ORDER BY rel DESC, vec_id LIMIT {_MMR_C}
    ),
    simm AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(a.v, b.v), 6) AS sim
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    sel AS (
        (SELECT 1 AS rank, vec_id AS picked, [vec_id] AS picked_ids,
                rel AS score
         FROM cand ORDER BY rel DESC, vec_id LIMIT 1)
        UNION ALL
        SELECT s.rank + 1, nxt.vec_id, list_append(s.picked_ids, nxt.vec_id),
               nxt.score
        FROM sel s, LATERAL (
            SELECT c.vec_id,
                   {_MMR_L} * c.rel - {1 - _MMR_L} * (
                       SELECT MAX(m.sim) FROM simm m
                       WHERE m.a = c.vec_id
                         AND list_contains(s.picked_ids, m.b)
                   ) AS score
            FROM cand c
            WHERE NOT list_contains(s.picked_ids, c.vec_id)
            ORDER BY score DESC, c.vec_id LIMIT 1
        ) nxt
        WHERE s.rank < {_MMR_K}
    )
    SELECT CAST(rank AS BIGINT) AS rank, CAST(picked AS BIGINT) AS vec_id,
           round(score, 6) AS mmr_score
    FROM sel ORDER BY rank
    """,
)
def q_mmr_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal marginal relevance: greedily select 10 results that
    balance relevance to the probe against redundancy with what's
    already selected (score = λ·rel − (1−λ)·max sim-to-selected,
    λ=0.5) — the standard diversity-aware retrieval / training-example
    selection step (Carbonell & Goldstein, SIGIR 1998).

    Scale posture — MMR is inherently sequential (each pick depends on
    all previous picks), so the scalable shape is: (1) bound the
    candidate pool FIRST with a distributed top-C relevance heap
    (TakeOrderedAndProject over one broadcast-probe corpus scan — the
    only part that sees the corpus); (2) compute the C×C pairwise-sim
    matrix with Spark expressions (broadcast self-join, 870 rows, the
    SAME F.aggregate dot product the hash-green sim family uses, so
    similarity values are engine-exact after round-6); (3) run the
    O(K·C) greedy over the bounded matrix in ONE Arrow batch
    (applyInPandas, single group) that only COMPARES pre-rounded
    doubles — it never recomputes float reductions, so the pandas side
    cannot diverge from the DuckDB recursive-CTE oracle. Final score
    rounding happens in Spark (HALF_UP, matching DuckDB round) rather
    than Python (banker's)."""
    import pandas as pd

    emb = load_spread(spark, sf_dir, "embeddings", min_bytes=2_000_000)
    e = emb.select("vec_id", _as_double().alias("v"))
    probe = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("p"))
    cand = (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probe))
        .select(
            "vec_id",
            "v",
            F.round(_dot("v", "p") / (_norm("v") * _norm("p")), 6).alias(
                "rel"
            ),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(_MMR_C)
    )
    a = cand.select(
        F.col("vec_id").alias("a"), F.col("v").alias("va"), "rel"
    )
    b = cand.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    # LEFT join so a singleton candidate pool still yields its rel row
    # (the oracle's recursion emits rank 1 even with no pairs)
    simm = (
        a.join(F.broadcast(b), F.col("a") != F.col("b"), "left")
        .select(
            "a",
            "b",
            "rel",
            F.round(_dot("va", "vb") / (_norm("va") * _norm("vb")), 6).alias(
                "sim"
            ),
        )
    )

    out_schema = (
        "rank bigint, vec_id bigint, mmr_score_raw double"
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = pdf.groupby("a")["rel"].first().to_dict()
        sim = {
            (r.a, r.b): r.sim
            for r in pdf.itertuples(index=False)
            if pd.notna(r.b)
        }
        remaining = set(rel)
        first = max(remaining, key=lambda i: (rel[i], -i))
        picked = [first]
        scores = [rel[first]]
        remaining.discard(first)
        while remaining and len(picked) < _MMR_K:
            best, best_s = None, None
            for i in sorted(remaining):
                s = _MMR_L * rel[i] - (1 - _MMR_L) * max(
                    sim[(i, p)] for p in picked
                )
                if best is None or s > best_s:
                    best, best_s = i, s
            picked.append(best)
            scores.append(best_s)
            remaining.discard(best)
        return pd.DataFrame(
            {
                "rank": range(1, len(picked) + 1),
                "vec_id": picked,
                "mmr_score_raw": scores,
            }
        )

    return (
        simm.groupBy(F.lit(1).alias("g"))
        .applyInPandas(lambda _k, pdf: greedy(pdf), out_schema)
        .select(
            "rank", "vec_id", F.round("mmr_score_raw", 6).alias("mmr_score")
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication inside k-means cells (Abbas et al.
# 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication"). Cluster the embedding space, then compare pairs ONLY
# within a cell; pairs above the cosine threshold mark the higher-id
# member as a semantic duplicate (deterministic lowest-id keeper in
# place of the paper's keep-farthest-from-centroid, so both engines
# agree on ties). No reference counterpart (SURVEY.md §2-A).
# ---------------------------------------------------------------------------

_SD_TAU2_BP = 2025  # tau = 0.45 -> tau^2 in basis points (0.2025 * 10^4)
_SD_SALT = 32  # pair-join salt width (k cluster keys << cores otherwise)


def _semdedup_cte() -> str:
    """Shared SemDeDup CTE chain (through the duplicate-pair relation
    ``dup``) — one definition of the within-cell cosine dedup for
    q_semdedup and q_d4_select, so both oracles agree on every pair."""
    return f"""{_kmeans_cte()},
    norms AS (SELECT vec_id, SUM(x * x) AS n2 FROM iv GROUP BY vec_id),
    vecs AS (
        SELECT a.vec_id, a.cluster, n.n2,
               list(iv.x ORDER BY iv.d) AS xs
        FROM a{_KM_ITERS} a
        JOIN iv ON iv.vec_id = a.vec_id
        JOIN norms n ON n.vec_id = a.vec_id
        GROUP BY a.vec_id, a.cluster, n.n2
    ),
    pairs AS (
        SELECT a.cluster, a.vec_id AS va, b.vec_id AS vb,
               list_sum(list_transform(range(1, {_DIM} + 1),
                        d -> a.xs[d] * b.xs[d])) AS dot,
               a.n2 AS na2, b.n2 AS nb2
        FROM vecs a JOIN vecs b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    ),
    dup AS (
        SELECT cluster, va, vb FROM pairs
        WHERE dot > 0
          AND CAST(dot AS HUGEINT) * dot * 10000
              >= {_SD_TAU2_BP} * CAST(na2 AS HUGEINT) * nb2
    )"""


def _semdedup_sql() -> str:
    return f"""
    WITH {_semdedup_cte()},
    dupstats AS (
        SELECT cluster, COUNT(*) AS n_dup_pairs,
               COUNT(DISTINCT vb) AS n_dropped
        FROM dup GROUP BY cluster
    ),
    mem AS (SELECT cluster, COUNT(*) AS n_members FROM a{_KM_ITERS} GROUP BY cluster)
    SELECT m.cluster,
           CAST(m.n_members AS BIGINT) AS n_members,
           CAST(COALESCE(dc.n_dropped, 0) AS BIGINT) AS n_dropped,
           CAST(m.n_members - COALESCE(dc.n_dropped, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(dc.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs
    FROM mem m
    LEFT JOIN dupstats dc ON dc.cluster = m.cluster
    ORDER BY m.cluster
    """


@query("q_semdedup", oracle=_semdedup_sql())
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup per-cell report: members, semantic-duplicate pairs
    (cosine >= 0.45 on the exact-int vectors), dropped members (those
    with a lower-id duplicate cluster-mate), and survivors.

    Engine-exact: the cosine test is pure integer arithmetic —
    dot^2 * 10^4 >= tau^2bp * |a|^2 * |b|^2 in decimal(38,0) (Spark) /
    HUGEINT (DuckDB), so no float ever decides a pair.

    100 TB design: this is the published algorithm's own scale argument
    — all-pairs is confined WITHIN a cell, so candidate volume is
    sum(|cell|^2), controlled by choosing k proportional to N (the paper
    uses k=11k cells for 134M embeddings; E[|cell|] stays ~10^4 and each
    cell's pair block fits one executor). The pair stage shuffles once
    on (cluster, salt) carrying int64 component ARRAYS, and each group's
    pair block is ONE vectorized integer matmul in a grouped Arrow op
    (guide §4.2) — r13 opt: per-pair JVM codegen + decimal(38) threshold
    measured 27.6 s at true-sf1, the matmul form 2.4 s, identical rows;
    exactness argument at _semdedup_parts. The dup graph is
    output-bounded, and the final rollups are k-row aggregates. The k=4
    fixture here is the same plan with the cell count turned down.

    The Lloyd assignment is checkpointed: both output branches (pair
    stats + member counts) read it, and it feeds the expensive pair
    stage — without the barrier each branch re-runs the full iterative
    clustering chain."""
    assign, dup = _semdedup_parts(spark, sf_dir)
    # pair count + distinct dropped in ONE aggregate: a second branch
    # over `dup` would re-run the whole pair pipeline (Spark reuses
    # nothing across DataFrame branches without an explicit barrier)
    dupstats = dup.groupBy("cluster").agg(
        F.count("*").alias("n_dup_pairs"),
        F.count_distinct("vb").alias("n_dropped"),
    )
    mem = assign.groupBy("cluster").agg(F.count("*").alias("n_members"))
    return (
        mem.join(dupstats, "cluster", "left")
        .select(
            "cluster",
            "n_members",
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce("n_dup_pairs", F.lit(0)).cast("bigint").alias("n_dup_pairs"),
        )
        .orderBy("cluster")
    )


def _semdedup_parts(spark: SparkSession, sf_dir: str):
    """Shared SemDeDup machinery: returns ``(assign, dup)`` where
    ``assign`` is the CHECKPOINTED Lloyd assignment (vec_id, cluster,
    sd — sd is the exact squared distance to the winning centroid) and
    ``dup`` the within-cell duplicate-pair relation (cluster, va, vb,
    va < vb, integer-exact cosine >= tau) — one definition for
    q_semdedup and q_d4_select, mirroring ``_semdedup_cte()``.

    Pair stage (r13 opt): the within-cell all-pairs dot volume is the
    entire cost of both consumers, and per-pair JVM arithmetic — a
    64-term codegen chain plus a decimal(38,0) threshold — measured
    27.6 s at true-sf1 even with the salted join and AQE-exempt
    partition width. It is now ONE vectorized integer matmul per
    (cluster, salt) group in a grouped Arrow op (guide §4.2: hand whole
    batches to native vectorized code): sf1 27.6 s -> 2.4 s, sf0.1
    9.6 s -> 1.4 s (interleaved best-of-3), rows identical. The shuffle
    is byte-for-byte the old salted join's (probe rows once, build side
    replicated _SD_SALT ways, keyed on (cluster, salt)); only the
    per-pair compute moved from per-row codegen into one BLAS-shaped
    batch per group. Exactness is preserved: components are int64
    (floor(x*1000), computed JVM-side), the int64 fast path uses the
    gcd-reduced test dot^2*400 >= 81*na2*nb2 whose extreme values are
    provably < 2^63 whenever max|x| <= 1500 (dot <= 64*1500^2 = 1.44e8,
    dot^2*400 <= 8.3e18; 81*na2*nb2 <= 1.9e18), and any group beyond
    that bound falls back to exact arbitrary-precision integers — so no
    float and no overflow ever decides a pair, same as the decimal(38)
    form it replaces."""
    _iv, assign0 = _km_exact_parts(spark, sf_dir, spread=True)
    # int64 components in ARRAY form (no 64-column pivot: the old flat-
    # column pivot re-shuffled the exploded iv by vec_id; this derives
    # xs/n2 per row from the same source array with the same JVM
    # floor(x*1000) semantics), joined onto the assignment BEFORE the
    # checkpoint: ONE checkpoint materializes the whole per-vector
    # working set (vec_id, cluster, sd, xs, n2) and every downstream
    # branch (member counts, survivor ranking, both pair-stage sides)
    # reads the materialized relation — zero parquet re-scans below
    # this point
    ex = _emb_int_vectors(spark, sf_dir).select(
        "vec_id",
        "xs",
        F.aggregate("xs", F.lit(0).cast("long"), lambda acc, x: acc + x * x).alias(
            "n2"
        ),
    )
    full = reliable_checkpoint(
        assign0.select("vec_id", "cluster", "sd").join(ex, "vec_id")
    )
    assign = full.select("vec_id", "cluster", "sd")
    m = full.select("vec_id", "cluster", "n2", "xs")
    # salt the pair stage: there are only k cluster keys, so an unsalted
    # grouping lands each cell's whole O(|cell|^2) pair block on ONE
    # task. The probe side carries one salt per row (vec_id mod S); the
    # build side replicates S ways — O(N·S) rows, trivial next to the
    # pair volume it spreads. S=32 measured faster than S=8 at sf1
    # (2.39 vs 3.68 s): group granularity beats replication savings.
    a_side = m.select(
        F.lit(0).alias("side"),
        F.pmod(F.col("vec_id"), F.lit(_SD_SALT)).cast("int").alias("salt"),
        "cluster",
        "vec_id",
        "n2",
        "xs",
    )
    b_side = m.select(
        F.lit(1).alias("side"),
        F.explode(F.sequence(F.lit(0), F.lit(_SD_SALT - 1))).alias("salt"),
        "cluster",
        "vec_id",
        "n2",
        "xs",
    )
    # one union'd relation, both roles tagged by `side`, grouped once on
    # (cluster, salt): a cogrouped two-sided form trips the ambiguous-
    # self-join analyzer (both sides derive from m), and the union
    # shuffles the identical bytes. The explicit AQE-exempt width guards
    # the CPU-quadratic-per-group / bytes-linear mismatch (r13 systemic
    # finding 1) — byte-based coalescing must never serialize the
    # matmul groups.
    both = a_side.unionByName(b_side).repartition(
        spark.sparkContext.defaultParallelism, "cluster", "salt"
    )
    tau2_bp = _SD_TAU2_BP

    def _pair_block(pdf):
        import numpy as np
        import pandas as pd

        left = pdf[pdf["side"] == 0]
        right = pdf[pdf["side"] == 1]
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "cluster": pd.Series([], dtype="int64"),
                    "va": pd.Series([], dtype="int64"),
                    "vb": pd.Series([], dtype="int64"),
                }
            )
        A = np.stack(left["xs"].to_numpy()).astype("int64")
        B = np.stack(right["xs"].to_numpy()).astype("int64")
        va = left["vec_id"].to_numpy(dtype="int64")
        vb = right["vec_id"].to_numpy(dtype="int64")
        na2 = left["n2"].to_numpy(dtype="int64")
        nb2 = right["n2"].to_numpy(dtype="int64")
        mx = max(int(np.abs(A).max()), int(np.abs(B).max()))
        if mx <= 1500:
            # int64-exact: bounds proven in the docstring for this branch
            D = A @ B.T
            ok = (
                (D > 0)
                & (va[:, None] < vb[None, :])
                & (D * D * 400 >= 81 * na2[:, None] * nb2[None, :])
            )
        else:
            # arbitrary-precision exact fallback (never taken on data
            # quantized from ~unit-norm embeddings; keeps the operator
            # overflow-free for ANY input, like the decimal(38) form)
            Do = A.astype(object) @ B.astype(object).T
            ok = (
                (Do > 0)
                & (va[:, None] < vb[None, :])
                & (
                    Do * Do * 10000
                    >= tau2_bp
                    * na2.astype(object)[:, None]
                    * nb2.astype(object)[None, :]
                )
            )
        ii, jj = np.nonzero(ok)
        cl = int(left["cluster"].iloc[0])
        return pd.DataFrame(
            {
                "cluster": np.full(len(ii), cl, dtype="int64"),
                "va": va[ii],
                "vb": vb[jj],
            }
        )

    dup = both.groupBy("cluster", "salt").applyInPandas(
        _pair_block, "cluster long, va long, vb long"
    )
    return assign, dup


def _cluster_purity_sql() -> str:
    return f"""
    WITH {_kmeans_cte()},
    lab AS (
        SELECT a.cluster, e.label, COUNT(*) AS cnt
        FROM a{_KM_ITERS} a JOIN embeddings e ON e.vec_id = a.vec_id
        GROUP BY a.cluster, e.label
    ),
    ranked AS (
        SELECT cluster, label, cnt,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY cnt DESC, label ASC) AS rn,
               SUM(cnt) OVER (PARTITION BY cluster) AS n_members,
               COUNT(*) OVER (PARTITION BY cluster) AS n_labels
        FROM lab
    )
    SELECT cluster,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(label AS INTEGER) AS majority_label,
           CAST(cnt AS BIGINT) AS n_majority,
           CAST(cnt * 1000000 // n_members AS BIGINT) AS purity_ppm,
           CAST(n_labels AS BIGINT) AS n_labels
    FROM ranked WHERE rn = 1 ORDER BY cluster
    """


@query("q_cluster_purity", oracle=_cluster_purity_sql())
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality eval: per k-means cell, the majority ground-
    truth label (ties to the lower label id), its member share in
    floored ppm, and the distinct-label count — the purity metric that
    gates whether an unsupervised index (IVF cells, SemDeDup cells) is
    trusted for downstream routing. Shares the exact-int Lloyd machinery
    with q_kmeans/q_semdedup so all three agree on every assignment.

    100 TB design: the eval is two bounded rollups after the assignment
    — (cluster, label) counts (map-side partials; at most k x |labels|
    rows emerge), then k-row window ranking. Nothing pairwise, nothing
    driver-side; the expensive part is the clustering itself, already
    argued scale-safe at q_kmeans."""
    _iv, assign = _km_exact_parts(spark, sf_dir)
    e = load_spread(spark, sf_dir, "embeddings", min_bytes=2_000_000).select("vec_id", "label")
    lab = (
        assign.select("vec_id", "cluster")
        .join(e, "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count("*").alias("cnt"))
    )
    byc = Window.partitionBy("cluster")
    ranked = lab.select(
        "cluster",
        "label",
        "cnt",
        F.row_number()
        .over(byc.orderBy(F.desc("cnt"), F.asc("label")))
        .alias("rn"),
        F.sum("cnt").over(byc).alias("n_members"),
        F.count("*").over(byc).alias("n_labels"),
    )
    return (
        ranked.where(F.col("rn") == 1)
        .select(
            "cluster",
            F.col("n_members").cast("bigint").alias("n_members"),
            F.col("label").cast("int").alias("majority_label"),
            F.col("cnt").cast("bigint").alias("n_majority"),
            F.expr("cnt * 1000000 div n_members").cast("bigint").alias("purity_ppm"),
            F.col("n_labels").cast("bigint").alias("n_labels"),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# nDCG@10 retrieval eval. DCG discounts 1/log2(i+1) are pre-quantized to
# decimal(14,12) CONSTANTS (identical literals in both engines), so the
# per-probe DCG is an exact decimal sum — shuffle-order-free — and only
# the final dcg/idcg ratio touches IEEE division (correctly rounded,
# engine-exact on identical inputs).
# ---------------------------------------------------------------------------

_NDCG_W = (
    "1.000000000000", "0.630929753571", "0.500000000000", "0.430676558073",
    "0.386852807235", "0.356207187108", "0.333333333333", "0.315464876786",
    "0.301029995664", "0.289064826318",
)
_NDCG_CUM = (
    "1.000000000000", "1.630929753571", "2.130929753571", "2.561606311644",
    "2.948459118879", "3.304666305987", "3.637999639320", "3.953464516106",
    "4.254494511770", "4.543559338088",
)
_NDCG_K = 10


def _ndcg_sql() -> str:
    w_arr = ", ".join(f"CAST({w} AS DECIMAL(14,12))" for w in _NDCG_W)
    cum_arr = ", ".join(f"CAST({c} AS DECIMAL(14,12))" for c in _NDCG_CUM)
    return f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    probes AS (SELECT vec_id AS probe_id, label AS plabel, v AS p FROM e
               WHERE vec_id % {_RECALL_MOD} = 0
                 AND vec_id < {_RECALL_MOD * _RECALL_Q}),
    nrel AS (
        SELECT pr.probe_id, COUNT(*) AS n_rel
        FROM probes pr JOIN e ON e.label = pr.plabel
         AND e.vec_id <> pr.probe_id
        GROUP BY pr.probe_id
    ),
    scored AS (
        SELECT pr.probe_id,
               CASE WHEN e.label = pr.plabel THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (PARTITION BY pr.probe_id
                   ORDER BY round(list_cosine_similarity(e.v, pr.p), 6)
                            DESC, e.vec_id) AS r
        FROM e, probes pr WHERE e.vec_id <> pr.probe_id
    ),
    dcg AS (
        SELECT probe_id,
               SUM(rel * (LIST_VALUE({w_arr}))[r]) AS dcg,
               CAST(SUM(rel) AS BIGINT) AS hits_at_10
        FROM scored WHERE r <= {_NDCG_K} GROUP BY probe_id
    )
    SELECT d.probe_id,
           CAST(n.n_rel AS BIGINT) AS n_rel,
           d.hits_at_10,
           CAST(d.dcg AS DOUBLE) AS dcg,
           CAST(CASE WHEN n.n_rel = 0 THEN 0 ELSE floor(
               CAST(d.dcg AS DOUBLE)
               / CAST((LIST_VALUE({cum_arr}))[least(n.n_rel, {_NDCG_K})]
                      AS DOUBLE) * 1000000) END AS BIGINT) AS ndcg_ppm
    FROM dcg d JOIN nrel n USING (probe_id) ORDER BY d.probe_id
    """


@query("q_ndcg_eval", oracle=_ndcg_sql())
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per probe of the deterministic sample (q_ann_recall's
    stride draw): exact-cosine top-10 ranking, binary relevance = same
    ground-truth label, ideal DCG from the corpus-wide relevant count
    capped at 10 — the graded retrieval metric reported next to
    recall@k for any embedding index.

    Scale posture: ground truth is sample-bounded by contract (broadcast
    probe vectors x one corpus scan — q_sim_topk_batch's shape); the
    per-probe top-10 is a WindowGroupLimit heap; nrel is one label-join
    rollup. DCG is an exact decimal sum of pre-quantized constants, so
    no shuffle order can move a ppm."""
    emb = load_spread(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", _as_double().alias("v"))
    probes = e.filter(
        (F.col("vec_id") % _RECALL_MOD == 0)
        & (F.col("vec_id") < _RECALL_MOD * _RECALL_Q)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("plabel"),
        F.col("v").alias("p"),
    )
    nrel = (
        e.join(
            F.broadcast(probes),
            (F.col("label") == F.col("plabel"))
            & (F.col("vec_id") != F.col("probe_id")),
        )
        .groupBy("probe_id")
        .agg(F.count("*").alias("n_rel"))
    )
    cos = F.round(_dot("v", "p") / (_norm("v") * _norm("p")), 6)
    w_rank = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), "vec_id"
    )
    w_arr = F.expr(
        "array(" + ", ".join(f"CAST({w} AS DECIMAL(14,12))" for w in _NDCG_W) + ")"
    )
    cum_arr = F.expr(
        "array(" + ", ".join(f"CAST({c} AS DECIMAL(14,12))" for c in _NDCG_CUM) + ")"
    )
    top = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            cos.alias("cos_sim"),
            (F.col("label") == F.col("plabel")).cast("int").alias("rel"),
        )
        .withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") <= _NDCG_K)
    )
    dcg = top.groupBy("probe_id").agg(
        F.sum(F.col("rel") * F.element_at(w_arr, F.col("r"))).alias("dcg"),
        F.sum("rel").cast("bigint").alias("hits_at_10"),
    )
    idcg = F.element_at(cum_arr, F.least(F.col("n_rel"), F.lit(_NDCG_K)).cast("int"))
    return (
        dcg.join(nrel, "probe_id")
        .select(
            "probe_id",
            F.col("n_rel").cast("bigint").alias("n_rel"),
            "hits_at_10",
            F.col("dcg").cast("double").alias("dcg"),
            F.when(F.col("n_rel") == 0, F.lit(0))
            .otherwise(
                F.floor(
                    F.col("dcg").cast("double") / idcg.cast("double") * 1000000
                )
            )
            .cast("bigint")
            .alias("ndcg_ppm"),
        )
        .orderBy("probe_id")
    )


_RP_OUT = 8  # output dimensions for the signed random projection


@query(
    "q_random_projection",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    outs AS (SELECT unnest(generate_series(1, {_RP_OUT})) AS j),
    iv AS (
        SELECT vec_id, d, CAST(floor(v[d] * 1000) AS BIGINT) AS x
        FROM e, dims
    ),
    signs AS (
        SELECT d, j,
               CASE WHEN substring(md5(d || '_' || j), 1, 1)
                    IN ('0','1','2','3','4','5','6','7')
               THEN 1 ELSE -1 END AS s
        FROM dims, outs
    ),
    y AS (
        SELECT iv.vec_id, sg.j, SUM(sg.s * iv.x) AS yj
        FROM iv JOIN signs sg ON sg.d = iv.d
        GROUP BY iv.vec_id, sg.j
    ),
    norms AS (
        SELECT vec_id, SUM(x * x) AS x2 FROM iv GROUP BY vec_id
    ),
    per_vec AS (
        SELECT y.vec_id,
               (SUM(yj * yj) * 1000000) // ({_RP_OUT} * n.x2) AS ratio_ppm
        FROM y JOIN norms n ON n.vec_id = y.vec_id
        WHERE n.x2 > 0
        GROUP BY y.vec_id, n.x2
    )
    SELECT e.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(p.ratio_ppm) // COUNT(*) AS BIGINT) AS mean_ratio_ppm,
           CAST(MIN(p.ratio_ppm) AS BIGINT) AS min_ratio_ppm,
           CAST(MAX(p.ratio_ppm) AS BIGINT) AS max_ratio_ppm
    FROM per_vec p JOIN e ON e.vec_id = p.vec_id
    GROUP BY e.label ORDER BY e.label
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed random projection (Achlioptas/JL): project the exact-int
    vectors from {16} to {8} dimensions with a deterministic ±1 matrix
    (sign = md5(d_j) hex-digit parity — identical on both engines, no
    RNG), then audit norm preservation per label: E[|y|²] = d_out·|x|²
    for a ±1 matrix, so ratio_ppm = |y|²·10⁶ / (d_out·|x|²) should
    concentrate at 10⁶ — the dimensionality-reduction sanity gate a
    pipeline runs before trusting projected distances for ANN/dedup.

    Engine-exact end to end: components, the projection, both norms and
    every ratio are int64 arithmetic with floored ppm — no float
    anywhere past the initial component quantization.

    100 TB design: the sign matrix is d_in × d_out rows — always a
    broadcast; the projection is one rollup of the exploded components
    keyed (vec_id, j) with map-side partials (same shape as q_kmeans'
    assignment); norms ride the same scan; the audit is a |labels|-row
    rollup. One corpus-scale pass, two bounded shuffles."""
    emb = load_spread(spark, sf_dir, "embeddings", min_bytes=2_000_000)
    # iv only (no Lloyd assignment): build the component stream directly
    # so the shared machinery's centroid collects never run here
    ev = _emb_int_vectors(spark, sf_dir)
    iv = ev.select("vec_id", F.posexplode("xs").alias("d0", "x")).select(
        "vec_id", (F.col("d0") + 1).alias("d"), "x"
    )
    dims = spark.range(1, _DIM + 1).select(F.col("id").cast("int").alias("d"))
    outs = spark.range(1, _RP_OUT + 1).select(F.col("id").cast("int").alias("j"))
    signs = dims.crossJoin(outs).select(
        "d",
        "j",
        F.when(
            F.substring(
                F.md5(F.concat_ws("_", F.col("d"), F.col("j"))), 1, 1
            ).isin(*"01234567"),
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    y = (
        iv.join(F.broadcast(signs), "d")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("x")).alias("yj"))
    )
    norms = iv.groupBy("vec_id").agg(F.sum(F.col("x") * F.col("x")).alias("x2"))
    per_vec = (
        y.join(norms, "vec_id")
        .where(F.col("x2") > 0)
        .groupBy("vec_id", "x2")
        .agg(F.sum(F.col("yj") * F.col("yj")).alias("y2"))
        .select(
            "vec_id",
            F.expr(f"y2 * 1000000 div ({_RP_OUT} * x2)").alias("ratio_ppm"),
        )
    )
    return (
        per_vec.join(emb.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.expr("sum(ratio_ppm) div count(*)").alias("mean_ratio_ppm"),
            F.min("ratio_ppm").cast("bigint").alias("min_ratio_ppm"),
            F.max("ratio_ppm").cast("bigint").alias("max_ratio_ppm"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# D4 (Tirumala et al. 2023, "D4: Improving LLM Pretraining via Document
# De-Duplication and Diversification"): SemDeDup inside k-means cells,
# then SSL-prototype pruning — drop the most PROTOTYPICAL survivors
# (closest to their cluster centroid), keeping the diverse tail.
# ---------------------------------------------------------------------------

_D4_PROTO_DIV = 4  # prototype-prune the closest 1/4 of each cell's survivors


def _d4_sql() -> str:
    return f"""
    WITH {_semdedup_cte()},
    dropped AS (SELECT DISTINCT vb AS vec_id FROM dup),
    surv AS (
        SELECT a.vec_id, a.cluster, a.sd
        FROM a{_KM_ITERS} a
        WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped)
    ),
    ranked AS (
        SELECT vec_id, cluster, sd,
               ROW_NUMBER() OVER (PARTITION BY cluster
                                  ORDER BY sd ASC, vec_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY cluster) AS n_surv
        FROM surv
    ),
    mem AS (SELECT cluster, COUNT(*) AS n_members
            FROM a{_KM_ITERS} GROUP BY cluster)
    SELECT m.cluster,
           CAST(m.n_members AS BIGINT) AS n_members,
           CAST(m.n_members - COALESCE(MAX(r.n_surv), 0) AS BIGINT)
             AS n_semdedup_dropped,
           CAST(COALESCE(MAX(r.n_surv), 0) // {_D4_PROTO_DIV} AS BIGINT)
             AS n_proto_dropped,
           CAST(COALESCE(MAX(r.n_surv), 0)
                - COALESCE(MAX(r.n_surv), 0) // {_D4_PROTO_DIV} AS BIGINT)
             AS n_kept,
           CAST(COALESCE(MIN(CASE WHEN r.rn > r.n_surv // {_D4_PROTO_DIV}
                                  THEN r.sd END), 0) AS BIGINT)
             AS min_kept_sd
    FROM mem m LEFT JOIN ranked r ON r.cluster = m.cluster
    GROUP BY m.cluster, m.n_members
    ORDER BY m.cluster
    """


@query("q_d4_select", oracle=_d4_sql())
def q_d4_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 selection report per cell: SemDeDup first (drop higher-id
    cosine-duplicates), then prototype-prune the closest quarter of the
    survivors to their centroid (rank by exact integer squared distance,
    ties to lower vec_id) — members, semantic drops, prototype drops,
    final keeps, and the smallest kept distance (the prune boundary).

    Engine-exact: the prototypicality score IS the Lloyd assignment's
    exact integer squared distance (shared machinery with q_kmeans /
    q_semdedup — all oracles agree on every assignment and tie); the
    prune count is integer floor division.

    100 TB design: everything downstream of SemDeDup's pair stage is
    per-cell windowing over SURVIVORS (bounded by cell size, shuffled
    once on cluster) plus k-row rollups; the checkpoint shared with
    q_semdedup keeps the iterative chain single-run. The paper's
    embedding-space argument is unchanged from q_semdedup: k ∝ N keeps
    cells executor-sized."""
    assign, dup = _semdedup_parts(spark, sf_dir)
    dropped = dup.select(F.col("vb").alias("vec_id")).distinct()
    surv = assign.join(dropped, "vec_id", "left_anti")
    byc = Window.partitionBy("cluster")
    ranked = surv.select(
        "cluster",
        "sd",
        F.row_number()
        .over(byc.orderBy(F.asc("sd"), F.asc("vec_id")))
        .alias("rn"),
        F.count("*").over(byc).alias("n_surv"),
    )
    per_cell = ranked.groupBy("cluster").agg(
        F.max("n_surv").alias("n_surv"),
        F.min(
            F.when(
                F.col("rn") > F.expr(f"n_surv div {_D4_PROTO_DIV}"), F.col("sd")
            )
        ).alias("min_kept_sd"),
    )
    mem = assign.groupBy("cluster").agg(F.count("*").alias("n_members"))
    return (
        mem.join(per_cell, "cluster", "left")
        .select(
            "cluster",
            F.col("n_members").cast("bigint").alias("n_members"),
            (F.col("n_members") - F.coalesce("n_surv", F.lit(0)))
            .cast("bigint")
            .alias("n_semdedup_dropped"),
            F.expr(f"coalesce(n_surv, 0) div {_D4_PROTO_DIV}")
            .cast("bigint")
            .alias("n_proto_dropped"),
            F.expr(
                f"coalesce(n_surv, 0) - coalesce(n_surv, 0) div {_D4_PROTO_DIV}"
            )
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce("min_kept_sd", F.lit(0)).cast("bigint").alias("min_kept_sd"),
        )
        .orderBy("cluster")
    )


@query(
    "q_centroid_drift",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, vec_id % 2 AS half,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    ),
    comp AS (
      SELECT label, d, x
      FROM e, LATERAL (
        SELECT unnest(generate_series(1, len(v))) AS d
      ) u, LATERAL (SELECT v[d] AS x) w
      WHERE half = 0
    ),
    comp1 AS (
      SELECT label, d, x
      FROM e, LATERAL (
        SELECT unnest(generate_series(1, len(v))) AS d
      ) u, LATERAL (SELECT v[d] AS x) w
      WHERE half = 1
    ),
    n AS (
      SELECT label,
             CAST(COUNT(CASE WHEN half = 0 THEN 1 END) AS BIGINT) AS n_even,
             CAST(COUNT(CASE WHEN half = 1 THEN 1 END) AS BIGINT) AS n_odd
      FROM e GROUP BY label
    ),
    ce AS (
      SELECT label, d,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c
      FROM comp GROUP BY label, d
    ),
    co AS (
      SELECT label, d,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS c
      FROM comp1 GROUP BY label, d
    ),
    dots AS (
      SELECT ce.label,
             CAST(SUM(CAST(ce.c * co.c AS DECIMAL(30,12))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(ce.c * ce.c AS DECIMAL(30,12))) AS DOUBLE) AS ee,
             CAST(SUM(CAST(co.c * co.c AS DECIMAL(30,12))) AS DOUBLE) AS oo
      FROM ce JOIN co ON ce.label = co.label AND ce.d = co.d
      GROUP BY ce.label
    )
    SELECT n.label, n.n_even, n.n_odd,
           ROUND(d.dot / (sqrt(d.ee) * sqrt(d.oo)), 6) AS centroid_cosine
    FROM n JOIN dots d ON d.label = n.label
    WHERE n.n_even > 0 AND n.n_odd > 0
    """,
)
def q_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-pipeline DRIFT audit: split each label's vectors into
    two deterministic halves (vec_id parity — standing in for
    yesterday's vs today's embedding batch) and report the cosine
    between the two half-centroids. A label whose halves' centroids
    diverge flags an embedding-model version change or an upstream
    content shift before it poisons the ANN index — the vector-space
    twin of q_corpus_drift.

    Scale posture: one posexplode scan partial-aggregates to
    (label, dim) centroid components — type-scale output (labels x
    dims), everything after is free. Component sums and the cosine's
    dot/norm sums accumulate in exact DECIMAL (order-independent across
    partitions; q_ann_recall precedent), converted to double only for
    the final IEEE-exact division and sqrt, rounded to 6dp on both
    engines. Labels missing a half are excluded identically (no NULL
    cosine rows). No reference counterpart (SURVEY.md §2-A)."""
    emb = load_spread(spark, sf_dir, "embeddings", min_bytes=2_000_000)
    e = emb.filter(
        F.col("embedding").isNotNull() & F.col("vec_id").isNotNull()
    ).select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        _as_double("embedding").alias("v"),
    )
    n = e.groupBy("label").agg(
        F.count(F.when(F.col("half") == 0, 1))
        .cast("bigint")
        .alias("n_even"),
        F.count(F.when(F.col("half") == 1, 1)).cast("bigint").alias("n_odd"),
    )
    comp = (
        e.select("label", "half", F.posexplode("v").alias("d0", "x"))
        .select("label", "half", (F.col("d0") + 1).alias("d"), "x")
        .groupBy("label", "d")
        .agg(
            (
                F.sum(
                    F.when(F.col("half") == 0, F.col("x")).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count(F.when(F.col("half") == 0, 1))
            ).alias("ce"),
            (
                F.sum(
                    F.when(F.col("half") == 1, F.col("x")).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count(F.when(F.col("half") == 1, 1))
            ).alias("co"),
        )
    )
    # RAGGED-dimension rule (r7 advice): a dim present in only one half
    # contributes to NONE of the three sums — the oracle's inner join on
    # (label, d) drops such dims from dot AND both norms, so the norm
    # sums must carry the same both-non-null guard (dot already does,
    # since NULL*x is NULL under SUM). Fixed-dimension corpora are
    # unaffected; ragged ones now agree across engines.
    both = F.col("ce").isNotNull() & F.col("co").isNotNull()
    dots = comp.groupBy("label").agg(
        F.sum((F.col("ce") * F.col("co")).cast("decimal(30,12)"))
        .cast("double")
        .alias("dot"),
        F.sum(
            F.when(both, F.col("ce") * F.col("ce")).cast("decimal(30,12)")
        )
        .cast("double")
        .alias("ee"),
        F.sum(
            F.when(both, F.col("co") * F.col("co")).cast("decimal(30,12)")
        )
        .cast("double")
        .alias("oo"),
    )
    return (
        n.filter((F.col("n_even") > 0) & (F.col("n_odd") > 0))
        .join(dots, "label")
        .select(
            "label",
            "n_even",
            "n_odd",
            F.round(
                F.col("dot") / (F.sqrt("ee") * F.sqrt("oo")), 6
            ).alias("centroid_cosine"),
        )
    )


@query(
    "q_intra_label_diversity",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    ),
    comp AS (
      SELECT vec_id, label, d, v[d] AS x
      FROM e, LATERAL (
        SELECT unnest(generate_series(1, len(v))) AS d
      ) u
    ),
    norms AS (
      SELECT vec_id, label,
             sqrt(CAST(SUM(CAST(x * x AS DECIMAL(30,12))) AS DOUBLE))
               AS nrm
      FROM comp GROUP BY vec_id, label
    ),
    unit AS (
      SELECT c.label, c.d, c.x / n.nrm AS ux
      FROM comp c JOIN norms n ON n.vec_id = c.vec_id
      WHERE n.nrm > 0
    ),
    su AS (
      SELECT label, d,
             CAST(SUM(CAST(ux AS DECIMAL(28,12))) AS DOUBLE) AS s
      FROM unit GROUP BY label, d
    ),
    sq AS (
      SELECT label,
             CAST(SUM(CAST(s * s AS DECIMAL(30,12))) AS DOUBLE) AS ssq
      FROM su GROUP BY label
    ),
    cnt AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      FROM norms WHERE nrm > 0 GROUP BY label
    )
    SELECT c.label, c.n AS n_vecs,
           ROUND((q.ssq - c.n) / (c.n * (c.n - 1.0)), 6) AS avg_cosine
    FROM cnt c JOIN sq q ON q.label = c.label
    WHERE c.n >= 2
    """,
)
def q_intra_label_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average pairwise cosine WITHIN each label, computed WITHOUT
    materializing a single pair: for unit vectors,
    sum_{i != j} u_i . u_j = |sum u|^2 - n, so the mean pairwise cosine
    is (|sum u|^2 - n) / (n(n-1)) — the redundancy dial per label
    (near 1: the label is one template; near 0: diverse) that SemDeDup
    thresholds pairwise, priced here as one exact aggregate. Per-vector
    norms, per-(label, dim) component sums, and the final square-sum
    all fix deterministic double terms in DECIMAL before summation
    (the q_centroid_drift pattern), so partition order cannot move the
    6dp result; zero-norm vectors are excluded on both engines (no
    unit direction).

    Scale posture: one posexplode pass -> per-vector norm rollup ->
    (label, dim) rollup (type-scale) -> label rollup. The identity
    replaces the O(n^2)-per-label pair join with three linear
    aggregations — THE reason this op scales where a verbatim SemDeDup
    audit cannot. No reference counterpart (SURVEY.md §2-A)."""
    emb = load_spread(spark, sf_dir, "embeddings", min_bytes=2_000_000)
    e = emb.filter(
        F.col("embedding").isNotNull() & F.col("vec_id").isNotNull()
    ).select("vec_id", "label", _as_double("embedding").alias("v"))
    comp = e.select(
        "vec_id", "label", F.posexplode("v").alias("d0", "x")
    ).select("vec_id", "label", (F.col("d0") + 1).alias("d"), "x")
    norms = comp.groupBy("vec_id", "label").agg(
        F.sqrt(
            F.sum((F.col("x") * F.col("x")).cast("decimal(30,12)")).cast(
                "double"
            )
        ).alias("nrm")
    )
    unit = (
        comp.join(norms.filter(F.col("nrm") > 0).select("vec_id", "nrm"), "vec_id")
        .select("label", "d", (F.col("x") / F.col("nrm")).alias("ux"))
    )
    su = unit.groupBy("label", "d").agg(
        F.sum(F.col("ux").cast("decimal(28,12)")).cast("double").alias("s")
    )
    sq = su.groupBy("label").agg(
        F.sum((F.col("s") * F.col("s")).cast("decimal(30,12)"))
        .cast("double")
        .alias("ssq")
    )
    cnt = (
        norms.filter(F.col("nrm") > 0)
        .groupBy("label")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return (
        cnt.filter(F.col("n") >= 2)
        .join(sq, "label")
        .select(
            "label",
            F.col("n").alias("n_vecs"),
            F.round(
                (F.col("ssq") - F.col("n"))
                / (F.col("n") * (F.col("n") - F.lit(1.0))),
                6,
            ).alias("avg_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# IVF index MAINTENANCE (round 10): the ingest-side complement of
# q_sim_ivf's query side — every vector is assigned to its nearest
# coarse-quantizer cell and each cell's posting-list stats (size +
# top-M closest-to-centroid representatives) are maintained. The batch
# twin below is the full-corpus build; the streaming twin
# (streaming/runner.py build_sim_index) maintains the same stats
# incrementally per arriving vector. Everything is INTEGER-exact (the
# q_sim_ann_lsh floor(x*1000) quantization): centroid components are
# integer sums, assignment scores are one correctly-rounded IEEE
# division + sqrt on identical int64s — so both engines pick identical
# cells and the op carries a full DuckDB oracle.
# ---------------------------------------------------------------------------

_IVF_TOPM = 3


def _int_vec(col: str = "embedding"):
    """floor(x*1000) integer quantization of the embedding (the LSH
    op's exact pattern — replayable bit-exactly on any engine)."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )


def _ivf_valid(df: DataFrame) -> DataFrame:
    """Rows the index ingests: non-NULL id + full-width embedding (the
    hostile fixture nulls ids; a short vector cannot dot against the
    quantizer). Mirrored verbatim in the oracle's WHERE."""
    return df.filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size("embedding") == _DIM)
    )


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> dict:
    """label -> (integer component list, |C|^2) coarse quantizer, built
    from the full corpus with exact int64 sums. The table is n_cells x
    dim (10 x 64 here, k x dim generally) — the tiny always-broadcast
    relation of every IVF system; collecting it driver-side IS the
    broadcast (the streaming builder embeds it in the assignment
    expression, so arriving vectors assign map-only, no shuffle)."""
    emb = _ivf_valid(load(spark, sf_dir, "embeddings")).filter(
        F.col("label").isNotNull()
    )
    cent = (
        emb.select("label", F.posexplode(_int_vec()).alias("d0", "x"))
        .groupBy("label", "d0")
        .agg(F.sum("x").alias("c"))
        .collect()
    )
    comp: dict[int, dict[int, int]] = {}
    for r in cent:
        comp.setdefault(int(r["label"]), {})[int(r["d0"])] = int(r["c"])
    out = {}
    for lbl, m in comp.items():
        vec = [m.get(d, 0) for d in range(_DIM)]
        out[lbl] = (vec, sum(c * c for c in vec))
    return out


def _ivf_assign(cents: dict):
    """(cell, score) columns over an ``__iv`` int64-array column: dot
    each quantized vector against every centroid in ONE whole-stage-
    codegen projection (zip_with + aggregate — JVM-side, no explode, no
    shuffle), pick the max (score, -label) struct. score =
    int64 dot / sqrt(int64 |C|^2): two correctly-rounded IEEE ops on
    identical integers, so the argmax is engine-exact; ties break to
    the smallest label via the negated-label struct field."""
    structs = []
    for lbl in sorted(cents):
        comps, n2 = cents[lbl]
        carr = F.array(*[F.lit(c).cast("long") for c in comps])
        dot = F.aggregate(
            F.zip_with(F.col("__iv"), carr, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        s = dot.cast("double") / F.sqrt(F.lit(float(n2)))
        structs.append(
            F.struct(s.alias("s"), F.lit(-lbl).cast("int").alias("negl"))
        )
    best = F.array_max(F.array(*structs))
    return (-best["negl"]).cast("bigint"), best["s"]


_IVF_SQL = f"""
    WITH e AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
          AND len(embedding) = {_DIM}
    ),
    dims AS (SELECT unnest(generate_series(1, {_DIM})) AS d),
    iv AS (
        SELECT vec_id, d, CAST(floor(v[d] * 1000) AS BIGINT) AS x
        FROM e, dims
    ),
    cent AS (
        SELECT e.label, iv.d, SUM(iv.x) AS c
        FROM iv JOIN e USING (vec_id)
        WHERE e.label IS NOT NULL
        GROUP BY e.label, iv.d
    ),
    n2 AS (SELECT label, SUM(c * c) AS n2 FROM cent GROUP BY label),
    assign AS (
        SELECT vec_id, CAST(label AS BIGINT) AS cell, s FROM (
            SELECT dots.vec_id, dots.label,
                   CAST(dots.dot AS DOUBLE) / sqrt(CAST(n2.n2 AS DOUBLE))
                       AS s,
                   row_number() OVER (
                       PARTITION BY dots.vec_id
                       ORDER BY CAST(dots.dot AS DOUBLE)
                                / sqrt(CAST(n2.n2 AS DOUBLE)) DESC,
                                dots.label
                   ) AS rn
            FROM (
                SELECT iv.vec_id, cent.label, SUM(iv.x * cent.c) AS dot
                FROM iv JOIN cent USING (d)
                GROUP BY iv.vec_id, cent.label
            ) dots JOIN n2 USING (label)
        ) WHERE rn = 1
    ),
    reps AS (
        SELECT cell,
               string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY s DESC,
                          vec_id) AS reps
        FROM (
            SELECT cell, vec_id, s,
                   row_number() OVER (PARTITION BY cell
                                      ORDER BY s DESC, vec_id) AS rn
            FROM assign
        ) WHERE rn <= {_IVF_TOPM} GROUP BY cell
    )
    SELECT a.cell, CAST(COUNT(*) AS BIGINT) AS n_members, r.reps
    FROM assign a JOIN reps r USING (cell)
    GROUP BY a.cell, r.reps
    """


@query("s_sim_index", oracle=_IVF_SQL)
def s_sim_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index build/maintenance, batch form: assign every vector to
    its nearest integer-exact coarse-quantizer cell and report each
    cell's posting-list stats — member count and the top-3
    closest-to-centroid representative ids (rank order serialized to a
    joined string; array outputs crash the harness canonicalizer).

    Scale posture: assignment is a MAP-ONLY whole-stage-codegen
    projection against the broadcast-sized centroid table (no explode,
    no shuffle — the same per-row cost an ingest pipeline pays); the
    only shuffle is the per-cell rollup, one exchange shared by the
    window and the aggregation (both keyed on cell). The streaming twin
    s_sim_index_stream maintains identical stats incrementally with
    per-cell state (streaming/runner.py build_sim_index). No reference
    counterpart (SURVEY.md §2-A)."""
    cents = _ivf_centroids(spark, sf_dir)
    if not cents:
        return spark.createDataFrame(
            [], "cell bigint, n_members bigint, reps string"
        )
    cell, s = _ivf_assign(cents)
    assigned = (
        _ivf_valid(load(spark, sf_dir, "embeddings"))
        .select("vec_id", _int_vec().alias("__iv"))
        .select("vec_id", cell.alias("cell"), s.alias("s"))
    )
    w = Window.partitionBy("cell").orderBy(F.col("s").desc(), "vec_id")
    w_all = (
        Window.partitionBy("cell")
        .orderBy(F.col("s").desc(), "vec_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        assigned.select(
            "cell",
            "vec_id",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(w_all).alias("n_members"),
        )
        .filter(F.col("rn") <= _IVF_TOPM)
        .groupBy("cell", "n_members")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "vec_id"))),
                    lambda x: x["vec_id"].cast("string"),
                ),
                ",",
            ).alias("reps")
        )
        .select("cell", "n_members", "reps")
    )

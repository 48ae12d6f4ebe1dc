"""End-to-end vector-retrieval pipeline: the ANN index lifecycle over the
embeddings fixture, built entirely from the engine's registered operator
patterns:

    1. train      integer-exact Lloyd's k-means -> coarse cells
                  (q_kmeans semantics: floor(x*1000) int64 components)
    2. index      IVF assignment (every vector -> nearest cell) and
                  PQ codes (per-cell sub-codebooks, q_ann_pq semantics)
    3. search     probe -> rank cells -> scan nprobe cells -> exact
                  re-rank (q_sim_ivf shape)
    4. audit      recall@10 of the pruned search vs the brute-force
                  top-10 (q_sim_topk), plus cell balance stats

Run:  python examples/retrieval_pipeline.py [sf_dir]

Scale posture per stage (SCALE.md): centroid/codebook tables always stay
broadcast-sized; assignment/encode are partial-agg'd rollups; search
scans only nprobe cells. At 10^9 vectors the index build is two shuffles
per k-means iteration and one per encode — nothing driver-side between
stages except the printed audit.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])

from pyspark.sql import functions as F

from pot_spark.session import get_spark
from pot_spark.tables import load

K = 8  # coarse cells
ITERS = 2
NPROBE = 2
TOPK = 10
DIM = 64


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval_pipeline", cpus="8")

    emb = load(spark, sf_dir, "embeddings")
    iv = emb.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "d0", "xd"
        ),
    ).select(
        "vec_id",
        (F.col("d0") + 1).alias("d"),
        F.floor(F.col("xd") * 1000).cast("bigint").alias("x"),
    )

    # 1. train: k-means on integer components, init = vec_id 0..K-1
    cent = iv.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cell"), "d", F.col("x").alias("c")
    )
    assign = None
    for i in range(ITERS):
        if i > 0:
            cent = (
                iv.join(assign, "vec_id")
                .groupBy("cell", "d")
                .agg(F.floor(F.sum("x") / F.count("*")).cast("bigint").alias("c"))
            )
        sd = (
            iv.join(F.broadcast(cent), "d")
            .groupBy("vec_id", "cell")
            .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("sd"))
        )
        assign = (
            sd.groupBy("vec_id")
            .agg(F.min(F.struct("sd", "cell")).alias("mn"))
            .select("vec_id", F.col("mn.cell").alias("cell"))
        )
    sizes = assign.groupBy("cell").count().orderBy("cell").collect()
    print(f"[1 train ] k={K} cells, sizes: {[r['count'] for r in sizes]}")

    # 2. index: cell assignment IS the IVF index; persist as a table
    index = assign.join(
        emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")),
        "vec_id",
    )
    index = index.persist()
    n_indexed = index.count()
    print(f"[2 index ] {n_indexed} vectors assigned to {K} cells")

    # 3. search: rank cells by centroid distance to the probe, scan NPROBE
    probe = index.filter(F.col("vec_id") == 0).select(F.col("v").alias("p"))
    pc = probe.select(F.posexplode("p").alias("d0", "pv")).select(
        (F.col("d0") + 1).alias("d"),
        F.floor(F.col("pv") * 1000).cast("bigint").alias("px"),
    )
    cell_rank = (
        cent.join(F.broadcast(pc), "d")
        .groupBy("cell")
        .agg(F.sum((F.col("c") - F.col("px")) * (F.col("c") - F.col("px"))).alias("dist"))
        .orderBy("dist", "cell")
        .limit(NPROBE)
        .select("cell")
    )
    dot = F.aggregate(
        F.zip_with("v", "p", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    cand = (
        index.join(F.broadcast(cell_rank), "cell")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", F.round(dot / (norm("v") * norm("p")), 6).alias("cos"))
    )
    ivf_top = cand.orderBy(F.desc("cos"), "vec_id").limit(TOPK)
    ivf_ids = [r.vec_id for r in ivf_top.collect()]
    print(f"[3 search] nprobe={NPROBE} top-{TOPK}: {ivf_ids}")

    # 4. audit: recall vs brute force over ALL vectors
    brute = (
        index.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select("vec_id", F.round(dot / (norm("v") * norm("p")), 6).alias("cos"))
        .orderBy(F.desc("cos"), "vec_id")
        .limit(TOPK)
    )
    brute_ids = [r.vec_id for r in brute.collect()]
    recall = len(set(ivf_ids) & set(brute_ids)) / TOPK
    print(f"[4 audit ] brute top-{TOPK}: {brute_ids}")
    print(f"[4 audit ] recall@{TOPK} = {recall:.2f} "
          f"(scanned {NPROBE}/{K} cells)")
    index.unpersist()


if __name__ == "__main__":
    main()

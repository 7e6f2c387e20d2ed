"""Cluster → keep/drop labeling (reference M9/J6).

The reference labels each element by joining its contributors' cluster
ids and declaring quality "good if the last contributor is in an
experienced-user cluster" (/root/reference/osmdq/utils.py:332-341;
article7:118-130) — i.e. a tiny cluster→verdict map joined broadcast
onto the big table. Here: clusters are ranked by a fixed quality
composite of their centroid coordinates and the top ``keep_top``
clusters are kept.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Weights over (min-max-scaled) feature columns. Positive = quality
# signal, negative = junk signal. Unknown columns weigh 0.
QUALITY_WEIGHTS: dict[str, float] = {
    "stopword_ratio": 1.0,
    "lang_match": 1.0,
    "langid_conf": 1.0,
    "u_perplexity": -1.0,
    "perplexity": -1.0,
    "symbol_ratio": -1.0,
    "digit_ratio": -1.0,
    "dup_word_ratio": -1.0,
    "dup_5gram_ratio": -1.0,
}


def cluster_scores(centers: np.ndarray, cols: list[str]) -> np.ndarray:
    w = np.array([QUALITY_WEIGHTS.get(c, 0.0) for c in cols])
    return centers @ w


def keep_map(centers: np.ndarray, cols: list[str], keep_top: int = 1) -> dict[int, bool]:
    """Rank clusters by composite centroid quality; keep the best
    ``keep_top``. Ties broken by cluster id (deterministic)."""
    s = cluster_scores(centers, cols)
    order = sorted(range(len(s)), key=lambda j: (-s[j], j))
    kept = set(order[:keep_top])
    return {j: j in kept for j in range(len(s))}


def keep_dim_plan(
    clustered: DataFrame,
    cols: list[str],
    keep_top: int = 1,
    cluster_col: str = "cluster",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """cluster → keep verdict as a PURE PLAN (no driver collect): one
    aggregation to k rows, composite score as an expression, rank via
    a window over the k-row frame (single tiny partition — k ≤ 16).
    Same semantics as keep_map on collected centroids: rank by
    -score, ties by cluster id; fused into the consumer's job graph so
    label emission costs zero extra driver round-trips."""
    weights = weights or QUALITY_WEIGHTS
    agg = clustered.groupBy(cluster_col).agg(*[F.avg(c).alias(c) for c in cols])
    score = F.lit(0.0)
    for c in cols:
        w = weights.get(c, 0.0)
        if w:
            score = score + F.lit(float(w)) * F.col(c)
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.desc("_score"), F.asc(cluster_col))
    return (
        agg.withColumn("_score", score)
        .withColumn("_r", F.row_number().over(rank_w))
        .select(cluster_col, (F.col("_r") <= keep_top).alias("keep"))
    )


def summarize_clusters(
    out: DataFrame, cluster_col: str = "cluster", keep_col: str = "keep", url_col: str = "url"
) -> DataFrame:
    """Per-cluster verification summary: doc/keep counts + an
    order-insensitive BOUNDED digest of the kept urls —
    bit_xor(xxhash64(url)), constant memory per group with map-side
    partial aggregation. (The earlier array_sort(collect_list) digest
    materialized every kept url of a cluster in one executor — an OOM
    at real scale, VERDICT r2 #2.) xor is commutative/associative, so
    the digest is deterministic under any partitioning; kept-url sets
    are distinct urls, so no xor self-cancellation."""
    kept_sig = F.coalesce(F.bit_xor(F.when(F.col(keep_col), F.xxhash64(url_col))), F.lit(0).cast("long"))
    return (
        out.groupBy(cluster_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col(keep_col), 1).otherwise(0)).alias("n_keep"),
            kept_sig.alias("kept_urls_sig"),
        )
        .orderBy(cluster_col)
    )


def attach_labels(
    spark: SparkSession, df: DataFrame, centers: np.ndarray, cols: list[str], keep_top: int = 1
) -> DataFrame:
    """Broadcast-join the k-row cluster→keep map onto the big table —
    the J6 small-dimension lookup join, hinted broadcast."""
    km = keep_map(centers, cols, keep_top)
    dim = spark.createDataFrame(
        [(int(j), bool(v)) for j, v in km.items()], schema="cluster int, keep boolean"
    )
    return df.join(F.broadcast(dim), on="cluster", how="left").na.fill({"keep": False})

"""Approximate-nearest-neighbor search over an embedding column.

- ``cosine_topk``: brute-force exact top-k — broadcast the (small)
  query set against the full corpus, score with whole-stage
  zip_with/aggregate expressions, rank with a per-query window. The
  correctness baseline; O(|corpus| × |queries|) but embarrassingly
  parallel and shuffle-free until the final per-query top-k.
- ``lsh_buckets`` / ``lsh_topk``: sign-random-projection LSH (SimHash
  for vectors, Charikar '02): ``n_bits`` fixed hyperplanes (a
  deterministic seeded matrix, broadcast once), bucket = sign
  pattern; candidates = bucket equi-join, then exact cosine re-rank.
  The scale path: candidate generation is an equi-join with bounded
  buckets instead of a cross product. Multi-probe (hamming-1 probes)
  recovers recall near bucket boundaries.

The hyperplane projection is a vectorized Arrow UDF (one numpy matmul
per batch) — the idiomatic fast path for per-row linear algebra.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .dedup import cosine_col


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, rank, neighbor_id, cosine).
    Self-matches (same id) are excluded. Ties break on neighbor id."""
    q = queries.select(F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("_qid"))
        .withColumn("cosine", cosine_col(F.col("_cv"), F.col("_qv")))
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias("query_id"), "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 7) -> np.ndarray:
    """Deterministic seeded Gaussian hyperplanes — a model constant,
    identical on every executor (shipped inside the UDF closure; at
    very high dim it would be a broadcast variable instead)."""
    return np.random.RandomState(seed).randn(n_bits, dim)


def lsh_buckets(
    df: DataFrame,
    dim: int,
    n_bits: int = 12,
    seed: int = 7,
    vec_col: str = "embedding",
    out: str = "bucket",
    n_tables: int = 1,
) -> DataFrame:
    """Sign-LSH bucket id per row. With ``n_tables`` > 1, emits one row
    per (table, bucket) — L independent hyperplane sets (the standard
    multi-table LSH recall knob: candidate recall ≈ 1-(1-p^b)^L). The
    L projections are ONE batched matmul per Arrow batch."""
    H = np.stack([_hyperplanes(dim, n_bits, seed + 1000 * t) for t in range(n_tables)])  # (L, b, dim)

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets_udf(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.to_numpy())  # (batch, dim)
        signs = np.einsum("nd,lbd->nlb", M, H) > 0  # (batch, L, b)
        codes = (signs.astype(np.int64) << np.arange(n_bits, dtype=np.int64)).sum(axis=2)
        return pd.Series(list(codes))

    out_df = df.withColumn("_bkts", buckets_udf(F.col(vec_col)))
    if n_tables == 1:
        return out_df.withColumn(out, F.element_at("_bkts", 1)).drop("_bkts")
    return out_df.select("*", F.posexplode("_bkts").alias("_table", out)).drop("_bkts")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: bool = True,
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket in
    any of ``n_tables`` independent tables (or a hamming-1 neighbor
    bucket with multiprobe), re-ranked exactly. Recall scales with
    L = n_tables at O(L) candidate cost — the standard production
    knob; multiprobe stretches each table further."""
    c = lsh_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")),
        dim, n_bits, seed, "_cv", n_tables=n_tables,
    )
    q = lsh_buckets(
        queries.select(F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv")),
        dim, n_bits, seed, "_qv", n_tables=n_tables,
    )
    if multiprobe:
        probes = F.array(F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)])
        q = q.withColumn("bucket", F.explode(probes))
    join_keys = ["_table", "bucket"] if n_tables > 1 else ["bucket"]
    cand = (
        c.join(q, join_keys)
        .filter(F.col("neighbor_id") != F.col("_qid"))
        .withColumn("cosine", cosine_col(F.col("_cv"), F.col("_qv")))
        .dropDuplicates(["_qid", "neighbor_id"])
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias("query_id"), "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def ivf_fit(
    corpus: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    sample_n: int = 4096,
    iters: int = 25,
) -> np.ndarray:
    """Coarse quantizer for IVF ANN: k-means centroids (nlist, dim)
    trained on a deterministic hash-ordered corpus sample — the
    standard IVF practice (e.g. FAISS trains the quantizer on a
    sample; only ASSIGNMENT is corpus-wide and that stays
    distributed). Same init as ml.kmeans_fit: k-means++ on the sample
    + Lloyd, fully deterministic."""
    from . import ml

    samp = (
        corpus.select(F.xxhash64(F.col(id_col)).alias("_h"), F.col(vec_col).alias("_v"))
        .orderBy("_h")
        .limit(sample_n)
        .collect()
    )
    X = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in samp])
    # SPHERICAL quantizer: the search metric is cosine, and cosine is
    # L2 on unit vectors — train and assign on normalized vectors so
    # the inverted lists align with cosine neighborhoods (the FAISS
    # inner-product-IVF practice).
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return ml._lloyd_numpy(X, ml._kmeanspp_init(X, nlist, seed), max_iter=iters)


def _ivf_lists_udf(centroids: np.ndarray, nprobe: int):
    """argmin-L2 list assignment, top-``nprobe`` lists per vector —
    one batched matmul per Arrow batch (ties broken by list id via
    stable argsort; same IEEE arithmetic on every executor)."""
    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C**2).sum(axis=1)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vs: pd.Series) -> pd.Series:
        M = np.stack(vs.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        d2 = -2.0 * (M @ C.T) + c2[None, :]  # |x|² == 1 per row — drop it
        idx = np.argsort(d2, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(idx))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF ANN top-k: corpus rows live in their nearest-centroid list
    (the inverted file); each query probes its ``nprobe`` nearest
    lists; candidates = list equi-join, re-ranked by exact cosine.
    nprobe = nlist ⇒ exhaustive (== cosine_topk). The scale shape:
    candidate volume is |corpus|·(nprobe/nlist) on average, candidate
    generation is a bounded-fanout equi-join, and the per-list corpus
    partitioning is exactly how a 100-TB index would be laid out on
    disk (one partition per list → probing reads only nprobe/nlist of
    the data: partition pruning for vectors)."""
    assign1 = _ivf_lists_udf(centroids, 1)
    assignp = _ivf_lists_udf(centroids, nprobe)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("_list", F.element_at(assign1(F.col("_cv")), 1))
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    ).withColumn("_list", F.explode(assignp(F.col("_qv"))))
    cand = (
        c.join(F.broadcast(q), "_list")
        .filter(F.col("neighbor_id") != F.col("_qid"))
        .withColumn("cosine", cosine_col(F.col("_cv"), F.col("_qv")))
        .dropDuplicates(["_qid", "neighbor_id"])
    )
    w = Window.partitionBy("_qid").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias("query_id"), "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 7,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Self-contained embedding near-dup: candidates share a sign-LSH
    bucket in ANY of ``n_tables`` tables (the production blocking key
    that dedup.embedding_neardup_pairs's caller-supplied block stands
    in for), verified by exact cosine ≥ threshold. EXACT duplicates
    always collide (identical vectors ⇒ identical sign patterns in
    every table), so recall on true duplicates is 1 by construction;
    near-duplicate recall follows 1−(1−(1−θ/π)^b)^L. ``max_bucket``
    drops degenerate hub buckets (the LSH skew guard — a bucket of m
    rows contributes m² candidate pairs)."""
    from .dedup import cosine_col as _cos

    keyed = lsh_buckets(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        dim, n_bits, seed, "_v", n_tables=n_tables,
    )
    join_keys = ["_table", "bucket"] if n_tables > 1 else ["bucket"]
    cnt = Window.partitionBy(*join_keys)
    keyed = keyed.withColumn("_n", F.count(F.lit(1)).over(cnt)).filter(F.col("_n") <= max_bucket).drop("_n")
    a = keyed.select(*join_keys, F.col("_id").alias("id1"), F.col("_v").alias("_v1"))
    b = keyed.select(*join_keys, F.col("_id").alias("id2"), F.col("_v").alias("_v2"))
    return (
        a.join(b, join_keys)
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cosine", _cos(F.col("_v1"), F.col("_v2")))
        .filter(F.col("cosine") >= threshold)
        .dropDuplicates(["id1", "id2"])
        .select("id1", "id2", F.round("cosine", 6).alias("cosine"))
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> float:
    """Diagnostic: |approx ∩ exact| / |exact| over (query, neighbor)."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    inter = e.join(a, ["query_id", "neighbor_id"]).count()
    total = e.count()
    return inter / total if total else 1.0

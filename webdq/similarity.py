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

- ``pq_fit`` / ``pq_encode`` / ``pq_adc_topk``: product quantization
  (Jégou et al. 2011) — the compressed-domain ANN path: m sub-codes
  per vector, asymmetric distance computation against a broadcast
  query set. Encode and ADC are NATIVE fixed-fold-order expressions
  (no UDF), so they are engine-replayable and stay in codegen.
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
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, rank, neighbor_id, cosine).
    Self-matches (same id) are excluded. Ties break on neighbor id.
    ``dim`` (fixed-dimension corpora) takes cosine_col's codegen fold
    path — bitwise-identical scores, no interpreted HOF per pair."""
    q = queries.select(F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("_qid"))
        .withColumn("cosine", cosine_col(F.col("_cv"), F.col("_qv"), dim=dim))
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
        .withColumn("cosine", cosine_col(F.col("_cv"), F.col("_qv"), dim=dim))
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
        # centroids carry the fixed corpus dimension — fold path free
        .withColumn(
            "cosine",
            cosine_col(F.col("_cv"), F.col("_qv"), dim=int(np.asarray(centroids).shape[1])),
        )
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
        .withColumn("cosine", _cos(F.col("_v1"), F.col("_v2"), dim=dim))
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

# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third ANN scale path (after sign-LSH
# and IVF): compress vectors to m sub-codes, score with asymmetric
# distance computation (ADC). Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 (the FAISS PQ baseline).


def pq_fit(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    sample_n: int = 4096,
    iters: int = 25,
) -> np.ndarray:
    """Train PQ codebooks (m, k, dim/m): split the vector into m
    contiguous subspaces and run k-means per subspace on the SAME
    deterministic hash-ordered bounded sample as ``ivf_fit`` (FAISS
    practice: training is sample-bounded; only encoding touches the
    full corpus, and that stays distributed). Fully deterministic:
    k-means++ init + Lloyd per subspace, fixed seed per subspace."""
    from . import ml

    samp = (
        corpus.select(F.xxhash64(F.col(id_col)).alias("_h"), F.col(vec_col).alias("_v"))
        .orderBy("_h")
        .limit(sample_n)
        .collect()
    )
    X = np.stack([np.asarray(r["_v"], dtype=np.float64) for r in samp])
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        books[s] = ml._lloyd_numpy(Xs, ml._kmeanspp_init(Xs, k, seed + s), max_iter=iters)
    return books


def _pq_sqdist_expr(vec_col, s: int, dsub: int, centroid, offset: int = 0):
    """Squared L2 distance between one subvector and one centroid as a
    NATIVE expression with a FIXED left-to-right fold order
    (((t0+t1)+t2)+...) — the order contract that lets an oracle engine
    replay the float arithmetic bit-for-bit. element_at is O(1) per
    term on the array; the whole thing stays inside whole-stage
    codegen (no UDF, no Arrow hop)."""
    e = None
    for t, c in enumerate(centroid):
        x = F.element_at(F.col(vec_col), offset + s * dsub + t + 1).cast("double") - F.lit(float(c))
        term = x * x
        e = term if e is None else e + term
    return e


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "codes",
) -> DataFrame:
    """Distributed PQ encoding: codes[s] = argmin_j ||x_s − c_{s,j}||²
    (first minimum on ties — the least()+first-match CASE below ≡
    numpy argmin). Pure projection — encoding 10^12 vectors is a
    single map stage with zero shuffle and zero Python. Built as
    STAGED selects that materialize each of the m·k distances as its
    own column attribute before the argmin: one monolithic
    array/argmin expression would (a) inline the full distance
    arithmetic once per reference and (b) exceed janino's 64 KB
    per-method limit, silently dropping the stage out of whole-stage
    codegen (measured — 17k-line generated file, interpreted
    fallback). Per-column expressions are independently small, so
    codegen splits them into separate methods and the stage compiles."""
    mm, kk, dsub = codebooks.shape
    d = df.select(
        F.col(id_col),
        *[
            _pq_sqdist_expr(vec_col, s, dsub, codebooks[s, j]).alias(f"_d_{s}_{j}")
            for s in range(mm)
            for j in range(kk)
        ],
    )
    mins = d.select(
        "*",
        *[
            F.least(*[F.col(f"_d_{s}_{j}") for j in range(kk)]).alias(f"_m_{s}")
            for s in range(mm)
        ],
    )
    codes = []
    for s in range(mm):
        c = None
        for j in range(kk - 1):
            cond = F.col(f"_d_{s}_{j}") == F.col(f"_m_{s}")
            c = F.when(cond, j) if c is None else c.when(cond, j)
        codes.append((F.lit(0) if c is None else c.otherwise(kk - 1)).cast("int"))
    return mins.select(F.col(id_col), F.array(*codes).alias(codes_col))


def pq_lut(
    queries: DataFrame,
    codebooks: np.ndarray,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC lookup table: one row per (query, subspace, code) holding
    the squared distance from the query's subvector to that centroid —
    the table PQ precomputes ONCE per query so corpus scoring is pure
    lookup (the Jégou ADC construction). m·k rows per query, built
    with fixed-fold-order native expressions (engine-replayable);
    the whole table is tiny and broadcasts."""
    mm, kk, dsub = codebooks.shape
    q = queries.select(F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
    # stage the m·k distances as column attributes BEFORE building the
    # explode array: an array-of-structs carrying the full distance
    # arithmetic is one unsplittable Generate expression (the janino
    # 64 KB trap — see pq_encode); from attributes it is tiny
    d = q.select(
        "_qid",
        *[
            _pq_sqdist_expr("_qv", s, dsub, codebooks[s, j]).alias(f"_d_{s}_{j}")
            for s in range(mm)
            for j in range(kk)
        ],
    )
    entries = [
        F.struct(
            F.lit(s).alias("_s"), F.lit(j).alias("_j"), F.col(f"_d_{s}_{j}").alias("_d")
        )
        for s in range(mm)
        for j in range(kk)
    ]
    return d.select("_qid", F.explode(F.array(*entries)).alias("_e")).select(
        "_qid", F.col("_e._s").alias("_s"), F.col("_e._j").alias("_j"), F.col("_e._d").alias("_d")
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ ANN top-k over an ENCODED corpus via true LUT scoring:
    posexplode the m codes per vector, broadcast-equi-join the
    (query, subspace, code) distance table (``pq_lut``), pivot the m
    matched distances back to columns with per-subspace conditional
    aggregates (each (query, vector, subspace) matches EXACTLY one
    lut row, so max() is selection, not reduction), and sum the m
    columns in a FIXED left-to-right fold — deterministic,
    partition-invariant, engine-replayable, and every expression
    small enough to stay in whole-stage codegen (a single monolithic
    CASE-tree ADC expression blows janino's 64 KB method limit and
    silently drops the stage to interpreted mode — measured).
    Distance arithmetic is O(|queries|·m·k·dsub) ONCE in the lut;
    corpus scoring is O(|corpus|·m·|queries|) lookups — the ADC
    economics that make compressed-domain scanning cheap. Returns
    (query_id, rank, neighbor_id, adc_dist) — LOWER is closer
    (squared L2; normalize inputs upstream for cosine semantics, as
    with ``ivf_fit``).

    Materialize ``codes`` before calling (localCheckpoint or a stored
    stage table — the index-build/index-scan split a deployment has
    anyway): scoring a lazy encode plan fuses encode + join + agg into
    one whole-stage function that overflows janino's 64 KB method
    limit and drops the stage to interpreted execution.

    Scale contract: the scoring groupBy shuffles O(|corpus|·m·|queries|)
    rows pre-combine, so this assumes a BOUNDED query batch (the online
    ANN-serving shape). For a huge offline query set, batch the queries
    and loop — each batch's lut stays broadcastable and the shuffle
    stays linear in the corpus."""
    mm = codebooks.shape[0]
    lut = pq_lut(queries, codebooks, query_id_col, vec_col)
    ex = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(F.col(codes_col)).alias("_s", "_j"),
    )
    scored = ex.join(F.broadcast(lut), ["_s", "_j"]).filter(
        F.col("neighbor_id") != F.col("_qid")
    )
    g = scored.groupBy("_qid", "neighbor_id").agg(
        *[F.max(F.when(F.col("_s") == s, F.col("_d"))).alias(f"_d{s}") for s in range(mm)]
    )
    adc = None
    for s in range(mm):
        c = F.col(f"_d{s}")
        adc = c if adc is None else adc + c
    g = g.withColumn("adc_dist", adc)
    w = Window.partitionBy("_qid").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        g.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias("query_id"),
            "rank",
            "neighbor_id",
            F.round("adc_dist", 6).alias("adc_dist"),
        )
    )

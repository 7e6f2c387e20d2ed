"""ML core: variance analysis, auto-PCA, KMeans, elbow (SURVEY.md §2.8).

Design: the per-row math stays JVM-side as Catalyst expressions; only
k×d / d×d matrices ever reach the driver.

- Covariance is ONE distributed aggregation (sums + cross-products,
  d(d+1)/2 expressions with map-side partial aggregation) → numpy
  ``eigh`` on the driver (d ≈ 13, trivial). Reference analog:
  /root/reference/osmdq/unsupervised_learning.py:25-53 (np.cov + eig).
- PCA projection = centered dot-product expressions (no VectorUDT, no
  Python): survives whole-stage codegen.
- KMeans = k-means++ on a deterministic hash-ordered sample (driver,
  MiniBatch-style pre-fit) + distributed Lloyd refinement where each
  iteration is one groupBy aggregation of k×(d+1) partials.
  Reference analog: sklearn KMeans n_init=100
  (/root/reference/osmdq/analysis_tasks.py:744-745); determinism here
  comes from the hash-ordered init sample instead of RNG restarts.
- auto-PCA components / elbow rules re-express
  /root/reference/osmdq/unsupervised_learning.py:55-82,146-159,405-428.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------- minmax

def column_minmax(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One aggregation: (min, max) per column. Reference M1 'RobustScaler
    (0,100) == MinMax' (/root/reference/osmdq/analysis_tasks.py:470-471)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (float(row[f"mn_{c}"] or 0.0), float(row[f"mx_{c}"] or 0.0)) for c in cols}


def minmax_scale(df: DataFrame, cols: list[str], stats: dict[str, tuple[float, float]] | None = None) -> DataFrame:
    stats = stats or column_minmax(df, cols)
    out = {}
    for c in cols:
        mn, mx = stats[c]
        if mx - mn == 0.0:
            out[c] = F.lit(0.0)
        else:
            out[c] = (F.col(c) - F.lit(mn)) / F.lit(mx - mn)
    return df.withColumns(out)


# ------------------------------------------------------------ covariance

def covariance(df: DataFrame, cols: list[str]) -> tuple[np.ndarray, np.ndarray, int]:
    """(mean vector, sample covariance ddof=1, n) in one pass."""
    d = len(cols)
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.sum(F.col(c)).alias(f"s_{i}") for i, c in enumerate(cols)]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"xp_{i}_{j}"))
    row = df.agg(*aggs).collect()[0]
    n = int(row["_n"])
    s = np.array([float(row[f"s_{i}"] or 0.0) for i in range(d)])
    mean = s / max(n, 1)
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            xp = float(row[f"xp_{i}_{j}"] or 0.0)
            cij = (xp - n * mean[i] * mean[j]) / max(n - 1, 1)
            cov[i, j] = cov[j, i] = cij
    return mean, cov, n


@dataclass
class PCAModel:
    cols: list[str]
    mean: np.ndarray  # (d,)
    loadings: np.ndarray  # (d, k), sign-normalized
    eigvals: np.ndarray  # (d,) all of them, descending
    # input row count from the fit scan — free metadata that lets
    # downstream kmeans pre-filter its init TopK (no extra count job)
    n_rows: int = 0


def pca_variance(eigvals: np.ndarray) -> dict[str, np.ndarray]:
    """eig / varexp(%) / cumvar(%) — reference compute_pca_variance."""
    eig = np.sort(np.asarray(eigvals))[::-1]
    tot = eig.sum()
    varexp = (eig / tot) * 100.0 if tot > 0 else np.zeros_like(eig)
    return {"eig": eig, "varexp": varexp, "cumvar": np.cumsum(varexp)}


def optimal_pca_components(
    variance: dict[str, np.ndarray], nb_min_dim: int, nb_max_dim: int, standard_norm: bool = False
) -> int:
    """Smallest i+1 with cumvar>70% (eig<1 rule when standard-normalized),
    clamped — reference optimal_PCA_components semantics."""
    candidate = 0
    for i in range(len(variance["eig"])):
        if (standard_norm and variance["eig"][i] < 1) or variance["cumvar"][i] > 70:
            candidate = i + 1
            break
    return min(max(candidate, nb_min_dim), nb_max_dim)


def fit_scaled_pca(
    df: DataFrame,
    cols: list[str],
    n_components: int = 0,
    kmin: int = 2,
    kmax: int = 12,
) -> tuple[dict[str, tuple[float, float]], PCAModel]:
    """ONE aggregation computes min/max AND raw covariance; the scaled
    covariance follows analytically (cov_z[i,j] = cov_x[i,j]/(r_i r_j),
    mean_z = (mean−min)/r). Saves a full scan vs minmax-then-covariance
    and keeps the min-max → PCA semantics identical (tested)."""
    stats, model, _ = fit_scaled_pca_with_init(df, cols, n_components=n_components, kmin=kmin, kmax=kmax)
    return stats, model


def fit_scaled_pca_with_init(
    df: DataFrame,
    cols: list[str],
    n_components: int = 0,
    kmin: int = 2,
    kmax: int = 12,
    key_col: str | None = None,
    init_sample: int = 0,
    approx_rows: int | None = None,
) -> tuple[dict[str, tuple[float, float]], PCAModel, np.ndarray | None]:
    """fit_scaled_pca PLUS the downstream KMeans init sample, fused
    into the SAME single aggregation (the driver-synchronous job count
    is the non-scaling term — VERDICT r3).

    When ``key_col``/``init_sample`` are given and ``approx_rows`` (an
    upstream row-count hint, e.g. the ECDF probe's exact count) dwarfs
    the sample, the scan also runs
    ``collect_list(when(xxhash64(key) < cut, struct(hash, features)))``
    with the cutoff sized for ~4× init_sample expected survivors — a
    few-MB bounded driver payload with map-side partial merge. The
    driver then sorts by hash, keeps the ``init_sample`` smallest, and
    projects them to PC space replaying minmax_scale/pca_project
    arithmetic operation-for-operation (same IEEE doubles, same
    left-associated accumulation) — the returned matrix is
    bitwise-identical to init_sample_matrix over the projected frame
    (tested). Returns None as the third element on shortfall (hint too
    high ⇒ too few survivors) or when fusion wasn't requested; callers
    fall back to the separate TopK job."""
    d = len(cols)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [F.min(c).alias(f"mn_{i}"), F.max(c).alias(f"mx_{i}"), F.sum(c).alias(f"s_{i}")]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"xp_{i}_{j}"))
    fuse_sample = bool(key_col) and init_sample > 0 and bool(approx_rows) and approx_rows > 8 * init_sample
    if fuse_sample:
        frac = 4.0 * init_sample / approx_rows
        cut = int(-(2**63) + frac * 2.0**64)
        h = F.xxhash64(F.col(key_col))
        aggs.append(
            F.collect_list(
                F.when(h < F.lit(cut), F.struct(h.alias("_h"), *[F.col(c).cast("double").alias(f"f{i}") for i, c in enumerate(cols)]))
            ).alias("_samp")
        )
    row = df.agg(*aggs).collect()[0]
    n = int(row["_n"])
    mn = np.array([float(row[f"mn_{i}"] or 0.0) for i in range(d)])
    mx = np.array([float(row[f"mx_{i}"] or 0.0) for i in range(d)])
    r = np.where(mx - mn == 0.0, 1.0, mx - mn)
    mean = np.array([float(row[f"s_{i}"] or 0.0) for i in range(d)]) / max(n, 1)
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            xp = float(row[f"xp_{i}_{j}"] or 0.0)
            cov[i, j] = cov[j, i] = (xp - n * mean[i] * mean[j]) / max(n - 1, 1)
    cov_z = cov / np.outer(r, r)
    mean_z = (mean - mn) / r
    # constant columns scale to exactly 0 (minmax_scale emits lit(0.0))
    const = mx - mn == 0.0
    mean_z[const] = 0.0
    cov_z[const, :] = 0.0
    cov_z[:, const] = 0.0

    w, v = np.linalg.eigh(cov_z)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    if n_components <= 0:
        n_components = optimal_pca_components(pca_variance(w), kmin, min(kmax, len(cols)))
    L = v[:, :n_components].copy()
    for j in range(L.shape[1]):
        i = int(np.argmax(np.abs(L[:, j])))
        if L[i, j] < 0:
            L[:, j] = -L[:, j]
    stats = {c: (float(mn[i]), float(mx[i])) for i, c in enumerate(cols)}
    model = PCAModel(cols=list(cols), mean=mean_z, loadings=L, eigvals=w, n_rows=n)

    X_pc: np.ndarray | None = None
    if fuse_sample:
        samp = sorted(row["_samp"], key=lambda s: s["_h"])[:init_sample]
        if len(samp) >= init_sample:
            X_pc = _project_sample_rows(
                [[float(s[f"f{i}"]) for i in range(d)] for s in samp], stats, model
            )
    return stats, model, X_pc


def _project_sample_rows(
    rows: list[list[float]], stats: dict[str, tuple[float, float]], model: PCAModel
) -> np.ndarray:
    """Driver-side replay of minmax_scale → pca_project on raw feature
    rows, operation-for-operation: per column (x−mn)/(mx−mn) (constant
    columns → exactly 0.0, matching the lit(0.0) expression), then the
    LEFT-ASSOCIATED accumulation 0.0 + Σ (scaled_i − mean_i)·L[i,j] in
    python floats (IEEE doubles, same order ⇒ bitwise-identical to the
    Catalyst expression values)."""
    d = len(model.cols)
    k = model.loadings.shape[1]
    mn = [stats[c][0] for c in model.cols]
    mx = [stats[c][1] for c in model.cols]
    mean = [float(model.mean[i]) for i in range(d)]
    L = [[float(model.loadings[i, j]) for j in range(k)] for i in range(d)]
    out = np.empty((len(rows), k), dtype=np.float64)
    for r, raw in enumerate(rows):
        scaled = [
            0.0 if mx[i] - mn[i] == 0.0 else (raw[i] - mn[i]) / (mx[i] - mn[i]) for i in range(d)
        ]
        for j in range(k):
            acc = 0.0
            for i in range(d):
                acc = acc + (scaled[i] - mean[i]) * L[i][j]
            out[r, j] = acc
    return out


def fit_pca(df: DataFrame, cols: list[str], n_components: int = 0, kmin: int = 2, kmax: int = 12) -> PCAModel:
    """Eigendecomposition of the feature covariance. n_components=0 →
    automatic selection (the reference's AutoPCA,
    /root/reference/osmdq/analysis_tasks.py:564-635)."""
    mean, cov, n = covariance(df, cols)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    if n_components <= 0:
        n_components = optimal_pca_components(pca_variance(w), kmin, min(kmax, len(cols)))
    L = v[:, :n_components].copy()
    # Eigenvector sign is arbitrary (SURVEY.md §7.3 item 2): force the
    # max-|loading| entry of each component positive.
    for j in range(L.shape[1]):
        i = int(np.argmax(np.abs(L[:, j])))
        if L[i, j] < 0:
            L[:, j] = -L[:, j]
    return PCAModel(cols=list(cols), mean=mean, loadings=L, eigvals=w, n_rows=n)


def pca_project(df: DataFrame, model: PCAModel, prefix: str = "pc_") -> DataFrame:
    """Append pc_0..pc_{k-1} — centered dot products, pure expressions."""
    out = {}
    for j in range(model.loadings.shape[1]):
        expr: Column = F.lit(0.0)
        for i, c in enumerate(model.cols):
            expr = expr + (F.col(c) - F.lit(float(model.mean[i]))) * F.lit(float(model.loadings[i, j]))
        out[f"{prefix}{j}"] = expr
    return df.withColumns(out)


# ---------------------------------------------------------------- kmeans

def _dist_array(cols: list[str], centers: np.ndarray) -> Column:
    dists = []
    for c in centers:
        expr: Column = F.lit(0.0)
        for i, col in enumerate(cols):
            diff = F.col(col) - F.lit(float(c[i]))
            expr = expr + diff * diff
        dists.append(expr)
    return F.array(*dists)


def kmeans_assign(df: DataFrame, cols: list[str], centers: np.ndarray, out: str = "cluster") -> DataFrame:
    """Nearest-centroid assignment as an expression (argmin over the
    squared-distance array; ties → lowest cluster id, deterministic)."""
    darr = _dist_array(cols, centers)
    return df.withColumn(out, (F.array_position(darr, F.array_min(darr)) - 1).cast("int"))


def _kmeanspp_init(X: np.ndarray, k: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n = X.shape[0]
    centers = [X[rng.randint(n)]]
    for _ in range(1, k):
        d2 = np.min(((X[:, None, :] - np.array(centers)[None, :, :]) ** 2).sum(-1), axis=1)
        tot = d2.sum()
        if tot <= 0:
            centers.append(X[rng.randint(n)])
            continue
        centers.append(X[np.searchsorted(np.cumsum(d2 / tot), rng.rand())])
    return np.array(centers)


def _lloyd_numpy(X: np.ndarray, centers: np.ndarray, max_iter: int = 100, tol: float = 1e-7) -> np.ndarray:
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d2.argmin(1)
        new = np.array([X[lab == j].mean(0) if (lab == j).any() else centers[j] for j in range(len(centers))])
        shift = float(((new - centers) ** 2).sum())
        centers = new
        if shift < tol:
            break
    return centers


@dataclass
class KMeansModel:
    cols: list[str]
    centers: np.ndarray  # (k, d)
    inertia: float
    iterations: int


def init_sample_matrix(
    df: DataFrame, cols: list[str], key_col: str, init_sample: int, n_rows: int | None = None
) -> np.ndarray:
    """The ``init_sample`` rows with smallest xxhash64(key) — a
    deterministic, order/partition-independent pseudo-random sample
    (distributed TopK, no global sort).

    When ``n_rows`` (the input count, free metadata from the PCA fit
    scan) is known and dwarfs the sample, a hash-range PRE-FILTER
    shrinks the TopK input by orders of magnitude: keep only rows with
    hash below a cutoff sized for ~4× init_sample expected survivors,
    then run the same orderBy/limit. If ≥ init_sample rows survive,
    the filtered TopK IS the global TopK (all init_sample globally
    smallest hashes lie below the cutoff) — bitwise parity guaranteed;
    on the Chernoff-unlikely shortfall, fall back to the full scan."""
    base = df.select(F.xxhash64(F.col(key_col)).alias("_h"), *cols)

    def take(src) -> list:
        return src.orderBy("_h").limit(init_sample).drop("_h").collect()

    samp: list | None = None
    if n_rows and n_rows > 8 * init_sample:
        frac = 4.0 * init_sample / n_rows
        cut = int(-(2**63) + frac * 2.0**64)
        samp = take(base.filter(F.col("_h") < F.lit(cut)))
        if len(samp) < init_sample:
            samp = None  # shortfall: cutoff excluded part of the true TopK
    if samp is None:
        samp = take(base)
    return np.array([[float(r[c]) for c in cols] for r in samp])


def kmeans_fit(
    df: DataFrame,
    cols: list[str],
    k: int,
    key_col: str,
    max_iter: int = 25,
    tol: float = 1e-8,
    init_sample: int = 4096,
    n_init: int = 10,
    seed: int = 42,
    compute_inertia: bool = False,
    sample_X: np.ndarray | None = None,
    n_rows: int | None = None,
) -> KMeansModel:
    """Deterministic distributed KMeans.

    1. Take the ``init_sample`` rows with smallest xxhash64(key) — a
       deterministic, order/partition-independent pseudo-random sample
       (distributed TopK, no global sort).
    2. On the driver: ``n_init`` k-means++ restarts + Lloyd on the
       sample; keep the lowest-inertia centers (the reference's
       sklearn n_init=100 semantics at sample scale).
    3. Distributed Lloyd refinement: each iteration = one hash
       aggregation producing k×(d+1) partial sums.

    ``sample_X`` short-circuits step 1 so a k-sweep (auto_kmeans)
    pays the distributed TopK once, not once per k. ``n_rows`` (when
    known) enables the hash-range pre-filter in init_sample_matrix.
    """
    X = sample_X if sample_X is not None else init_sample_matrix(df, cols, key_col, init_sample, n_rows)
    best, best_cost = None, math.inf
    for t in range(n_init):
        c0 = _kmeanspp_init(X, k, seed + t)
        c = _lloyd_numpy(X, c0)
        cost = float(((X[:, None, :] - c[None, :, :]) ** 2).sum(-1).min(1).sum())
        if cost < best_cost:
            best, best_cost = c, cost
    centers = best

    # AQE off for the Lloyd loop only: each iteration is a k-row
    # aggregation that AQE can neither skew-split nor usefully
    # coalesce, but its stage-by-stage materialization adds one extra
    # scheduling round-trip per iteration (measured 0.23 → 0.17 s per
    # iteration on a cached 50k-row frame; at real scale per-iteration
    # compute dominates and the setting is neutral). Restored in
    # ``finally`` so the session's configured behavior is untouched.
    spark = df.sparkSession
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    shuf_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    it = 0
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # With AQE off, the loop loses AQE's reduce-side coalescing: a
        # k-row aggregate would schedule the session's FULL
        # shuffle.partitions as (empty) reduce tasks every iteration —
        # harmless at the local core count, thousands of wasted task
        # launches per iteration on a production session. Cap the
        # loop's reduce side near k; the map side (the real work) keeps
        # the input's partitioning, per-key partial-merge sets are
        # unchanged, and the refined centers are bitwise-identical
        # (measured: 15 iterations, 32 vs 8 reduce tasks, equal
        # centers; local wall a wash).
        try:
            cap = max(16, 4 * k)
            if int(shuf_before) > cap:
                spark.conf.set("spark.sql.shuffle.partitions", str(cap))
        except ValueError:
            pass
        for it in range(1, max_iter + 1):
            assigned = kmeans_assign(df, cols, centers, out="_c")
            rows = (
                assigned.groupBy("_c")
                .agg(F.count(F.lit(1)).alias("_n"), *[F.sum(c).alias(f"s_{i}") for i, c in enumerate(cols)])
                .collect()
            )
            new = centers.copy()
            for r in rows:
                j = int(r["_c"])
                n = float(r["_n"])
                if n > 0:
                    new[j] = np.array([float(r[f"s_{i}"]) / n for i in range(len(cols))])
            shift = float(((new - centers) ** 2).sum())
            centers = new
            if shift < tol:
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", shuf_before)

    # inertia is diagnostics (elbow sweep) — skip the extra scan unless
    # asked (the label path never needs it)
    inert = inertia(df, cols, centers) if compute_inertia else float("nan")
    return KMeansModel(cols=list(cols), centers=centers, inertia=inert, iterations=it)


def inertia(df: DataFrame, cols: list[str], centers: np.ndarray) -> float:
    """Within-cluster sum of squares — reference compute_nb_clusters'
    inertia (/root/reference/osmdq/unsupervised_learning.py:425)."""
    darr = _dist_array(cols, centers)
    row = df.agg(F.sum(F.array_min(darr)).alias("i")).collect()[0]
    return float(row["i"] or 0.0)


def elbow_derivation(elbow: list[float]) -> list[float]:
    """Discrete 2nd derivative, reference elbow_derivation semantics."""
    out = [0.0]
    for i in range(1, len(elbow) - 1):
        out.append(elbow[i + 1] + elbow[i - 1] - 2 * elbow[i])
    return out


def compute_nb_clusters(inertias: list[float], nbmin_clusters: int) -> int:
    """argmax of the elbow 2nd derivative + kmin — reference
    compute_nb_clusters (/root/reference/osmdq/unsupervised_learning.py:405-428)."""
    d = elbow_derivation(inertias)
    return nbmin_clusters + d.index(max(d))


def auto_kmeans(
    df: DataFrame,
    cols: list[str],
    key_col: str,
    nbmin_clusters: int = 3,
    nbmax_clusters: int = 8,
    n_rows: int | None = None,
    sample_X: np.ndarray | None = None,
    **fit_kw,
) -> tuple[int, dict[int, "KMeansModel"]]:
    """The reference's AutoKMeans flagship
    (/root/reference/osmdq/analysis_tasks.py:809-873): fit KMeans for
    k ∈ [kmin−1, kmax+1], apply the elbow 2nd-derivative rule over the
    inertias of k ∈ [kmin, kmax], return (chosen k, all fitted models).
    Each fit reuses the same persisted input AND the same init sample
    (one distributed TopK for the whole sweep — or zero extra jobs when
    the caller passes ``sample_X`` from the fused PCA scan); inertia is
    one aggregation per k."""
    X = sample_X if sample_X is not None else init_sample_matrix(
        df, cols, key_col, int(fit_kw.get("init_sample", 4096)), n_rows
    )
    models: dict[int, KMeansModel] = {}
    for k in range(nbmin_clusters - 1, nbmax_clusters + 2):
        models[k] = kmeans_fit(df, cols, k=k, key_col=key_col, compute_inertia=True, sample_X=X, **fit_kw)
    inertias = [models[k].inertia for k in range(nbmin_clusters, nbmax_clusters + 1)]
    best = compute_nb_clusters(inertias, nbmin_clusters)
    return best, models


def silhouette_sampled(
    df: DataFrame,
    cols: list[str],
    cluster_col: str,
    key_col: str,
    sample_n: int = 2000,
    hash: str = "xxhash64",
) -> float:
    """Diagnostic sampled silhouette (reference caps at 2000 rows,
    /root/reference/osmdq/unsupervised_learning.py:22). Deterministic
    hash-ordered sample; numpy on the driver. ``hash='md5'`` orders
    the sample by the md5 hex digest of the key instead of xxhash64 —
    engine-portable, so an external oracle can replay the exact sample
    (the q72 cross-check); xxhash64 stays the cheaper default."""
    h = (
        F.md5(F.col(key_col).cast("string"))
        if hash == "md5"
        else F.xxhash64(F.col(key_col))
    )
    samp = (
        df.select(h.alias("_h"), F.col(cluster_col).alias("_c"), *cols)
        .orderBy("_h")
        .limit(sample_n)
        .collect()
    )
    X = np.array([[float(r[c]) for c in cols] for r in samp])
    lab = np.array([int(r["_c"]) for r in samp])
    if len(np.unique(lab)) < 2:
        return float("nan")
    d = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    s_vals = []
    for i in range(len(X)):
        same = lab == lab[i]
        same[i] = False
        a = d[i][same].mean() if same.any() else 0.0
        b = min(d[i][lab == other].mean() for other in np.unique(lab) if other != lab[i])
        s_vals.append((b - a) / max(a, b) if max(a, b) > 0 else 0.0)
    return float(np.mean(s_vals))

"""ML core vs numpy oracle: covariance, PCA variance rules, KMeans,
elbow (SURVEY.md §2.8, M2-M7)."""

import numpy as np
from pyspark.sql import functions as F

from webdq import ml


def _blob_df(spark, seed=3, n=300):
    rng = np.random.RandomState(seed)
    centers = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 0.0], [0.0, 10.0, 10.0]])
    X = np.vstack([c + 0.3 * rng.randn(n, 3) for c in centers])
    lab = np.repeat([0, 1, 2], n)
    rows = [(f"k{i}", float(x[0]), float(x[1]), float(x[2]), int(l)) for i, (x, l) in enumerate(zip(X, lab))]
    return spark.createDataFrame(rows, "key string, a double, b double, c double, truth int"), X, lab


def test_covariance_matches_numpy(spark):
    df, X, _ = _blob_df(spark)
    mean, cov, n = ml.covariance(df, ["a", "b", "c"])
    assert n == len(X)
    np.testing.assert_allclose(mean, X.mean(0), rtol=1e-9)
    np.testing.assert_allclose(cov, np.cov(X.T), rtol=1e-8)


def test_minmax(spark):
    df, X, _ = _blob_df(spark)
    out = ml.minmax_scale(df, ["a", "b"]).agg(
        F.min("a"), F.max("a"), F.min("b"), F.max("b")
    ).collect()[0]
    assert list(out) == [0.0, 1.0, 0.0, 1.0]


def test_pca_variance_and_auto_k():
    var = ml.pca_variance(np.array([6.0, 2.0, 1.0, 0.5, 0.5]))
    np.testing.assert_allclose(var["varexp"][0], 60.0)
    # cumvar: 60, 80 → smallest i+1 with cumvar>70 is 2
    assert ml.optimal_pca_components(var, 1, 5) == 2
    # clamps
    assert ml.optimal_pca_components(var, 3, 5) == 3
    assert ml.optimal_pca_components(var, 1, 1) == 1
    # standard-norm: first eig < 1 at index 3 → min(4, ...)
    assert ml.optimal_pca_components(var, 1, 5, standard_norm=True) == 2


def test_pca_projection_matches_numpy(spark):
    df, X, _ = _blob_df(spark)
    model = ml.fit_pca(df, ["a", "b", "c"], n_components=2)
    got = (
        ml.pca_project(df, model)
        .orderBy("key")
        .select("key", "pc_0", "pc_1")
        .toPandas()
        .sort_values("key")
    )
    cov = np.cov(X.T)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    v = v[:, order][:, :2]
    for j in range(2):
        i = int(np.argmax(np.abs(v[:, j])))
        if v[i, j] < 0:
            v[:, j] = -v[:, j]
    exp = (X - X.mean(0)) @ v
    keys = sorted(f"k{i}" for i in range(len(X)))
    exp_by_key = {f"k{i}": exp[i] for i in range(len(X))}
    exp_sorted = np.array([exp_by_key[k] for k in keys])
    np.testing.assert_allclose(got[["pc_0", "pc_1"]].to_numpy(), exp_sorted, rtol=1e-7, atol=1e-9)


def test_kmeans_recovers_blobs(spark):
    df, X, lab = _blob_df(spark)
    km = ml.kmeans_fit(df, ["a", "b", "c"], k=3, key_col="key", init_sample=256, compute_inertia=True)
    got = ml.kmeans_assign(df, ["a", "b", "c"], km.centers).select("truth", "cluster").collect()
    # each truth group maps to exactly one cluster
    m: dict[int, set] = {}
    for r in got:
        m.setdefault(r["truth"], set()).add(r["cluster"])
    assert all(len(v) == 1 for v in m.values())
    assert len({next(iter(v)) for v in m.values()}) == 3
    assert km.inertia < 3 * 300 * 3 * 0.3**2 * 3  # loose sanity bound


def test_elbow_semantics():
    # inertia drops sharply then flattens → elbow at the kink
    inertias = [100.0, 40.0, 12.0, 10.0, 9.0, 8.5]  # k = 2..7
    assert ml.elbow_derivation(inertias)[0] == 0.0
    # deriv: [0, 100-80+12... ] argmax picks the kink at k=4 (index 2)
    k = ml.compute_nb_clusters(inertias, nbmin_clusters=2)
    assert k == 2 + np.argmax([0.0, 32.0, 26.0, 1.0, 0.5])


def test_silhouette(spark):
    df, _, _ = _blob_df(spark)
    out = ml.kmeans_assign(df, ["a", "b", "c"], np.array([[0, 0, 0], [10, 10, 0], [0, 10, 10]], dtype=float))
    s = ml.silhouette_sampled(out, ["a", "b", "c"], "cluster", "key", sample_n=200)
    assert s > 0.8  # well-separated blobs


def test_silhouette_md5_order_full_sample_invariant(spark):
    # when sample_n covers the whole frame, the sample ORDER cannot
    # matter — the portable md5 ordering and the default xxhash64
    # ordering must produce the identical silhouette
    df, _, _ = _blob_df(spark)
    out = ml.kmeans_assign(df, ["a", "b", "c"], np.array([[0, 0, 0], [10, 10, 0], [0, 10, 10]], dtype=float))
    n = out.count()
    a = ml.silhouette_sampled(out, ["a", "b", "c"], "cluster", "key", sample_n=n + 10)
    b = ml.silhouette_sampled(out, ["a", "b", "c"], "cluster", "key", sample_n=n + 10, hash="md5")
    assert a == b


def test_fit_scaled_pca_equals_two_pass(spark):
    df, X, _ = _blob_df(spark)
    cols = ["a", "b", "c"]
    stats1 = ml.column_minmax(df, cols)
    pca1 = ml.fit_pca(ml.minmax_scale(df, cols, stats1), cols, n_components=2)
    stats2, pca2 = ml.fit_scaled_pca(df, cols, n_components=2)
    assert stats1 == stats2
    np.testing.assert_allclose(pca1.mean, pca2.mean, rtol=1e-9)
    np.testing.assert_allclose(pca1.loadings, pca2.loadings, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(pca1.eigvals, pca2.eigvals, rtol=1e-8)


def test_auto_kmeans_elbow_recovers_k(spark):
    df, _, _ = _blob_df(spark)
    best, models = ml.auto_kmeans(df, ["a", "b", "c"], key_col="key", nbmin_clusters=2, nbmax_clusters=6, init_sample=256)
    assert best == 3
    assert set(models) == set(range(1, 8))
    assert models[3].inertia == models[3].inertia  # not NaN


def test_init_sample_prefilter_parity(spark):
    """The hash-range pre-filtered init sample must be bitwise
    identical to the full-scan TopK sample (the filter only prunes
    rows that cannot be in the TopK), including when n_rows is a loose
    over-estimate; an absurd under-estimate trips the shortfall
    fallback and still agrees."""
    df = spark.range(0, 5000, 1, 8).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 31).cast("double").alias("y"),
    )
    base = ml.init_sample_matrix(df, ["x", "y"], "url", 64)
    pre = ml.init_sample_matrix(df, ["x", "y"], "url", 64, n_rows=5000)
    np.testing.assert_array_equal(base, pre)
    loose = ml.init_sample_matrix(df, ["x", "y"], "url", 64, n_rows=50_000)
    np.testing.assert_array_equal(base, loose)
    # n_rows wildly too large -> cutoff below every hash -> fallback
    tiny_frac = ml.init_sample_matrix(df, ["x", "y"], "url", 64, n_rows=10**12)
    np.testing.assert_array_equal(base, tiny_frac)


def test_fused_init_sample_bitwise_parity(spark):
    """fit_scaled_pca_with_init's fused sample (collected during the
    PCA scan, projected to PC space on the driver) must be BITWISE
    identical to init_sample_matrix over the Spark-projected frame —
    the r4 job-fusion invariant protecting the F1 gates."""
    df = spark.range(0, 6000, 1, 8).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 97).cast("double").alias("a"),
        (F.col("id") % 31).cast("double").alias("b"),
        ((F.col("id") * 7) % 53).cast("double").alias("c"),
        F.lit(5.0).alias("const"),  # constant column: lit(0.0) path
    )
    cols = ["a", "b", "c", "const"]
    stats, pca, X_fused = ml.fit_scaled_pca_with_init(
        df, cols, n_components=2, key_col="url", init_sample=128, approx_rows=6000
    )
    assert X_fused is not None and X_fused.shape == (128, 2)
    proj = ml.pca_project(ml.minmax_scale(df, cols, stats), pca)
    X_sep = ml.init_sample_matrix(proj, ["pc_0", "pc_1"], "url", 128)
    np.testing.assert_array_equal(X_fused, X_sep)

    # no hint (or a hint too small to justify fusion) -> no sample
    _, _, none1 = ml.fit_scaled_pca_with_init(df, cols, n_components=2)
    _, _, none2 = ml.fit_scaled_pca_with_init(
        df, cols, n_components=2, key_col="url", init_sample=4096, approx_rows=6000
    )
    assert none1 is None and none2 is None

    # absurdly large hint -> cutoff below every hash -> shortfall None
    _, _, short = ml.fit_scaled_pca_with_init(
        df, cols, n_components=2, key_col="url", init_sample=128, approx_rows=10**12
    )
    assert short is None


def test_pipeline_fused_sample_same_kmeans(spark):
    """End-to-end: cluster_documents with and without the approx_rows
    hint must produce identical centers and identical assignments."""
    from webdq import pipeline as P

    from webdq.synth import generate_pages

    pages = generate_pages(spark, 1500).drop("_tier")
    cfg = P.PipelineConfig(k=4, pca_components=3, kmeans_init_sample=128, kmeans_max_iter=5)
    feats = P.extract_features(pages, cfg).persist()
    nstats: dict = {}
    norm = P.normalize_features(feats, cfg, nstats).persist()
    assert nstats["n_rows"] == 1500
    out_hint, _, _, _, km_hint = P.cluster_documents(norm, cfg, approx_rows=nstats["n_rows"])
    out_base, _, _, _, km_base = P.cluster_documents(norm, cfg, approx_rows=None)
    np.testing.assert_array_equal(km_hint.centers, km_base.centers)
    a = {r["url"]: r["cluster"] for r in out_hint.select("url", "cluster").collect()}
    b = {r["url"]: r["cluster"] for r in out_base.select("url", "cluster").collect()}
    assert a == b
    feats.unpersist(); norm.unpersist()

"""Two-level entity labeling: host metadata → host clusters → pages.

The reference's flagship semantic clusters an AGGREGATE entity (users)
and labels each record by its contributor's cluster:
- per-user metadata vector (40 features of counts / distinct days /
  quantiles): /root/reference/osmdq/utils.py:422-463
- element metadata joins first_uid/last_uid to user groups:
  /root/reference/osmdq/utils.py:332-341
- "element quality from the classes of its contributors":
  /root/reference/article/article7_OSM-data-quality-assessment.org:118-130

Web analog re-expressed Spark-first: per-HOST metadata (one groupBy of
the per-page feature frame), host-level ECDF + min-max + PCA + KMeans
(hosts are a tiny fraction of pages — the model fit is cheap), then a
host→(cluster, keep) join back onto pages: broadcast (map-side, no
page shuffle) while the host count stays under a guard threshold,
plain shuffle join above it — a multi-GB broadcast is NOT comfortable
(Spark's broadcast hard limit is 8 GB and executor memory suffers far
earlier), so the guard keeps the map-side fast path honest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import label as label_mod
from . import ml, normalize

# Host-level aggregate features (the utils.py:422-463 analog: volume,
# temporal extent, and quality-mix statistics per entity).
HOST_AGG_FEATURES = [
    "n_pages",
    "n_active_days",
    "lifespan_days",
    "mean_words",
    "v10_words",
    "v90_words",
    "mean_stopword_ratio",
    "mean_symbol_ratio",
    "mean_digit_ratio",
    "mean_upper_ratio",
    "mean_dup_word_ratio",
    "mean_dup_5gram_ratio",
    "mean_perplexity",
    "mean_langid_conf",
    "mean_lang_match",
]

# Volume-ish features get the ECDF treatment (heavy-tailed counts →
# uniform ranks), mirroring the page pipeline's u_* columns.
HOST_ECDF_FEATURES = ["n_pages", "n_active_days", "lifespan_days", "mean_perplexity"]

# Features fed to scaling → PCA → KMeans at the host level.
HOST_CLUSTER_FEATURES = [
    "u_pages",
    "u_active_days",
    "u_lifespan_days",
    "u_mean_perplexity",
    "mean_words",
    "mean_stopword_ratio",
    "mean_symbol_ratio",
    "mean_digit_ratio",
    "mean_upper_ratio",
    "mean_dup_word_ratio",
    "mean_dup_5gram_ratio",
    "mean_langid_conf",
    "mean_lang_match",
]

# Quality composite over host centroid coordinates (same rule family
# as label.QUALITY_WEIGHTS, host-feature names).
HOST_QUALITY_WEIGHTS = {
    "mean_stopword_ratio": 1.0,
    "mean_lang_match": 1.0,
    "mean_langid_conf": 1.0,
    "u_mean_perplexity": -1.0,
    "mean_symbol_ratio": -1.0,
    "mean_digit_ratio": -1.0,
    "mean_dup_word_ratio": -1.0,
    "mean_dup_5gram_ratio": -1.0,
}


# Authority part of a URL. No trailing-slash requirement (path-less
# https://example.com extracts its host, not ''), scheme per RFC 3986
# (ALPHA *(ALPHA/DIGIT/+/-/.)), case-insensitive (ADVICE r2).
HOST_REGEX = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)"


def host_col(url_col: str = "url") -> F.Column:
    """Host part of the url (scheme://HOST[/...])."""
    return F.regexp_extract(F.col(url_col), HOST_REGEX, 1)


def host_metadata(feats_df: DataFrame) -> DataFrame:
    """Per-host metadata vector: ONE hash aggregation over the per-page
    feature frame (map-side partial aggregation; no window, no join).
    Input must carry the per-page features from pipeline.extract_features.
    """
    q = F.percentile("n_words", F.array(F.lit(0.1), F.lit(0.9)))
    return feats_df.groupBy(host_col().alias("host")).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct(F.to_date("warc_ts")).alias("n_active_days"),
        (
            (F.unix_micros(F.max("warc_ts").cast("timestamp")) - F.unix_micros(F.min("warc_ts").cast("timestamp")))
            / 86400.0e6
        ).alias("lifespan_days"),
        F.avg("n_words").alias("mean_words"),
        F.element_at(q, 1).alias("v10_words"),
        F.element_at(q, 2).alias("v90_words"),
        F.avg("stopword_ratio").alias("mean_stopword_ratio"),
        F.avg("symbol_ratio").alias("mean_symbol_ratio"),
        F.avg("digit_ratio").alias("mean_digit_ratio"),
        F.avg("upper_ratio").alias("mean_upper_ratio"),
        F.avg("dup_word_ratio").alias("mean_dup_word_ratio"),
        F.avg("dup_5gram_ratio").alias("mean_dup_5gram_ratio"),
        F.avg("perplexity").alias("mean_perplexity"),
        F.avg("langid_conf").alias("mean_langid_conf"),
        F.avg("lang_match").alias("mean_lang_match"),
    )


def cluster_hosts(hosts: DataFrame, k: int = 4, pca_components: int = 3,
                  init_sample: int = 2048, max_iter: int = 25, seed: int = 42,
                  persisted: list | None = None):
    """ECDF → min-max+PCA (fused scan) → KMeans over the host table.
    Returns (clustered hosts df, feature cols, km model). Registers
    its internal persist in ``persisted`` for caller-side release."""
    h = normalize.ecdf(hosts, HOST_ECDF_FEATURES, key_col="host", prefix="u_")
    # ecdf strips the n_ prefix (n_pages → u_pages); mean_perplexity
    # keeps its name → u_mean_perplexity
    feats = list(HOST_CLUSTER_FEATURES)
    stats, pca = ml.fit_scaled_pca(h, feats, n_components=pca_components)
    scaled = ml.minmax_scale(h, feats, stats)
    pc_cols = [f"pc_{j}" for j in range(pca.loadings.shape[1])]
    proj = ml.pca_project(scaled, pca).select("host", *feats, *pc_cols).persist()
    if persisted is not None:
        persisted.append(proj)
    km = ml.kmeans_fit(proj, pc_cols, k=k, key_col="host", max_iter=max_iter,
                       init_sample=init_sample, seed=seed, n_rows=pca.n_rows)
    out = ml.kmeans_assign(proj, pc_cols, km.centers, out="host_cluster")
    return out, feats, km


def host_keep_dim(spark: SparkSession, clustered_hosts: DataFrame, feats: list[str], keep_top: int = 1) -> DataFrame:
    """cluster → keep verdict from mean scaled host features (the same
    centroid-composite rule as the page pipeline, host weights) — a
    pure plan, no driver collect."""
    return label_mod.keep_dim_plan(
        clustered_hosts, feats, keep_top, cluster_col="host_cluster", weights=HOST_QUALITY_WEIGHTS
    )


def run_host_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    k: int = 4,
    pca_components: int = 3,
    keep_top: int = 1,
    init_sample: int = 2048,
    seed: int = 42,
    workdir: str | None = None,
    broadcast_hosts_threshold: int = 10_000_000,
) -> DataFrame:
    """pages → per-page features → host metadata → host clusters →
    (url, host, host_cluster, keep): every page labeled by ITS HOST's
    cluster — the reference's two-level labeling shape.

    The host dimension joins back onto pages map-side (broadcast) only
    while the host count stays ≤ ``broadcast_hosts_threshold`` (default
    10M hosts ≈ hundreds of MB — safely inside Spark's 8 GB broadcast
    hard limit and executor memory). Above it, the join falls back to a
    plain shuffle join and AQE picks the strategy — a multi-GB
    broadcast would poison executor memory long before the hard limit
    (VERDICT r2 #4). The count is one cheap job over the already-
    persisted k-row-per-host projection.

    ``workdir`` enables the same Luigi-style resumable parquet stages
    (+ per-partition lineage and metrics) as the page pipeline."""
    from .pipeline import PipelineConfig, StageRunner, extract_features

    runner = StageRunner(spark, workdir)
    if runner.exists("host_labels"):
        runner.metrics.append({"stage": "host_labels", "skipped": True})
        runner.flush_metrics()
        return spark.read.parquet(runner._path("host_labels"))

    feats_df = runner.run("host_features", lambda: extract_features(pages, PipelineConfig(seed=seed)))
    hosts = runner.run("host_metadata", lambda: host_metadata(feats_df))
    clustered_hosts, feats, _ = cluster_hosts(
        hosts, k=k, pca_components=pca_components, init_sample=init_sample, seed=seed,
        persisted=runner._persisted,
    )
    dim = host_keep_dim(spark, clustered_hosts, feats, keep_top)
    host_dim = clustered_hosts.select("host", "host_cluster").join(F.broadcast(dim), "host_cluster")
    n_hosts = clustered_hosts.count()
    if n_hosts <= broadcast_hosts_threshold:
        host_dim = F.broadcast(host_dim)
    out = (
        feats_df.select("url", host_col().alias("host"))
        .join(host_dim, "host", "left")
        .na.fill({"keep": False})
        .select("url", "host", "host_cluster", "keep")
    )
    out = runner.run("host_labels", lambda: out)
    if not workdir:
        out.count()  # materialize before releasing upstream caches
    # run_pipeline discipline: at most one persisted frame survives —
    # the returned one (in workdir mode `out` is a parquet read and
    # everything can be released)
    for df_ in runner._persisted:
        if df_ is not out:
            df_.unpersist()
    runner._persisted = [out] if not workdir else []
    runner.flush_metrics()
    return out

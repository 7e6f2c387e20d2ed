"""End-to-end quality-filter pipeline with checkpointed, resumable stages.

The reference's Luigi DAG gives file-level incrementality: a task whose
output file exists is skipped (/root/reference/osmdq/analysis_tasks.py:36-43
idiom, every task). Re-expressed here: every stage optionally writes a
parquet stage table under ``workdir``; on re-run a stage whose output
exists is READ instead of recomputed — same resume semantics, no Luigi.
Each checkpointed stage also appends per-partition lineage rows and a
metrics row (north rule: "resumable from checkpoint with per-partition
lineage + metrics").

Stage graph (reference pipeline traced in SURVEY.md §3.1):
    pages
      → features     (heuristics: pure exprs; langid/perplexity: Arrow UDFs;
                      scrubbed_text; salted repartition first — host skew)
      → normalized   (ECDF u_* + ratio features; bucketed-parallel exact ECDF)
      → clustered    (min-max scale → covariance/eig PCA → KMeans → cluster)
      → labels       (broadcast cluster→keep join + url, scrubbed_text)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import label as label_mod
from . import ml, normalize, scorers, textstats
from .scrub import scrub

# Features fed to scaling → PCA → KMeans. pii_hits is deliberately
# excluded (PII occurs uniformly across tiers; it informs scrubbing,
# not quality).
CLUSTER_FEATURES = [
    "u_chars",
    "u_words",
    "u_mean_word_len",
    "u_perplexity",
    "stopword_ratio",
    "symbol_ratio",
    "digit_ratio",
    "upper_ratio",
    "dup_word_ratio",
    "dup_5gram_ratio",
    "langid_conf",
    "lang_match",
]

ECDF_FEATURES = ["n_chars", "n_words", "mean_word_len", "perplexity"]


@dataclass
class PipelineConfig:
    workdir: str | None = None  # None → fully lazy, no checkpoints
    k: int = 5
    k_auto: bool = False  # True → reference AutoKMeans elbow sweep
    kmeans_kmin: int = 3
    kmeans_kmax: int = 8
    pca_components: int = 0  # 0 → auto (cumvar > 70%)
    pca_kmin: int = 3  # reference clamps auto-k to [3, 12] (BASELINE.md)
    pca_kmax: int = 8
    keep_top: int = 1
    salt_partitions: int | None = None  # None → leave to AQE
    kmeans_max_iter: int = 25
    kmeans_init_sample: int = 4096
    seed: int = 42
    extra: dict = field(default_factory=dict)


class StageRunner:
    """Luigi-style stage memoization + lineage/metrics bookkeeping."""

    def __init__(self, spark: SparkSession, workdir: str | None):
        self.spark = spark
        self.workdir = workdir
        self.metrics: list[dict] = []
        self._persisted: list[DataFrame] = []

    def _path(self, name: str) -> str:
        assert self.workdir
        return os.path.join(self.workdir, name)

    def exists(self, name: str) -> bool:
        return bool(self.workdir) and os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def run(self, name: str, build) -> DataFrame:
        """Return the stage DataFrame; if checkpointing is on, write it
        once and read it back (true barrier = resume point)."""
        if not self.workdir:
            # No disk checkpoint → persist in memory/disk: downstream ML
            # stages (min-max, covariance, Lloyd iterations) each rescan
            # this frame; without a materialization every iteration would
            # re-run the whole upstream DAG including the Arrow UDFs.
            df = build().persist()
            self._persisted.append(df)
            return df
        if self.exists(name):
            self.metrics.append({"stage": name, "skipped": True})
            return self.spark.read.parquet(self._path(name))
        t0 = time.time()
        df = build()
        df.write.mode("overwrite").parquet(self._path(name))
        out = self.spark.read.parquet(self._path(name))
        # per-partition lineage: rows per output partition
        lin = (
            out.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .withColumn("stage", F.lit(name))
            .select("stage", "partition_id", "rows")
        )
        lin.write.mode("append").parquet(os.path.join(self.workdir, "_lineage"))
        parts = lin.agg(
            F.count(F.lit(1)).alias("np"),
            F.sum("rows").alias("rows"),
            (F.max("rows") / F.avg("rows")).alias("skew"),
        ).collect()[0]
        self.metrics.append(
            {
                "stage": name,
                "wall_ms": int((time.time() - t0) * 1000),
                "rows_out": int(parts["rows"] or 0),
                "partitions": int(parts["np"]),
                "skew_max_over_mean": float(parts["skew"] or 0.0),
            }
        )
        return out

    def flush_metrics(self) -> None:
        if not self.workdir or not self.metrics:
            return
        with open(os.path.join(self.workdir, "metrics.json"), "w") as f:
            json.dump(self.metrics, f, indent=2)


def extract_features(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """pages → per-document features + scrubbed text. The salted
    repartition by url-hash breaks host-level input skew BEFORE the
    Arrow-UDF stage (north rule; hosts on a web corpus are
    heavy-tailed, xxhash64(url) is uniform)."""
    if cfg.salt_partitions:
        df = df.repartition(cfg.salt_partitions, F.xxhash64("url", F.lit(cfg.seed)))
    df = textstats.char_features(df)
    df = scorers.all_scorer_features(df)  # one fused ArrowEvalPython
    df = scrub(df)
    # html AND raw text are dead weight past this point: every
    # downstream consumer reads either the numeric features or
    # scrubbed_text (the per-url byte-identity deliverable). Dropping
    # them here shrinks the persisted/checkpointed stage ~60% — at
    # cache-pressure scale that is the difference between memory-
    # resident and spilling stages.
    return df.drop("html", "text")


def normalize_features(df: DataFrame, cfg: PipelineConfig, stats_out: dict | None = None) -> DataFrame:
    # Numeric-only projection BEFORE the ECDF shuffles: the text and
    # scrubbed_text payloads must not travel through the melt / window
    # / pivot / join (they are ~50× the numeric width); scrubbed_text
    # is joined back once at label emission.
    numeric = [c for c in df.columns if c not in ("text", "scrubbed_text", "lang", "warc_ts", "html")]
    df = normalize.ecdf(
        df.select(*numeric), ECDF_FEATURES, key_col="url", prefix="u_", stats_out=stats_out
    )
    # reference naming: u_chars not u_n_chars (utils.py:540-541 strips n_)
    return df


def cluster_documents(
    df: DataFrame, cfg: PipelineConfig, persisted: list | None = None, approx_rows: int | None = None
):
    """min-max → PCA (auto-k) → KMeans. Returns (clustered df, models).
    Registers its internal persist in ``persisted`` so the caller can
    release it once the output is materialized. ``approx_rows`` (the
    exact upstream count when known — the ECDF probe surfaces it)
    fuses the KMeans init sample INTO the PCA fit scan: one driver
    round-trip serves minmax + covariance + init sample, with a
    bitwise-identical sample matrix (ml.fit_scaled_pca_with_init)."""
    missing = [c for c in CLUSTER_FEATURES if c not in df.columns]
    if missing:
        raise ValueError(f"cluster feature columns missing from input: {missing}")
    feats = list(CLUSTER_FEATURES)
    # one pass: min/max + covariance (scaled covariance derived on the
    # driver) instead of separate minmax and covariance scans — plus
    # the fused init sample when the row-count hint is available
    stats, pca, sample_X = ml.fit_scaled_pca_with_init(
        df,
        feats,
        n_components=cfg.pca_components,
        kmin=cfg.pca_kmin,
        kmax=cfg.pca_kmax,
        key_col="url",
        init_sample=cfg.kmeans_init_sample,
        approx_rows=approx_rows,
    )
    scaled = ml.minmax_scale(df, feats, stats)
    pc_cols = [f"pc_{j}" for j in range(pca.loadings.shape[1])]
    # Lloyd iterations + centroid ranking rescan this frame k×; keep
    # only (url, features, pc_*) hot — equivalent to the reference
    # persisting /individuals between tasks (analysis_tasks.py:632-635).
    proj = ml.pca_project(scaled, pca).select("url", *feats, *pc_cols).persist()
    if persisted is not None:
        persisted.append(proj)
    # fallback when the fused sample was unavailable: pca.n_rows (free
    # metadata from the fit scan) still lets the kmeans init TopK
    # pre-filter by hash range — bitwise-identical sample (ml.py)
    fit_kw = dict(
        max_iter=cfg.kmeans_max_iter, init_sample=cfg.kmeans_init_sample, seed=cfg.seed, n_rows=pca.n_rows
    )
    if cfg.k_auto:
        # reference AutoKMeans: sweep k, pick by elbow 2nd derivative
        best_k, models = ml.auto_kmeans(
            proj, pc_cols, "url", cfg.kmeans_kmin, cfg.kmeans_kmax, sample_X=sample_X, **fit_kw
        )
        km = models[best_k]
    else:
        km = ml.kmeans_fit(proj, pc_cols, k=cfg.k, key_col="url", sample_X=sample_X, **fit_kw)
    out = ml.kmeans_assign(proj, pc_cols, km.centers, out="cluster")
    return out, feats, stats, pca, km


def run_pipeline(spark: SparkSession, pages: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """Full pipeline: pages → labels (url, cluster, keep, scrubbed_text)."""
    cfg = cfg or PipelineConfig()
    runner = StageRunner(spark, cfg.workdir)

    # Luigi-style resume: if the terminal stage exists, nothing runs.
    if runner.exists("labels"):
        runner.metrics.append({"stage": "labels", "skipped": True})
        for s in ("features", "normalized"):
            if runner.exists(s):
                runner.metrics.append({"stage": s, "skipped": True})
        runner.flush_metrics()
        return spark.read.parquet(runner._path("labels"))

    feats_df = runner.run("features", lambda: extract_features(pages, cfg))
    # nstats carries the ECDF probe's exact row count out of the stage
    # closure (empty on a checkpoint-resume read — the fused init
    # sample then falls back to the separate TopK, same results)
    nstats: dict = {}
    norm_df = runner.run("normalized", lambda: normalize_features(feats_df, cfg, nstats))

    clustered, feats, stats, pca, km = cluster_documents(
        norm_df, cfg, persisted=runner._persisted, approx_rows=nstats.get("n_rows")
    )
    # Rank clusters by the mean scaled features of their members
    # (`clustered` feature columns are already min-max scaled). This is
    # a PURE PLAN (label_mod.keep_dim_plan): the k-row aggregate +
    # window rank fuse into the label job — no driver collect, one
    # fewer synchronous round trip (the non-scaling cost, VERDICT r1).
    dim = label_mod.keep_dim_plan(clustered, list(feats), cfg.keep_top)
    labels = (
        clustered.join(F.broadcast(dim), on="cluster", how="left")
        .na.fill({"keep": False})
        .select("url", "cluster", "keep")
        # one url-equi-join to re-attach the scrubbed payload — the only
        # time text crosses a shuffle after feature extraction
        .join(feats_df.select("url", "scrubbed_text"), on="url", how="inner")
        .select("url", "cluster", "keep", "scrubbed_text")
    )
    labels = runner.run("labels", lambda: labels)
    if not cfg.workdir:
        # runner.run persisted `labels` lazily; materialize it once so
        # every upstream cache (features, normalized, pca projection)
        # can be released — a long-lived session driving many pipelines
        # must not accrue executor memory (VERDICT r1 item 3).
        labels.count()
        for df_ in runner._persisted:
            if df_ is not labels:
                df_.unpersist()
        runner._persisted = [labels]
    runner.flush_metrics()
    return labels

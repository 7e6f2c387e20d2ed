"""Structured Streaming front-end for the quality filter.

The reference is strictly batch (Luigi file targets —
/root/reference/osmdq/analysis_tasks.py:36-43); resumable batch stages
remain this engine's contract (pipeline.py). This module adds the
streaming ingestion path a production crawl pipeline needs: the SAME
stateless feature/scrub/score expressions applied over
``readStream`` micro-batches, plus watermarked tumbling-window
statistics for monitoring. Model-dependent stages (PCA/KMeans) stay
batch-fit: streaming scoring uses a previously fitted model's
centroids as constants (the standard fit-offline / score-online
split), so the streaming plan is fully incremental — no stateful
shuffle beyond the windowed aggregation.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import ml
from .scrub import scrub
from .textstats import char_features
from .scorers import model_features, token_features
from .schema import PAGES


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    """File-source stream over a directory of pages parquet (the
    crawl-drop pattern: each new crawl segment lands as files)."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def score_stream(
    pages: DataFrame,
    feature_cols: list[str],
    centers: np.ndarray,
    keep_clusters: set[int],
    stats: dict[str, tuple[float, float]],
) -> DataFrame:
    """Stateless per-document scoring: features → scrub → min-max (with
    batch-fitted stats) → nearest batch-fitted centroid → keep flag.
    Every operator here is row-local, so the streaming plan has no
    shuffle at all — it scales with input rate."""
    df = scrub(model_features(token_features(char_features(pages))))
    missing = [c for c in feature_cols if c not in df.columns]
    if missing:
        raise ValueError(
            f"feature_cols not computable in the streaming plan: {missing} "
            "(ECDF u_* columns are batch-only; pass stream-computable features)"
        )
    if len(feature_cols) != centers.shape[1]:
        raise ValueError(
            f"centers have width {centers.shape[1]} but {len(feature_cols)} feature_cols "
            "were given — column i must align with centroid coordinate i"
        )
    scaled = ml.minmax_scale(df, feature_cols, stats)
    out = ml.kmeans_assign(scaled, feature_cols, centers, out="cluster")
    keep = F.col("cluster").isin(*[int(k) for k in keep_clusters]) if keep_clusters else F.lit(False)
    return out.select("url", "warc_ts", "cluster", keep.alias("keep"), "scrubbed_text")


DEDUP_STREAM_SCHEMA = "fingerprint string, keep_url string, n_in_batch long"
_DEDUP_STATE_SCHEMA = "seen long"


def dedup_stream(
    pages: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """CUSTOM STATEFUL STREAMING OPERATOR (applyInPandasWithState):
    cross-micro-batch exact dedup. State = one long per fingerprint
    (#occurrences so far); a fingerprint's FIRST arrival emits one row
    (fingerprint, keep_url, n_in_batch) and later arrivals emit
    nothing — the streaming counterpart of dedup.exact_dedup /
    dedup_keep_first. State is keyed by md5(text), so the shuffle is
    the same bounded-fanout equi-key as the batch groupBy.

    State bound at web scale: with ``state_ttl_ms`` set, every
    fingerprint carries a processing-time timeout refreshed on each
    arrival; a fingerprint idle for the TTL is evicted at a later
    micro-batch's timeout sweep (Spark fires the timed-out callback
    for keys WITHOUT input in that batch), and its next arrival
    re-emits as first-seen — dedup-within-horizon, O(active set)
    state. With the default ``None`` state grows one long per distinct
    document ever seen; for that forever-dedup mode configure the
    RocksDB state store (``spark.sql.streaming.stateStore
    .providerClass = ...RocksDBStateStoreProvider``) so state lives
    off-heap with incremental checkpoints instead of executor heap."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages.select(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fingerprint"),
        F.col(url_col).alias("url"),
    )

    def fn(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n_before = state.get[0] if state.exists else 0
        urls = []
        for pdf in pdfs:
            urls.extend(pdf["url"].tolist())
        state.update((n_before + len(urls),))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        if n_before == 0 and urls:
            yield pd.DataFrame(
                {"fingerprint": [key[0]], "keep_url": [min(urls)], "n_in_batch": [len(urls)]}
            )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if state_ttl_ms is not None else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        fn, DEDUP_STREAM_SCHEMA, _DEDUP_STATE_SCHEMA, "append", timeout
    )


def windowed_lang_stats(pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window ingest statistics per language —
    late pages beyond the watermark are dropped from the aggregation
    (bounded state)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.avg(F.length("text")).alias("avg_chars"),
        )
        .select(F.col("w.start").alias("window_start"), "lang", "n_pages", F.round("avg_chars", 4).alias("avg_chars"))
    )

"""Storage layout operators: partitioned and bucketed stage tables.

The reference's stages are flat CSV/HDF5 files (analysis_tasks.py
to_csv/to_hdf at every boundary). At 100 TB the LAYOUT of a stage
table is a first-class operator:

- ``write_partitioned`` — hive-style directory partitioning. A filter
  on the partition column prunes entire directories at planning time
  (`PartitionFilters` in the scan node): a per-crawl / per-language
  layout means a single-language query reads that language only.
- ``write_bucketed`` — pre-shuffled, bucket-sorted tables
  (``bucketBy``/``sortBy`` + ``saveAsTable``). Two tables bucketed by
  the same key into the same bucket count join WITHOUT any Exchange:
  the shuffle was paid once at write time and amortizes over every
  downstream join/aggregation on that key (the dedup/label pipelines
  re-key by url constantly). The no-Exchange property is asserted by
  tests and mirrors co-located joins on a real cluster.

Both are thin, typed wrappers — the value is the contract they pin
(tests assert pruning and exchange-freedom, so a layout regression
fails loudly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet: one directory per distinct
    partition-column tuple. Keep partition columns LOW-cardinality
    (crawl id, language, source) — a high-cardinality partition column
    creates millions of tiny files, the classic small-files failure."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucket-partitioned managed table: rows are hash-distributed into
    ``n_buckets`` files per partition by ``bucket_col`` and optionally
    sorted within each bucket. Joins/aggregations keyed on
    ``bucket_col`` between same-bucketed tables run with NO Exchange
    (and no sort, when ``sort_col`` matches the join key)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def spread_scan(df: DataFrame, min_split_bytes: int | None = None) -> DataFrame:
    """Restore scan-side parallelism for under-split inputs.

    An unsplittable or under-split input — a single-row-group parquet
    file, a gzip text shard, one giant file — yields fewer scan
    partitions than the session has cores, so every per-row operator
    downstream (shingle explode + hashing, Arrow UDF scoring, cosine
    arithmetic) runs on a handful of tasks regardless of cluster
    width (the optimization guide's "input skew" case, §2.5). A
    round-robin repartition to the session's default parallelism costs
    one shuffle of the base rows (small: the rows have not been
    exploded/derived yet) and makes the map side use every core.

    Scale-adaptive by construction: the condition reads the ACTUAL
    physical scan partitioning, so a real corpus scan (thousands of
    splits) is untouched and pays nothing — this is a mitigation for
    degenerate inputs, not a constant tuned to any fixture or core
    count.

    ``min_split_bytes`` optionally caps the spread width by the
    scanned file bytes (target ≤ bytes / min_split_bytes): operators
    that run MANY short jobs over the spread frame (the pipeline's
    probe/fit/Lloyd sequence) pay per-job scheduling for every
    partition, so shredding a small input to full core width makes
    the latency-bound regime strictly worse (measured: the sf0.1
    pipeline reads ~6.8 s at a bytes-scaled width vs ~8.6 s at full
    32-wide, identical at the 10× input). Compute-dense single-pass
    operators (shingle hashing, cosine math) omit it and take the
    full width.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if min_split_bytes:
        try:
            import os

            total = sum(
                os.path.getsize(f[len("file:"):] if f.startswith("file:") else f)
                for f in df.inputFiles()
            )
            target = max(1, min(target, int(total // int(min_split_bytes))))
        except OSError:
            pass
    if 1 < target > df.rdd.getNumPartitions():
        return df.repartition(target)
    return df

"""Classifier/filter evaluation: precision-recall curves and average
precision over a scored, labeled corpus — the calibration step between
training a quality scorer (``webdq.classifier``) and picking the keep
threshold the pipeline actually runs (``label.keep_dim_plan``,
``mixing.select_by_budget``).

Spark-first decomposition — exact WITHOUT a global single-partition
sort over the data (the naive cume-sum shape):

- collapse to one row per DISTINCT score (ties share a threshold by
  definition) with per-score positive/negative counts — one map-side-
  combined groupBy;
- range-bucket the distinct scores (affine map over a 1-row min/max
  aggregate — the ``select_by_budget`` pattern), take per-bucket
  totals, and run the cumulative over the ≤ n_buckets bucket rows
  (a window over a PARAMETER-bounded row count, never data-sized);
- add the within-bucket cumulative, partitioned BY BUCKET — every
  window is either tiny or partition-parallel.

Counts are integers (exact in any engine); precision/recall are single
IEEE divisions of those integers — value-exact cross-engine with no
rounding contract needed. Average precision is a float sum over
threshold order (round before cross-engine comparison).

Reference analog: none — the reference's evaluation is unsupervised
(silhouette/elbow, /root/reference/osmdq/unsupervised_learning.py);
PR calibration is the supervised-web-filter extension, from public
literature (step-rule AP as in sklearn's documentation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pr_curve(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 1024,
) -> DataFrame:
    """(threshold, tp, fp, fn, prec, rec) — one row per distinct score,
    where the classifier "predict positive ⇔ score >= threshold". Rows
    with a NULL score are excluded (no rank position); NULL labels
    count as negative. tp/fp/fn are exact integers; prec = tp/(tp+fp),
    rec = tp/P.

    Scale: the only data-sized shuffles are the distinct-score groupBy
    and the per-bucket windows (partitioned by bucket); the cross-
    bucket cumulative runs over ≤ n_buckets rows. With ~10^6 distinct
    scores per bucket at most, size n_buckets so buckets fit a task."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    score = F.col(score_col).cast("double")
    lab = F.coalesce(F.col(label_col).cast("boolean"), F.lit(False))
    g = (
        df.filter(score.isNotNull())
        .select(score.alias("_s"), lab.cast("int").alias("_y"))
        .groupBy("_s")
        .agg(
            F.sum("_y").cast("long").alias("_pos"),
            (F.count(F.lit(1)) - F.sum("_y")).cast("long").alias("_neg"),
        )
    )
    stats = g.agg(F.min("_s").alias("_lo"), F.max("_s").alias("_hi"))
    d = g.crossJoin(F.broadcast(stats)).withColumn(
        "_bkt",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.least(
                F.lit(int(n_buckets) - 1),
                F.floor(
                    (F.col("_s") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * int(n_buckets)
                ),
            )
        ),
    )
    # exclusive cumulative of the buckets ABOVE each bucket — a window
    # over ≤ n_buckets rows (parameter-bounded, disclosed)
    wa = (
        Window.orderBy(F.desc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        d.groupBy("_bkt")
        .agg(F.sum("_pos").alias("_bp"), F.sum("_neg").alias("_bn"))
        .select(
            "_bkt",
            F.coalesce(F.sum("_bp").over(wa), F.lit(0)).alias("_pos_above"),
            F.coalesce(F.sum("_bn").over(wa), F.lit(0)).alias("_neg_above"),
        )
    )
    # inclusive within-bucket cumulative, partition-parallel by bucket
    wi = (
        Window.partitionBy("_bkt")
        .orderBy(F.desc("_s"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = g.agg(F.sum("_pos").cast("long").alias("_P"))
    tp = (F.col("_pos_above") + F.sum("_pos").over(wi)).cast("long")
    fp = (F.col("_neg_above") + F.sum("_neg").over(wi)).cast("long")
    return (
        d.join(F.broadcast(offs), "_bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("_s").alias("threshold"),
            tp.alias("tp"),
            fp.alias("fp"),
            (F.col("_P") - tp).cast("long").alias("fn"),
            (tp / (tp + fp)).alias("prec"),
            (tp / F.col("_P")).alias("rec"),
        )
    )


def average_precision(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 1024,
) -> DataFrame:
    """1-row (avg_precision, n_thresholds): AP = Σ (rec_i − rec_{i−1})
    · prec_i over descending-score thresholds — the area under the PR
    curve by the step rule (sklearn's definition, public). The sum is
    a grouped float reduction: round before cross-engine comparison
    (the repo-wide 6dp contract)."""
    c = pr_curve(df, score_col, label_col, n_buckets)
    w = Window.orderBy(F.desc("threshold"))
    # window funcs can't nest inside aggregates — stage Δrec first
    d = c.select(
        "prec", (F.col("rec") - F.lag("rec", 1, 0.0).over(w)).alias("_drec")
    )
    return d.select(
        F.sum(F.col("_drec") * F.col("prec")).alias("avg_precision"),
        F.count(F.lit(1)).cast("long").alias("n_thresholds"),
    )

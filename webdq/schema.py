"""Every stage-boundary schema, explicit (SURVEY.md §1.3).

The reference hard-codes column lists at each Luigi task boundary
(/root/reference/osmdq/data_preparation_tasks.py:41,63-64) and relies
on pandas CSV inference for types. Here every boundary is an explicit
StructType; nothing is ever inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Pipeline input — exactly BASELINE.json input_hint.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Heuristic + model-backed per-document features (FIXTURES.md §B2).
# Analog of the reference's wide per-user metadata vector
# (/root/reference/osmdq/utils.py:422-463).
FEATURE_COLS = [
    "n_chars",
    "n_words",
    "mean_word_len",
    "stopword_ratio",
    "symbol_ratio",
    "digit_ratio",
    "upper_ratio",
    "dup_word_ratio",
    "dup_5gram_ratio",
    "langid_conf",
    "lang_match",
    "perplexity",
    "pii_hits",
]

FEATURES = T.StructType(
    [T.StructField("url", T.StringType(), False)]
    + [T.StructField(c, T.DoubleType(), True) for c in FEATURE_COLS]
)

# Final per-record label table (FIXTURES.md §B4).
LABELS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("cluster", T.IntegerType(), False),
        T.StructField("keep", T.BooleanType(), False),
        T.StructField("scrubbed_text", T.StringType(), True),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows", T.LongType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("wall_ms", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("partitions", T.IntegerType(), False),
        T.StructField("skew_max_over_mean", T.DoubleType(), True),
    ]
)

"""PR curve / average precision: python replay parity (exact integer
counts, tie handling), bucketing invariance, partition invariance."""

import pytest

from webdq import evaluation


ROWS = [
    # (score, label) — deliberate ties at 0.5 and 0.2
    (0.9, True), (0.8, True), (0.5, True), (0.5, False), (0.5, False),
    (0.4, True), (0.2, False), (0.2, True), (0.1, False), (0.0, False),
    (None, True),  # null score: excluded
    (0.7, None),   # null label: counts as negative
]


def _py_curve(rows):
    pts = [(s, bool(y)) for s, y in rows if s is not None]
    P = sum(1 for _, y in pts if y)
    out = {}
    for t in sorted({s for s, _ in pts}, reverse=True):
        tp = sum(1 for s, y in pts if s >= t and y)
        fp = sum(1 for s, y in pts if s >= t and not y)
        out[t] = (tp, fp, P - tp, tp / (tp + fp), tp / P)
    return out


def _py_ap(rows):
    curve = _py_curve(rows)
    ap, prev = 0.0, 0.0
    for t in sorted(curve, reverse=True):
        tp, fp, fn, prec, rec = curve[t]
        ap += (rec - prev) * prec
        prev = rec
    return ap


def _collect(spark, rows, n_buckets, repartition=None):
    df = spark.createDataFrame(rows, "score double, label boolean")
    if repartition:
        df = df.repartition(repartition)
    got = {}
    for r in evaluation.pr_curve(df, n_buckets=n_buckets).collect():
        got[r["threshold"]] = (r["tp"], r["fp"], r["fn"], r["prec"], r["rec"])
    return got


def test_pr_curve_matches_python(spark):
    exp = _py_curve(ROWS)
    for n_buckets in (1, 4, 1024):
        got = _collect(spark, ROWS, n_buckets)
        assert got == exp, f"n_buckets={n_buckets}"


def test_pr_curve_partition_invariance(spark):
    assert _collect(spark, ROWS, 4, repartition=7) == _collect(spark, ROWS, 4)


def test_average_precision_matches_python(spark):
    df = spark.createDataFrame(ROWS, "score double, label boolean")
    row = evaluation.average_precision(df, n_buckets=4).collect()[0]
    assert row["n_thresholds"] == len(_py_curve(ROWS))
    assert abs(row["avg_precision"] - _py_ap(ROWS)) < 1e-12
    # perfect classifier → AP exactly 1.0
    perfect = [(1.0, True), (0.9, True), (0.1, False), (0.0, False)]
    pdf = spark.createDataFrame(perfect, "score double, label boolean")
    assert evaluation.average_precision(pdf).collect()[0]["avg_precision"] == 1.0


def test_pr_curve_validation(spark):
    df = spark.createDataFrame(ROWS, "score double, label boolean")
    with pytest.raises(ValueError):
        evaluation.pr_curve(df, n_buckets=0)


def test_average_precision_bucket_invariance(spark):
    """r7: Δrec is computed per bucket with the boundary recall taken
    from the broadcast offsets (no global-order window). AP must be
    identical for every bucketing — including n_buckets=1 (one bucket,
    pure lag), many buckets with empty ones, and more buckets than
    distinct scores (every bucket boundary exercises the
    _pos_above/P fallback)."""
    import random

    rng = random.Random(7)
    rows = [(round(rng.uniform(0, 1), 3), rng.random() < 0.3) for _ in range(400)]
    # cluster scores at the extremes so mid-range buckets are empty
    rows += [(0.001 * i, True) for i in range(5)]
    rows += [(1.0 - 0.001 * i, False) for i in range(5)]
    exp = _py_ap(rows)
    df = spark.createDataFrame(rows, "score double, label boolean")
    for n_buckets in (1, 3, 64, 4096):
        row = evaluation.average_precision(df, n_buckets=n_buckets).collect()[0]
        assert abs(row["avg_precision"] - exp) < 1e-12, f"n_buckets={n_buckets}"
        assert row["n_thresholds"] == len({s for s, _ in rows})

"""Property-based checks (hypothesis) for the invariants most likely
to break under odd inputs: ECDF exactness with ties/duplicates/nulls,
and scrub byte-parity between the Spark regex chain and the pure-
Python oracle. Example counts are kept small — each case runs real
Spark jobs."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from webdq import normalize, oracle
from webdq.scrub import scrub_col, scrub_py

_spark = None


def _get_spark():
    # hypothesis fixtures + function-scoped pytest fixtures don't mix;
    # reuse the session-level SparkSession via the builder cache
    global _spark
    if _spark is None:
        from webdq.session import build_session

        _spark = build_session("local[4]", app_name="webdq-tests", shuffle_partitions=8)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-5, max_value=5).map(float),  # heavy ties
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32).map(float),
            st.none(),
        ),
        min_size=1,
        max_size=60,
    ),
    low_threshold=st.sampled_from([1, 10_000_000]),  # force bucketed vs broadcast path
)
def test_ecdf_matches_numpy_oracle(vals, low_threshold):
    """For ANY value multiset (ties, duplicates, nulls, extremes) and
    BOTH execution paths: non-null rows get exactly the numpy
    P(X <= x) over non-null values offset by the null count (nulls
    rank lowest, cume_dist peers)."""
    spark = _get_spark()
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, x double")
    out = {
        r["k"]: r["u_x"]
        for r in normalize.ecdf(df, ["x"], key_col="k", low_card_threshold=low_threshold).collect()
    }
    n = len(vals)
    non_null = np.array([v for v in vals if v is not None])
    n_null = n - len(non_null)
    s = np.sort(non_null)
    for i, v in enumerate(vals):
        got = out[i]
        if v is None:
            if n_null:
                assert abs(got - n_null / n) < 1e-12, (v, got)
        else:
            want = (n_null + np.searchsorted(s, v, side="right")) / n
            assert abs(got - want) < 1e-12, (v, got, want)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
        max_size=200,
    ),
    pii=st.sampled_from(
        ["", " a@b.io", " 555-123-4567", " 10.0.0.1 ", " badword1!", " x@y.com or 1.2.3.4"]
    ),
)
def test_scrub_byte_parity(text, pii):
    """Spark regexp_replace chain == pure-Python re.sub chain, byte for
    byte, for arbitrary text with PII fragments appended."""
    spark = _get_spark()
    from pyspark.sql import functions as F

    full = text + pii
    [row] = spark.createDataFrame([(full,)], "text string").select(
        scrub_col(F.col("text")).alias("s")
    ).collect()
    assert row["s"] == scrub_py(full)

"""Skew-defusing two-stage (salted) aggregation — the explicit form of
the north rule's "salted repartitioning by url-hash to defuse
host-level skew".

Spark's map-side partial aggregation already bounds most skew for
algebraic aggregates, but a hot KEY still lands its entire merge state
on one reducer when per-key state is large (collect-style aggs) or
when AQE is off. ``salted_agg`` makes the defusal explicit and
plan-visible: stage 1 aggregates by (keys…, salt) — the hot key's rows
spread over ``salt_buckets`` reducers — stage 2 merges the ≤
salt_buckets partials per key. For the supported algebraic functions
the result is EXACTLY the direct groupBy (oracle-checked, q68).

Salt must be deterministic for reproducibility: it hashes a
caller-named row-level column (an id — unique values spread evenly),
never rand().

Reference analog: the reference's per-user/changeset aggregations
(/root/reference/osmdq/utils.py:106-146) run eagerly in pandas where
skew means memory, not stragglers; the salted form is the distributed
re-expression for power-law web keys (host, domain, language).

Scale notes (10^12 rows): stage 1 is one shuffle on (keys, salt) with
map-side combine; stage 2 shuffles only #distinct-keys × salt_buckets
rows — negligible. Composes with AQE skew handling (which splits
partitions, not keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# out spec: name -> (func, col); funcs with algebraic merge
_STAGE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum, "bigint"),
    "sum": (lambda c: F.sum(c), F.sum, None),
    "min": (lambda c: F.min(c), F.min, None),
    "max": (lambda c: F.max(c), F.max, None),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    spec: dict,
    salt_on: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact grouped aggregation in two salted stages.

    ``spec`` maps output column → ("count"|"sum"|"min"|"max"|"avg",
    input column; ignored for count). ``avg`` decomposes to sum+count
    and divides at merge (exact). ``salt_on`` names the row-level
    column whose hash spreads each key over ``salt_buckets`` partial
    groups.

    Dtype parity: for decimal inputs ``sum`` is cast back to the
    direct-groupBy result type (one p+10 widening, not the two-stage
    p+20 — ADVICE r4). A decimal ``avg`` still carries the quotient
    precision of sum(decimal)/count rather than Spark's single-stage
    avg(decimal) precision; values match, the decimal dtype may not."""
    for name, (fn, _c) in spec.items():
        if fn not in (*_STAGE, "avg"):
            raise ValueError(f"unsupported agg {fn!r} for {name!r} (algebraic only)")
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(int(salt_buckets))).alias("_salt")

    partials = []
    merges = []
    finals = []
    for name, (fn, col) in spec.items():
        if fn == "avg":
            partials += [F.sum(col).alias(f"_s_{name}"), F.count(col).alias(f"_n_{name}")]
            merges += [F.sum(f"_s_{name}").alias(f"_s_{name}"), F.sum(f"_n_{name}").alias(f"_n_{name}")]
            # all-null group ⇒ n = 0: direct avg returns NULL; guard the
            # division (ANSI mode turns x/0 into a runtime error)
            finals.append(
                F.when(F.col(f"_n_{name}") > 0, F.col(f"_s_{name}") / F.col(f"_n_{name}"))
                .alias(name)
            )
        else:
            part, merge, cast = _STAGE[fn]
            if fn == "sum" and cast is None and isinstance(col, str) and col in df.columns:
                # decimal sum widens precision by 10 per aggregation
                # stage; cast the merge back to the DIRECT aggregate's
                # result type so the two-stage output dtype matches
                from pyspark.sql.types import DecimalType

                dt = df.schema[col].dataType
                if isinstance(dt, DecimalType):
                    cast = f"decimal({min(38, dt.precision + 10)},{dt.scale})"
            partials.append(part(col).alias(f"_p_{name}"))
            m = merge(f"_p_{name}")
            merges.append((m.cast(cast) if cast else m).alias(f"_m_{name}"))
            finals.append(F.col(f"_m_{name}").alias(name))

    stage1 = df.groupBy(*keys, salt).agg(*partials)
    stage2 = stage1.groupBy(*keys).agg(*merges)
    return stage2.select(*keys, *finals)

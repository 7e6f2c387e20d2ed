"""Corpus mixing & packing: the two ops between quality filtering and
tokenization that decide WHAT the training run actually sees.

- ``stratified_sample``: deterministic per-stratum (e.g. source,
  language) sampling at exact per-stratum rates — the data-mixing
  step ("20% code, 5% wiki, wikipedia ×2.5, ..."), down- AND
  up-sampling (rates > 1 repeat rows). Selection is by md5-rank
  within the stratum: order/partition-independent, reproducible
  across engines (md5 is identical in Spark and DuckDB, unlike
  xxhash64 which DuckDB lacks), and EXACT —
  floor(r)·n + ceil(frac(r)·n) rows per stratum, not a Bernoulli
  approximation like ``df.sample`` (whose per-row coin flips also
  change with partitioning).
- ``sequence_pack``: contiguous fixed-budget shard assignment —
  documents are laid out in a deterministic order, the concatenated
  token stream is cut at multiples of ``budget``, and each document
  lands in the shard where its first token falls (no document is
  split). Implemented as ONE window pass per stratum:
  shard boundaries fall out of the running token sum
  (floor((cumsum − n)/budget) is the classic contiguous-packing
  rewrite) — parallel across strata, no sequential driver loop.

Scale notes: both ops shuffle once on the stratum key. Strata are
few (sources × languages), so a heavy stratum can dominate a
partition; at 10^12 docs sub-salt the window by a hash prefix (pack
within (stratum, salt) and offset shard ids by salt · max_shards) —
the same contiguous-sum rewrite applies per salt.

Reference analog: the reference samples per-user activity windows for
its study areas (SURVEY.md §2.1); the exact-rate md5-rank selection is
the distributed re-expression of that deterministic subsetting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    rates: dict,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    copy_col: str | None = None,
) -> DataFrame:
    """Exact per-stratum mixing rates, down- AND up-sampling.

    Rate r = c + f (c = floor(r), f = frac): every row of the stratum
    is emitted c times, and the ceil(f · n) lowest-md5(id)-rank rows
    get one extra copy — so each stratum lands at exactly
    c·n + ceil(f·n) rows (for r ≤ 1 this is the plain "keep the
    ceil(r·n) lowest ranks" subset). Deterministic, partition-
    invariant, reproducible in any engine with md5. ``rates`` maps a
    stratum key (single value, or tuple matching ``strata_cols``) to
    its rate ≥ 0; absent strata use ``default_rate``. ``copy_col``:
    optionally expose the 1-based copy index (upsampled epochs).
    Rate-key python values must be createDataFrame-compatible with the
    stratum columns' Spark types (the rate table inherits them from
    ``df.schema`` — ADVICE r4: an all-string rate table silently
    cross-cast non-string strata in the equi-join)."""
    rate_rows = []
    for k, v in rates.items():
        key = k if isinstance(k, tuple) else (k,)
        if len(key) != len(strata_cols):
            raise ValueError(f"rate key {k!r} does not match strata {strata_cols}")
        if v < 0:
            raise ValueError(f"rate for {k!r} must be >= 0, got {v}")
        rate_rows.append((*key, float(v)))
    spark = df.sparkSession
    from pyspark.sql.types import DoubleType, StructField, StructType

    missing = [c for c in strata_cols if c not in df.columns]
    if missing:
        raise ValueError(f"strata columns {missing} not in DataFrame ({df.columns})")
    schema = StructType(
        [StructField(c, df.schema[c].dataType, True) for c in strata_cols]
        + [StructField("_rate", DoubleType(), False)]
    )
    rate_df = spark.createDataFrame(rate_rows, schema)

    w = Window.partitionBy(*strata_cols).orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    n = Window.partitionBy(*strata_cols)
    whole = F.floor(F.col("_rate")).cast("int")
    frac = F.col("_rate") - F.floor(F.col("_rate"))
    out = (
        df.join(F.broadcast(rate_df), on=strata_cols, how="left")
        .withColumn("_rate", F.coalesce(F.col("_rate"), F.lit(float(default_rate))))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        .withColumn(
            "_copies",
            whole + (F.col("_rn") <= F.ceil(frac * F.col("_n"))).cast("int"),
        )
        .filter(F.col("_copies") >= 1)
        .withColumn("_copy", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_rate", "_rn", "_n", "_copies")
    )
    if copy_col is None:
        return out.drop("_copy")
    return out.withColumnRenamed("_copy", copy_col)


def sequence_pack(
    df: DataFrame,
    budget: int,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    out: str = "shard_id",
) -> DataFrame:
    """Contiguous-stream sharding: documents are laid out in
    deterministic md5-rank order within each stratum, the concatenated
    token stream is cut at multiples of ``budget``, and every document
    is assigned the shard where its FIRST token lands:
    shard_id = floor((cumsum − n_tokens) / budget). One running-sum
    window per stratum; no sequential driver loop.

    Properties (tested): shard ids are contiguous from 0 per stratum;
    every shard's token total lies in (budget − max_doc, budget +
    max_doc) except the last; the assignment is partition-invariant.
    True reset-on-overflow greedy packing (never exceed the budget) is
    a sequential recurrence — it needs the stateful streaming path
    (applyInPandasWithState) or per-stratum mapInPandas, not a window;
    contiguous sharding is what large pretraining loaders actually use
    (docs are split/bled across shard boundaries downstream anyway)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    strata = strata_cols or []
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy(*strata).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    toks = F.col(tokens_col).cast("long")
    cum = F.sum(toks).over(w)
    return df.withColumn(out, F.floor((cum - toks) / F.lit(int(budget))))

def host_quota(
    df: DataFrame,
    host_col: str = "host",
    k: int = 1000,
    order_col: str | None = None,
    id_col: str = "doc_id",
    n_salt: int | None = None,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-host document cap (C4/RefinedWeb-style host budget): keep at
    most ``k`` documents per host, preferring higher ``order_col``
    (e.g. a quality score; ``None`` = no preference), ties broken by
    md5(id) then id — deterministic, partition-invariant, and
    reproducible in any engine with md5 (the ``stratified_sample``
    portability convention).

    Scale shape: a plain per-host window sorts EVERY page of a host in
    one partition — a hostile host with 10^9 pages becomes one
    straggler task. ``n_salt`` enables the exact two-stage TopK: stage
    one truncates to k within (host, salt) — salt = xxhash64(id) mod
    n_salt, deterministic per row — stage two runs the true window
    over the survivors, at most k·n_salt rows per host regardless of
    host size. Exact because each host's global top-k under a total
    order is contained in the union of its per-salt top-k's.

    Reference analog: the reference's per-user top-N activity recode
    (SURVEY.md §2 P6, `osm-data-classification` user-metadata top-N
    membership) applied at the host level, which is where web-scale
    skew actually lives."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    order = []
    if order_col is not None:
        order.append(F.desc(order_col))
    order += [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    out = df
    if n_salt is not None:
        if n_salt <= 0:
            raise ValueError(f"n_salt must be positive, got {n_salt}")
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(n_salt)))
        w1 = Window.partitionBy(F.col(host_col), salt).orderBy(*order)
        out = out.withColumn("_rn1", F.row_number().over(w1)).filter(
            F.col("_rn1") <= int(k)
        ).drop("_rn1")
    w = Window.partitionBy(host_col).orderBy(*order)
    out = out.withColumn("_host_rank", F.row_number().over(w)).filter(
        F.col("_host_rank") <= int(k)
    )
    if rank_col is None:
        return out.drop("_host_rank")
    return out.withColumnRenamed("_host_rank", rank_col)

def select_by_budget(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Budget-constrained corpus selection: keep the documents whose
    RUNNING token sum in (score desc, md5(id), id) order fits within
    ``budget`` — the "best documents up to a 10^12-token budget" step a
    classifier-scored pretraining corpus runs last. With strictly
    positive token counts this is exactly the greedy prefix (the first
    overflowing document stops the selection); a ZERO-token document
    ordered after the first overflow is still selected, since it fits
    the budget by definition — the running-sum contract (shared with
    the q79 oracle) is the authoritative one.

    Exact WITHOUT a global single-partition sort: scores are range-
    bucketed (affine map over the min/max from one 1-row aggregate —
    equal scores always share a bucket, so bucket order extends score
    order); per-bucket token sums (ONE map-side-combined groupBy) give
    a descending running total over ≤ n_buckets rows, which already
    decides every NON-boundary bucket wholesale: higher buckets are
    kept entirely, lower buckets dropped entirely. Only the single
    boundary bucket needs the exact within-bucket window, over its own
    rows alone. Degenerate case: if one score value holds most of the
    corpus, the boundary window is that value's row count — the same
    hot-stratum caveat as ``sequence_pack`` (sub-salt if it bites).

    Deterministic, partition-invariant, engine-portable (md5 ties);
    the oracle replays the plain global running-sum window. Rows with
    a NULL score are never selected (they have no place in the score
    order; the null bucket drops out of the stats equi-join); tokens
    must be non-null."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    score = F.col(score_col).cast("double")
    toks = F.col(tokens_col).cast("long")
    stats = df.agg(F.min(score).alias("_lo"), F.max(score).alias("_hi"))
    d = df.crossJoin(F.broadcast(stats)).withColumn(
        "_bkt",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(int(n_buckets) - 1),
                F.floor(
                    (score - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo"))
                    * int(n_buckets)
                ),
            )
        )
        .cast("int"),
    ).drop("_lo", "_hi")
    btbl = d.groupBy("_bkt").agg(F.sum(toks).alias("_btok"))
    wb = (
        Window.orderBy(F.desc("_bkt"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    btbl = btbl.withColumn("_bcum", F.sum("_btok").over(wb))
    binfo = btbl.agg(
        F.max(F.when(F.col("_bcum") > int(budget), F.col("_bkt"))).alias("_boundary")
    )
    d2 = d.join(
        F.broadcast(btbl.select("_bkt", (F.col("_bcum") - F.col("_btok")).alias("_prev"))),
        "_bkt",
    ).crossJoin(F.broadcast(binfo))
    full = d2.filter(F.col("_boundary").isNull() | (F.col("_bkt") > F.col("_boundary")))
    border = d2.filter(F.col("_bkt") == F.col("_boundary"))
    wd = (
        Window.partitionBy("_bkt")
        .orderBy(F.desc(score_col), F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    border = border.withColumn("_cum_in", F.sum(toks).over(wd)).filter(
        F.col("_prev") + F.col("_cum_in") <= int(budget)
    )
    helpers = ["_bkt", "_prev", "_boundary"]
    return full.drop(*helpers).unionByName(border.drop(*helpers, "_cum_in"))

def split_cuts(fractions: list[float]) -> list[int]:
    """Integer md5-space thresholds for ``hash_split`` — exposed so an
    oracle can embed the IDENTICAL literals (the cumulative float sum
    is reproduced, not re-derived: 0.8+0.1 != 0.9 in IEEE)."""
    M = 16**15
    cuts, c = [], 0.0
    for f in fractions[:-1]:
        c += f
        cuts.append(int(c * M))
    return cuts


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    by_col: str | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/valid/test corpus split: u = first 15 hex
    digits of md5(key) as a 60-bit integer, split = first name whose
    cumulative-fraction threshold exceeds u. Pure projection — no
    shuffle, no randomness, reproducible across engines and runs
    (md5 + integer thresholds; no float comparison anywhere).

    ``by_col`` makes the split GROUP-AWARE — e.g. ``by_col="host"``
    lands every page of a host in the same split, the leakage guard a
    web corpus actually needs (doc-level splits leak near-duplicate
    pages from one site across train/test). Group sizes skew the
    realized fractions; at web scale (many hosts) they concentrate.
    Fractions must sum to 1 (±1e-3); the last split absorbs the
    md5-space rounding remainder."""
    names = list(fractions)
    fr = [float(fractions[n]) for n in names]
    if len(names) < 2:
        raise ValueError("need at least two splits")
    if any(f <= 0 for f in fr) or not 0.999 <= sum(fr) <= 1.001:
        raise ValueError(f"fractions must be positive and sum to 1, got {fractions}")
    key = F.col(by_col if by_col is not None else id_col).cast("string")
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    w = None
    for name, cut in zip(names[:-1], split_cuts(fr)):
        w = F.when(h < cut, name) if w is None else w.when(h < cut, name)
    return df.withColumn(out_col, w.otherwise(names[-1]))


def temperature_mix(
    df: DataFrame,
    strata_cols: list[str],
    tau: float = 0.5,
    scale: float = 1.0,
    id_col: str = "doc_id",
    count_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-pretraining
    rebalance of Conneau & Lample '19 / mT5: sampled counts
    proportional to n_i^tau, tau < 1 flattens the domain distribution
    toward uniform, tau = 1 is natural): each stratum keeps
    keep_i = min(n_i, ceil(scale * n_i^tau)) documents, selected by
    md5(id)-rank — the same deterministic, partition-invariant,
    engine-portable selection as ``stratified_sample``, but with the
    rates DERIVED from the observed stratum sizes instead of supplied.
    ``scale`` positions the curve (choose scale ≈ N_target / Σ n_i^tau
    to hit a corpus budget). ``count_col`` optionally exposes n_i.

    Engine-portability note: at tau = 0.5, n^tau = sqrt(n) is
    CORRECTLY ROUNDED by IEEE-754 (sqrt is one of the five exactly-
    specified operations), and scale*sqrt(n) is one more correctly-
    rounded multiply — so keep_i is bit-identical across any two IEEE
    engines and the whole operator is value-exact replayable (the q85
    oracle). General tau uses pow(), which the standard only bounds to
    ~1 ulp — identical in practice, but the contract query pins 0.5.

    Scale shape: one map-side-combined groupBy for the stratum counts
    (strata are few — sources × languages — the count table
    broadcasts), one NULL-SAFE broadcast join (a null stratum value is
    a stratum like any other, sampled at its own n^tau rate — r6
    advice: the earlier equi-join silently dropped it), one
    per-stratum window for the md5 rank. A hostile stratum makes the
    window a straggler; at 10^12 docs pre-truncate with the
    host_quota two-stage salted TopK (exactness argument is
    identical)."""
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    missing = [c for c in strata_cols if c not in df.columns]
    if missing:
        raise ValueError(f"strata columns {missing} not in DataFrame ({df.columns})")
    counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("_n"))
    if tau == 0.5:
        pw = F.sqrt(F.col("_n").cast("double"))
    else:
        pw = F.pow(F.col("_n").cast("double"), F.lit(float(tau)))
    keep = counts.withColumn(
        "_keep",
        F.least(
            F.col("_n"),
            F.ceil(F.lit(float(scale)) * pw).cast("bigint"),
        ),
    )
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    # null-SAFE equi-join (ADVICE r6): a NULL stratum value is counted
    # by the groupBy above, and must be sampled like any other stratum
    # — a plain equi-join would silently drop the whole null stratum
    # from the output. Right-side strata columns are aliased away and
    # dropped after the join so the output schema is unchanged.
    keep_aliased = keep.select(
        *[F.col(c).alias(f"_ks_{i}") for i, c in enumerate(strata_cols)], "_n", "_keep"
    )
    cond = None
    for i, c in enumerate(strata_cols):
        clause = df[c].eqNullSafe(keep_aliased[f"_ks_{i}"])
        cond = clause if cond is None else (cond & clause)
    out = (
        df.join(F.broadcast(keep_aliased), cond, "inner")
        .drop(*[f"_ks_{i}" for i in range(len(strata_cols))])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_keep"))
        .drop("_rn", "_keep")
    )
    if count_col is None:
        return out.drop("_n")
    return out.withColumnRenamed("_n", count_col)

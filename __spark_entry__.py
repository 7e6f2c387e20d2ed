"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``    — flagship quality-filter pipeline at sf0.001.
``queries()``       — one entry per implemented operator (SURVEY.md §2);
                      each callable takes (spark, sf_dir) → DataFrame.
``oracle_sql()``    — matching ANSI SQL for DuckDB over the same tables.

Conventions shared by both sides so the driver's order-insensitive
value-hash matches: identical output column aliases, doubles produced
by aggregation rounded (exact window/count ratios left unrounded),
money sums computed in DECIMAL(18,2) for bit-exactness, timestamp
deltas computed on integer microseconds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from webdq import normalize
from webdq.pipeline import PipelineConfig, run_pipeline
from webdq.synth import pages_from_documents


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _us(col) -> F.Column:
    """Integer microseconds since epoch. Parquet timestamps arrive as
    TIMESTAMP_NTZ in Spark 4; session tz is pinned to UTC (session.py)
    so the cast matches DuckDB's naive-as-UTC epoch_us, and all uses
    below are differences, where any base offset cancels anyway."""
    return F.unix_micros(col.cast("timestamp"))


# --------------------------------------------------------------------------
# flagship: the full quality-filter pipeline (SURVEY.md §7.1 step 2)
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Quality-filter the sf0.001 documents table adapted to the pages
    schema; returns (url, cluster, keep, scrubbed_text)."""
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    cfg = PipelineConfig(k=4, pca_components=3, kmeans_init_sample=256, keep_top=1)
    return run_pipeline(spark, pages, cfg)


def q00_quality_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-SQL-expressible (PCA+KMeans) — driver records rows-only."""
    pages = pages_from_documents(spark, sf_dir)
    cfg = PipelineConfig(k=4, pca_components=3, kmeans_init_sample=512, keep_top=1)
    return run_pipeline(spark, pages, cfg)


# --------------------------------------------------------------------------
# J1 — latest version per entity (reference updatedelem, utils.py:21-31)
# --------------------------------------------------------------------------

def q01_latest_version(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
            F.col("ts").alias("last_ts"),
        )
    )


SQL_01 = """
SELECT user_id, event_id AS last_event_id, event_type AS last_type, ts AS last_ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# W1 — lead-based will-be-corrected flags (utils.py:271-275)
# --------------------------------------------------------------------------

def q02_lead_flags(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    nxt = F.lead("event_type").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(nxt != F.col("event_type"), F.lit(False)).alias("willbe_corr"),
        F.coalesce(nxt == F.col("event_type"), F.lit(False)).alias("willbe_autocorr"),
    )


SQL_02 = """
SELECT event_id, user_id,
       coalesce(lead(event_type) OVER w <> event_type, false) AS willbe_corr,
       coalesce(lead(event_type) OVER w = event_type, false) AS willbe_autocorr
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


# --------------------------------------------------------------------------
# W2 — time-to-next-modification in days (utils.py:278-293)
# --------------------------------------------------------------------------

def q03_time_to_next(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round((_us(nxt) - _us(F.col("ts"))) / 86400.0e6, 6).alias("next_in_days"),
    )


SQL_03 = """
SELECT event_id, user_id,
       round((epoch_us(lead(ts) OVER w) - epoch_us(ts)) / 86400.0e6, 6) AS next_in_days
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""


# --------------------------------------------------------------------------
# W3/W4 — per-user gap (hours) + rank of orders (utils.py:367-371)
# --------------------------------------------------------------------------

def q04_gap_rank(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round((_us(F.col("o_orderdate")) - _us(prev)) / 3.6e9, 6).alias("gap_hours"),
        F.rank().over(wr).alias("order_rank"),
    )


SQL_04 = """
SELECT o_orderkey, o_custkey,
       round((epoch_us(o_orderdate) - epoch_us(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))) / 3.6e9, 6) AS gap_hours,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS order_rank
FROM orders
"""


# --------------------------------------------------------------------------
# W5 — ECDF (utils.py:521-541); Spark side uses the bucketed-parallel
# exact ecdf (webdq.normalize.ecdf), oracle is plain cume_dist
# --------------------------------------------------------------------------

def q05_ecdf(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderkey", F.col("o_totalprice").alias("n_totalprice"))
    out = normalize.ecdf(o, ["n_totalprice"], key_col="o_orderkey", prefix="u_")
    return out.select("o_orderkey", "u_totalprice")


SQL_05 = """
SELECT o_orderkey, cume_dist() OVER (ORDER BY o_totalprice) AS u_totalprice FROM orders
"""


# --------------------------------------------------------------------------
# W6/O1/O2 — top-K by aggregate (unsupervised_learning.py:174)
# --------------------------------------------------------------------------

def q06_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_spend"))
        .orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        .limit(10)
    )


SQL_06 = """
SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM orders GROUP BY o_custkey ORDER BY total_spend DESC, o_custkey ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# W7 — cumulative share (extract_user_editor.py:90-91)
# --------------------------------------------------------------------------

def q07_cumshare(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    counts = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("tot"))
    w = Window.orderBy(F.desc("cnt"), F.asc("p_brand")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("cnt") / F.col("tot"), 6))
        .withColumn("cum_share", F.round(F.sum(F.col("cnt") / F.col("tot")).over(w), 6))
        .select("p_brand", "cnt", "share", "cum_share")
    )


SQL_07 = """
WITH c AS (SELECT p_brand, count(*) cnt FROM part GROUP BY p_brand),
     t AS (SELECT sum(cnt) tot FROM c)
SELECT p_brand, cnt, round(cnt/tot, 6) AS share,
       round(sum(cnt/tot) OVER (ORDER BY cnt DESC, p_brand ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_share
FROM c, t
"""


# --------------------------------------------------------------------------
# A1-A5 — core grouped aggregates (utils.py:106-331 family)
# --------------------------------------------------------------------------

def q08_agg_core(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_discounted"),
    )


SQL_08 = """
SELECT l_returnflag, count(*) AS n_rows, count(DISTINCT l_suppkey) AS n_supp,
       min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
       round(avg(l_quantity), 4) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS n_discounted
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# A6 — grouped quantiles v10/v90 (utils.py:149-179)
# --------------------------------------------------------------------------

def q09_quantiles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    q = F.percentile("l_extendedprice", F.array(F.lit(0.1), F.lit(0.9)))
    return li.groupBy("l_returnflag").agg(
        F.round(F.element_at(q, 1), 6).alias("v10_price"),
        F.round(F.element_at(q, 2), 6).alias("v90_price"),
    )


SQL_09 = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.1), 6) AS v10_price,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS v90_price
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# A8/A9 — pivot + row-wise sum across pivoted columns (utils.py:106-115)
# --------------------------------------------------------------------------

def q10_pivot(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("cnt_f"),
        F.col("O").alias("cnt_o"),
        (F.col("F") + F.col("O")).alias("cnt_total"),
    )


SQL_10 = """
SELECT l_returnflag,
       sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS cnt_f,
       sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS cnt_o,
       count(*) AS cnt_total
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# A10 — distinct / drop_duplicates (utils.py:365)
# --------------------------------------------------------------------------

def q11_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_custkey", "o_orderpriority")
        .dropDuplicates()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


SQL_11 = """
SELECT o_orderpriority, count(*) AS n_customers
FROM (SELECT DISTINCT o_custkey, o_orderpriority FROM orders) GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# A13/F3 — time-gridded snapshot counts, single-pass rewrite of the
# reference's O(months × data) loop (utils.py:69-83; SURVEY.md A13)
# --------------------------------------------------------------------------

def q12_monthly_snapshot(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("d"))
    bounds = o.agg(F.trunc(F.min("d"), "MM").alias("mn"), F.trunc(F.max("d"), "MM").alias("mx"))
    grid = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 month"))).alias("m0")
    ).select(F.last_day("m0").alias("month_end"))
    per_month = o.groupBy(F.last_day("d").alias("month_end")).agg(F.count(F.lit(1)).alias("c"))
    joined = grid.join(per_month, "month_end", "left").na.fill({"c": 0})
    w = Window.orderBy("month_end").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return joined.select("month_end", F.sum("c").over(w).alias("n_orders"))


SQL_12 = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) d FROM orders),
     b AS (SELECT date_trunc('month', min(d)) mn, date_trunc('month', max(d)) mx FROM o),
     grid AS (SELECT last_day(CAST(unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS DATE)) AS month_end FROM b),
     pm AS (SELECT last_day(d) month_end, count(*) c FROM o GROUP BY 1)
SELECT grid.month_end, sum(coalesce(pm.c, 0)) OVER (ORDER BY grid.month_end) AS n_orders
FROM grid LEFT JOIN pm ON pm.month_end = grid.month_end
"""


# --------------------------------------------------------------------------
# J3/J5 — star join with left-join + fill (utils.py:496-498,543-724)
# --------------------------------------------------------------------------

def q13_star_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(c, c["c_nationkey"] == n["n_nationkey"], "left")
        .groupBy("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_cust"),
            F.coalesce(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), F.lit(0).cast("decimal(18,2)")).cast("double").alias("total_acctbal"),
        )
    )


SQL_13 = """
SELECT r_name, n_name, count(c_custkey) AS n_cust,
       CAST(coalesce(sum(CAST(c_acctbal AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM nation JOIN region ON n_regionkey = r_regionkey
LEFT JOIN customer ON c_nationkey = n_nationkey
GROUP BY r_name, n_name
"""


# --------------------------------------------------------------------------
# J6/M9 — broadcast label join: derived small dim → per-record label
# (utils.py:332-341, the keep/drop analog)
# --------------------------------------------------------------------------

def q14_label_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    glob = c.agg(F.avg("c_acctbal").alias("g"))
    dim = (
        c.groupBy("c_nationkey")
        .agg(F.avg("c_acctbal").alias("nat_avg"))
        .crossJoin(F.broadcast(glob))
        .select("c_nationkey", F.when(F.col("nat_avg") > F.col("g"), F.lit("high")).otherwise(F.lit("low")).alias("label"))
    )
    return (
        c.join(F.broadcast(dim), "c_nationkey")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_cust"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )


SQL_14 = """
WITH g AS (SELECT avg(c_acctbal) g FROM customer),
     dim AS (SELECT c_nationkey, CASE WHEN avg(c_acctbal) > (SELECT g FROM g) THEN 'high' ELSE 'low' END AS label
             FROM customer GROUP BY c_nationkey)
SELECT label, count(*) AS n_cust, round(avg(c_acctbal), 4) AS avg_bal
FROM customer JOIN dim USING (c_nationkey) GROUP BY label
"""


# --------------------------------------------------------------------------
# J7 — distinct-pairs then join back (utils.py:364-366)
# --------------------------------------------------------------------------

def q15_dedup_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    err_users = ev.filter(F.col("event_type") == "error").select("user_id").dropDuplicates()
    return ev.join(err_users, "user_id").groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))


SQL_15 = """
SELECT user_id, count(*) AS n_events FROM events
WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# F1 — string canonicalization chain (extract_user_editor.py:32-48):
# lower → translate punctuation to space → regex extract → trim
# --------------------------------------------------------------------------

def q16_canonicalize(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    def canon(col):
        return F.trim(F.regexp_extract(F.translate(F.lower(col), "!?#~,()[]+", "          "), r"([a-z0-9 _\.]+).*", 1))
    return p.select("p_partkey", canon(F.col("p_type")).alias("canon_type"), canon(F.col("p_brand")).alias("canon_brand"))


SQL_16 = """
SELECT p_partkey,
       trim(regexp_extract(translate(lower(p_type), '!?#~,()[]+', '          '), '([a-z0-9 _\\.]+).*', 1)) AS canon_type,
       trim(regexp_extract(translate(lower(p_brand), '!?#~,()[]+', '          '), '([a-z0-9 _\\.]+).*', 1)) AS canon_brand
FROM part
"""


# --------------------------------------------------------------------------
# F2 — timestamp → float-days arithmetic (utils.py:200-208)
# --------------------------------------------------------------------------

def q17_datemath(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    horizon = o.agg(F.max("o_orderdate").alias("mx"))
    return (
        o.crossJoin(F.broadcast(horizon))
        .select(
            "o_orderkey",
            F.round((_us(F.col("mx")) - _us(F.col("o_orderdate"))) / 86400.0e6, 6).alias("age_days"),
        )
    )


SQL_17 = """
SELECT o_orderkey,
       round((epoch_us((SELECT max(o_orderdate) FROM orders)) - epoch_us(o_orderdate)) / 86400.0e6, 6) AS age_days
FROM orders
"""


# --------------------------------------------------------------------------
# F4 — log1p feature transform (utils.py:800-812)
# --------------------------------------------------------------------------

def q18_log1p(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(F.round(F.avg(F.log1p("l_quantity")), 6).alias("avg_log1p_qty"))


SQL_18 = """
SELECT l_returnflag, round(avg(ln(1 + l_quantity)), 6) AS avg_log1p_qty
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# F5/F6 — ratio-of-total normalization (utils.py:478,784-798)
# --------------------------------------------------------------------------

def q19_ratio(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select("o_orderpriority", "cnt", F.round(F.col("cnt") / F.col("tot"), 6).alias("share"))
    )


SQL_19 = """
WITH c AS (SELECT o_orderpriority, count(*) cnt FROM orders GROUP BY 1)
SELECT o_orderpriority, cnt, round(cnt / (SELECT sum(cnt) FROM c), 6) AS share FROM c
"""


# --------------------------------------------------------------------------
# P6 — recode by top-N membership (analysis_tasks.py:327-331)
# --------------------------------------------------------------------------

def q20_recode(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    top3 = (
        c.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("c_mktsegment"))
        .limit(3)
        .select(F.col("c_mktsegment").alias("seg"), F.lit(True).alias("is_top"))
    )
    return (
        c.join(F.broadcast(top3), c["c_mktsegment"] == F.col("seg"), "left")
        .select(F.when(F.col("is_top"), F.col("c_mktsegment")).otherwise(F.lit("other")).alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )


SQL_20 = """
WITH top3 AS (SELECT c_mktsegment seg FROM customer GROUP BY 1 ORDER BY count(*) DESC, seg ASC LIMIT 3)
SELECT CASE WHEN c_mktsegment IN (SELECT seg FROM top3) THEN c_mktsegment ELSE 'other' END AS segment,
       count(*) AS n_cust
FROM customer GROUP BY 1
"""


# --------------------------------------------------------------------------
# P2 — compound boolean predicates (utils.py:606-693)
# --------------------------------------------------------------------------

def q21_compound_filter(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(((F.col("event_type") == "error") | (F.col("value") > 90.0)) & ~(F.col("user_id") % 10 == 0))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_21 = """
SELECT event_type, count(*) AS n FROM events
WHERE (event_type = 'error' OR value > 90.0) AND NOT (user_id % 10 = 0)
GROUP BY event_type
"""


# --------------------------------------------------------------------------
# O3 — union of heterogeneous per-group counts (tagmetanalyse.py:43-45)
# --------------------------------------------------------------------------

def q22_union(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    a = li.groupBy(F.col("l_returnflag").alias("key")).agg(F.count(F.lit(1)).alias("cnt")).withColumn("src", F.lit("lineitem"))
    b = o.groupBy(F.col("o_orderstatus").alias("key")).agg(F.count(F.lit(1)).alias("cnt")).withColumn("src", F.lit("orders"))
    return a.unionByName(b).select("src", "key", "cnt")


SQL_22 = """
SELECT 'lineitem' AS src, l_returnflag AS key, count(*) AS cnt FROM lineitem GROUP BY 2
UNION ALL
SELECT 'orders' AS src, o_orderstatus AS key, count(*) AS cnt FROM orders GROUP BY 2
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q00_quality_pipeline": q00_quality_pipeline,
    "q01_latest_version": q01_latest_version,
    "q02_lead_flags": q02_lead_flags,
    "q03_time_to_next": q03_time_to_next,
    "q04_gap_rank": q04_gap_rank,
    "q05_ecdf": q05_ecdf,
    "q06_topk": q06_topk,
    "q07_cumshare": q07_cumshare,
    "q08_agg_core": q08_agg_core,
    "q09_quantiles": q09_quantiles,
    "q10_pivot": q10_pivot,
    "q11_distinct": q11_distinct,
    "q12_monthly_snapshot": q12_monthly_snapshot,
    "q13_star_join": q13_star_join,
    "q14_label_join": q14_label_join,
    "q15_dedup_join": q15_dedup_join,
    "q16_canonicalize": q16_canonicalize,
    "q17_datemath": q17_datemath,
    "q18_log1p": q18_log1p,
    "q19_ratio": q19_ratio,
    "q20_recode": q20_recode,
    "q21_compound_filter": q21_compound_filter,
    "q22_union": q22_union,
}

_ORACLES: dict[str, str] = {
    "q01_latest_version": SQL_01,
    "q02_lead_flags": SQL_02,
    "q03_time_to_next": SQL_03,
    "q04_gap_rank": SQL_04,
    "q05_ecdf": SQL_05,
    "q06_topk": SQL_06,
    "q07_cumshare": SQL_07,
    "q08_agg_core": SQL_08,
    "q09_quantiles": SQL_09,
    "q10_pivot": SQL_10,
    "q11_distinct": SQL_11,
    "q12_monthly_snapshot": SQL_12,
    "q13_star_join": SQL_13,
    "q14_label_join": SQL_14,
    "q15_dedup_join": SQL_15,
    "q16_canonicalize": SQL_16,
    "q17_datemath": SQL_17,
    "q18_log1p": SQL_18,
    "q19_ratio": SQL_19,
    "q20_recode": SQL_20,
    "q21_compound_filter": SQL_21,
    "q22_union": SQL_22,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)

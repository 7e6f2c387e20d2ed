"""Round-7 profiling harness (guide §1): isolate sub-stages of the hot
headline queries with the noop sink, at an arbitrary SF dir.

Usage: python tools/profile_r07.py [sf_dir] [which ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F, Window

from webdq.session import build_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
WHICH = set(sys.argv[2:]) or {"q44"}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn, action="noop"):
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(label)
    t0 = time.time()
    df = fn()
    if action == "noop":
        noop(df)
        n = None
    else:
        n = df.count()
    w = time.time() - t0
    print(f"{label:55s} {w:8.3f} s" + (f"  rows={n}" if n is not None else ""), flush=True)
    spark.sparkContext.setJobDescription(None)
    return w


def main():
    spark = build_session("local[32]", app_name="webdq-profile-r07", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    # warm-up (same as bench)
    qs["q00_quality_pipeline"](spark, "/root/testdata/sf0.001").count()

    from webdq import dedup

    def t(name):
        return spark.read.parquet(os.path.join(SF, f"{name}.parquet"))

    if "q44" in WHICH:
        docs = t("documents")
        # stage 1: shingles only (explode, no md5)
        from webdq.dedup import _shingles

        timed(spark, "q44.1 shingle explode only", lambda: docs.select(
            F.col("doc_id"), F.explode(_shingles("text", 3, distinct=False)).alias("_t")))
        # stage 2: signatures (explode + 8x md5 + groupBy + stack)
        timed(spark, "q44.2 signatures r=2", lambda: dedup.minhash_signatures(
            docs, n_bands=4, shingle_n=3, rows_per_band=2))
        # stage 3: signatures + window bucket-count filter
        def sig_flt():
            sig = dedup.minhash_signatures(docs, n_bands=4, shingle_n=3, rows_per_band=2)
            cnt = Window.partitionBy("band", "minhash")
            return sig.withColumn("_n", F.count(F.lit(1)).over(cnt)).filter(F.col("_n") <= 1000).drop("_n")
        timed(spark, "q44.3 sig + window filter", sig_flt)
        # stage 4: full query (count like bench)
        timed(spark, "q44.4 full pairs (count)", lambda: qs["q44_minhash_banded"](spark, SF), action="count")
        timed(spark, "q44.4b full pairs again", lambda: qs["q44_minhash_banded"](spark, SF), action="count")

    if "q29" in WHICH:
        timed(spark, "q29 full (count)", lambda: qs["q29_minhash_lsh_pairs"](spark, SF), action="count")

    if "q33" in WHICH:
        timed(spark, "q33 full (count)", lambda: qs["q33_ann_topk"](spark, SF), action="count")

    if "q00" in WHICH:
        timed(spark, "q00 full (count)", lambda: qs["q00_quality_pipeline"](spark, SF), action="count")

    if "headline" in WHICH:
        for name in ("q01_latest_version q04_gap_rank q05_ecdf q08_agg_core q09_quantiles "
                     "q12_monthly_snapshot q13_star_join q16_canonicalize q25_exact_dedup "
                     "q42_host_agg").split():
            timed(spark, name, lambda n=name: qs[n](spark, SF), action="count")

    spark.stop()


if __name__ == "__main__":
    main()

"""Decompose the features stage to find the non-scaling component.

    python tools/profile_features.py prep 600000         # write input parquet
    python tools/profile_features.py run 'local[2]' [core_offset]

Phases (each forced by an aggregate, no driver collect of data):
  gen      — synthetic page generation (interpreted HOFs)
  read     — parquet scan + text length sum
  charf    — char_features regex expressions
  scorers  — fused Arrow-UDF scorers
  scrub    — regexp_replace chain
  full     — char+scorers+scrub + persist + count (pipeline shape)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/webdq_prof_pages"


def main() -> None:
    mode = sys.argv[1]
    from pyspark.sql import functions as F

    from webdq.session import build_session
    from webdq.synth import generate_pages

    if mode == "prep":
        n_docs = int(sys.argv[2])
        spark = build_session("local[32]", app_name="prof-prep", shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        generate_pages(spark, n_docs, partitions=32).drop("_tier").write.mode("overwrite").parquet(PATH)
        spark.stop()
        return

    master = sys.argv[2]
    off = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n = int(master[master.find("[") + 1 : master.find("]")])
    os.sched_setaffinity(0, set(range(off, off + n)))

    from webdq.scorers import all_scorer_features
    from webdq.scrub import scrub
    from webdq.textstats import char_features

    spark = build_session(master, app_name=f"prof-feat-{n}", shuffle_partitions=max(8, n))
    spark.sparkContext.setLogLevel("ERROR")

    t: dict[str, float] = {}

    def force(df, cols=("text",)):
        aggs = []
        for c in cols:
            dt = dict(df.dtypes)[c]
            aggs.append(F.sum(F.length(c)) if dt == "string" else F.sum(F.col(c)))
        return df.agg(*aggs).collect()

    def phase(name, fn, warm_fn=None):
        if warm_fn:
            warm_fn()
        t0 = time.time()
        fn()
        t[name] = round(time.time() - t0, 2)

    n_docs = 600_000
    gen = generate_pages(spark, n_docs, partitions=max(8, n * 2)).drop("_tier")
    gen_w = generate_pages(spark, 20_000, partitions=max(8, n)).drop("_tier")
    phase("gen", lambda: force(gen), lambda: force(gen_w))

    pages = spark.read.parquet(PATH)
    pages_w = pages.limit(20_000)
    phase("read", lambda: force(pages))
    charf_cols = ("symbol_ratio", "digit_ratio", "upper_ratio", "pii_hits")
    phase("charf", lambda: force(char_features(pages), charf_cols), lambda: force(char_features(pages_w), charf_cols))
    sc_cols = ("perplexity", "n_words", "langid_conf", "dup_5gram_ratio")
    phase("scorers", lambda: force(all_scorer_features(pages), sc_cols), lambda: force(all_scorer_features(pages_w), sc_cols))
    phase("scrub", lambda: force(scrub(pages), ("scrubbed_text",)), lambda: force(scrub(pages_w), ("scrubbed_text",)))

    def full():
        df = scrub(all_scorer_features(char_features(pages))).drop("html").persist()
        df.count()
        df.unpersist()

    phase("full", full)
    print(json.dumps({"master": master, "phases": t}))
    spark.stop()


if __name__ == "__main__":
    main()

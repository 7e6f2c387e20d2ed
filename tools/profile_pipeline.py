"""Per-stage wall-time profile of the quality pipeline at one
parallelism level (CPU-pinned like bench.py's child). Usage:

    python tools/profile_pipeline.py local[2] 600000 [core_offset]

Prints one JSON line with per-phase seconds so the non-scaling
remainder (driver-synchronous latency vs parallel work) is visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    master = sys.argv[1]
    n_docs = int(sys.argv[2])
    off = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    n = int(master[master.find("[") + 1 : master.find("]")])
    os.sched_setaffinity(0, set(range(off, off + n)))

    from pyspark.sql import functions as F

    from webdq import ml, normalize
    from webdq.pipeline import CLUSTER_FEATURES, ECDF_FEATURES, PipelineConfig, extract_features
    from webdq.session import build_session
    from webdq.synth import generate_pages

    spark = build_session(master, app_name=f"webdq-prof-{n}", shuffle_partitions=max(8, n))
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig(k=5, pca_components=4, kmeans_init_sample=2048, kmeans_max_iter=10)

    # warm-up (same as bench child)
    from webdq.pipeline import run_pipeline

    warm = generate_pages(spark, 20_000, partitions=max(8, n))
    run_pipeline(spark, warm.drop("_tier"), cfg).count()
    spark.catalog.clearCache()

    pages = generate_pages(spark, n_docs, partitions=max(8, n * 2))
    t: dict[str, float] = {}

    def tick(name: str, t0: float) -> None:
        t[name] = round(time.time() - t0, 2)

    t_all = time.time()
    t0 = time.time()
    feats_df = extract_features(pages.drop("_tier"), cfg).persist()
    feats_df.count()
    tick("features", t0)

    numeric = [c for c in feats_df.columns if c not in ("text", "scrubbed_text", "lang", "warc_ts", "html")]
    t0 = time.time()
    norm_df = normalize.ecdf(feats_df.select(*numeric), ECDF_FEATURES, key_col="url", prefix="u_").persist()
    norm_df.count()
    tick("ecdf", t0)

    t0 = time.time()
    stats, pca = ml.fit_scaled_pca(norm_df, CLUSTER_FEATURES, n_components=cfg.pca_components)
    tick("pca_fit", t0)

    t0 = time.time()
    scaled = ml.minmax_scale(norm_df, CLUSTER_FEATURES, stats)
    pc_cols = [f"pc_{j}" for j in range(pca.loadings.shape[1])]
    proj = ml.pca_project(scaled, pca).select("url", *CLUSTER_FEATURES, *pc_cols).persist()
    proj.count()
    tick("project", t0)

    t0 = time.time()
    km = ml.kmeans_fit(proj, pc_cols, k=cfg.k, key_col="url", max_iter=cfg.kmeans_max_iter,
                       init_sample=cfg.kmeans_init_sample, seed=cfg.seed)
    tick("kmeans", t0)
    t["kmeans_iters"] = km.iterations

    t0 = time.time()
    clustered = ml.kmeans_assign(proj, pc_cols, km.centers, out="cluster")
    clustered.groupBy("cluster").agg(*[F.avg(c).alias(c) for c in CLUSTER_FEATURES]).collect()
    tick("centroid_rank", t0)

    t0 = time.time()
    clustered.select("url", "cluster").join(
        feats_df.select("url", "scrubbed_text"), on="url", how="inner"
    ).count()
    tick("label_join", t0)

    t["total"] = round(time.time() - t_all, 2)
    print(json.dumps({"master": master, "n_docs": n_docs, "phases": t}))
    spark.stop()


if __name__ == "__main__":
    main()

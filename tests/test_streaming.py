"""Streaming path: availableNow file-source micro-batches → memory sink."""

import numpy as np
from pyspark.sql import functions as F

from webdq import streaming
from webdq.pipeline import CLUSTER_FEATURES
from webdq.synth import generate_pages


def test_windowed_lang_stats(spark, tmp_path):
    src = str(tmp_path / "pages")
    generate_pages(spark, 400).drop("_tier").write.parquet(src)
    stream = streaming.read_pages_stream(spark, src, max_files=4)
    agg = streaming.windowed_lang_stats(stream, window="30 days", watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("lang_stats")
        .outputMode("complete")  # append would withhold windows still inside the watermark at stream end
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from lang_stats").collect()
    assert sum(r["n_pages"] for r in out) == 400
    assert {r["lang"] for r in out} == {"en", "de"}


def test_score_stream_matches_batch(spark, tmp_path):
    """Streaming scoring with batch-fitted constants == batch scoring."""
    from webdq import ml
    from webdq.scrub import scrub
    from webdq.textstats import char_features
    from webdq.scorers import model_features, token_features

    src = str(tmp_path / "pages2")
    pages = generate_pages(spark, 300).drop("_tier")
    pages.write.parquet(src)

    # fit constants in batch on scaled heuristic features
    feats = [c for c in CLUSTER_FEATURES if not c.startswith("u_")]
    batch = scrub(model_features(token_features(char_features(pages))))
    stats, _ = ml.fit_scaled_pca(batch, feats, n_components=3)
    km = ml.kmeans_fit(ml.minmax_scale(batch, feats, stats), feats, k=3, key_col="url", init_sample=256)
    batch_out = {
        r["url"]: (r["cluster"], r["keep"])
        for r in ml.kmeans_assign(ml.minmax_scale(batch, feats, stats), feats, km.centers, "cluster")
        .withColumn("keep", (F.col("cluster") == 0))
        .select("url", "cluster", "keep")
        .collect()
    }

    stream = streaming.read_pages_stream(spark, src, max_files=8)
    scored = streaming.score_stream(stream, feats, km.centers, {0}, stats)
    q = (
        scored.writeStream.format("memory")
        .queryName("scored_pages")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["url"]: (r["cluster"], r["keep"]) for r in spark.sql("select * from scored_pages").collect()}
    assert got == batch_out


def test_dedup_stream_stateful(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: exactly one emitted
    row per distinct fingerprint even when duplicates span micro-
    batches; totals match the batch exact_dedup."""
    from webdq import dedup

    src = str(tmp_path / "pages3")
    base = generate_pages(spark, 120).drop("_tier")
    # duplicate every text under new urls, written as a SECOND file so
    # the copies arrive in a later micro-batch than the originals
    dup = base.withColumn("url", F.concat(F.lit("https://mirror.example/"), F.col("url")))
    base.coalesce(1).write.parquet(src)
    dup.coalesce(1).write.mode("append").parquet(src)

    stream = streaming.read_pages_stream(spark, src, max_files=1)
    out = streaming.dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from dedup_stream_out").collect()

    batch = dedup.exact_dedup(
        base.unionByName(dup).selectExpr("url as doc_id", "text"), id_col="doc_id"
    ).collect()
    assert len(got) == len(batch)  # one row per distinct fingerprint
    assert {r["fingerprint"] for r in got} == {r["fingerprint"] for r in batch}

"""ANN: brute-force exactness vs numpy; LSH recall on clustered data."""

import numpy as np

from webdq import similarity


def _emb_df(spark, n=120, dim=16, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(4, dim) * 3
    X = np.vstack([c + 0.2 * rng.randn(n // 4, dim) for c in centers])
    rows = [(i, X[i].tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), X


def test_bruteforce_matches_numpy(spark):
    df, X = _emb_df(spark)
    q = df.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    got = similarity.cosine_topk(df, q, k=5).collect()
    norm = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = norm @ norm.T
    for qid in range(3):
        s = sims[qid].copy()
        s[qid] = -np.inf
        exp = np.argsort(-s, kind="stable")[:5]
        mine = [r["neighbor_id"] for r in sorted((r for r in got if r["query_id"] == qid), key=lambda r: r["rank"])]
        assert mine == list(exp), f"query {qid}"


def test_lsh_topk_recall(spark):
    df, X = _emb_df(spark)
    q = df.filter("vec_id < 8").selectExpr("vec_id as query_id", "embedding")
    exact = similarity.cosine_topk(df, q, k=5)
    approx = similarity.lsh_topk(df, q, dim=16, k=5, n_bits=8)
    rec = similarity.ann_recall(exact, approx)
    assert rec >= 0.8, f"LSH recall {rec}"


def test_lsh_buckets_deterministic(spark):
    df, _ = _emb_df(spark)
    a = {r["vec_id"]: r["bucket"] for r in similarity.lsh_buckets(df.repartition(1), dim=16).collect()}
    b = {r["vec_id"]: r["bucket"] for r in similarity.lsh_buckets(df.repartition(7), dim=16).collect()}
    assert a == b


def test_ivf_topk_recall_and_exhaustive_exact(spark):
    """IVF ANN: decent recall at nprobe << nlist on clustered data;
    nprobe == nlist (exhaustive probing) must equal the exact top-k
    bit-for-bit."""
    df, _ = _emb_df(spark)
    q = df.filter("vec_id < 6").selectExpr("vec_id as query_id", "embedding")
    cents = similarity.ivf_fit(df, nlist=8, sample_n=120)
    exact = similarity.cosine_topk(df, q, k=5)
    approx = similarity.ivf_topk(df, q, cents, k=5, nprobe=2)
    assert similarity.ann_recall(exact, approx) >= 0.8
    exhaustive = similarity.ivf_topk(df, q, cents, k=5, nprobe=8)
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, exhaustive.collect()))
    assert a == b


def test_ivf_fit_deterministic(spark):
    df, _ = _emb_df(spark)
    c1 = similarity.ivf_fit(df, nlist=8, sample_n=120)
    c2 = similarity.ivf_fit(df.repartition(9), nlist=8, sample_n=120)
    np.testing.assert_array_equal(c1, c2)

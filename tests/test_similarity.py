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


def test_embedding_neardup_lsh_blocking(spark):
    """Self-contained LSH-blocked near-dup: exact duplicates are
    recovered with recall 1 BY CONSTRUCTION (identical sign patterns),
    noisy near-dups at recall >= 0.8, and every emitted pair truly
    clears the threshold (numpy-verified precision)."""
    rng = np.random.RandomState(9)
    dim = 16
    base = rng.randn(60, dim)
    rows = [(i, base[i].tolist()) for i in range(60)]
    # 10 exact duplicates + 10 near duplicates (tiny noise)
    for j in range(10):
        rows.append((1000 + j, base[j].tolist()))
        noisy = base[20 + j] + 0.02 * rng.randn(dim)
        rows.append((2000 + j, noisy.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.embedding_neardup_pairs_lsh(
        df, dim=dim, threshold=0.95, n_bits=8, n_tables=4
    ).collect()
    pairs = {(r["id1"], r["id2"]) for r in out}
    assert all((j, 1000 + j) in pairs for j in range(10)), "exact dups must all collide"
    near_found = sum((20 + j, 2000 + j) in pairs for j in range(10))
    assert near_found >= 8
    # precision: recompute every emitted cosine in numpy
    vecs = {r[0]: np.array(r[1]) for r in rows}
    for r in out:
        a, b = vecs[r["id1"]], vecs[r["id2"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= 0.95 - 1e-9
        assert abs(cos - r["cosine"]) < 1e-5

"""Corpus mixing & packing (webdq/mixing.py).

Gates: exact per-stratum rates (ceil(rate·n), not Bernoulli),
partition invariance of the md5-rank selection, default-rate path,
and sequence_pack equivalence to an independent pandas reference
(sort by md5 → cumsum → floor((cum−n)/budget)) plus the contiguous
shard-total bound.
"""

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from webdq import mixing


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["a", "b", "c"][i % 3], 1 + (i * 7) % 40)
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens int").persist()


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def test_stratified_exact_rates(docs):
    out = mixing.stratified_sample(
        docs, ["source"], {"a": 0.5, "b": 0.13}, default_rate=0.02
    )
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == math.ceil(0.5 * 100)
    assert counts["b"] == math.ceil(0.13 * 100)
    assert counts["c"] == math.ceil(0.02 * 100)  # default_rate path


def test_stratified_deterministic_and_partition_invariant(docs):
    kw = dict(strata_cols=["source"], rates={"a": 0.3, "b": 0.3, "c": 0.3})
    ids1 = {r["doc_id"] for r in mixing.stratified_sample(docs.repartition(7), **kw).collect()}
    ids2 = {r["doc_id"] for r in mixing.stratified_sample(docs.repartition(2), **kw).collect()}
    assert ids1 == ids2
    # selection is the lowest md5 ranks — replay on the driver
    pdf = docs.toPandas()
    for src, grp in pdf.groupby("source"):
        want = set(
            grp.assign(h=grp.doc_id.map(_md5))
            .sort_values(["h", "doc_id"])
            .head(math.ceil(0.3 * len(grp)))
            .doc_id
        )
        assert {i for i in ids1 if pdf.set_index("doc_id").source[i] == src} == want


def test_stratified_upsampling_exact_counts(docs):
    out = mixing.stratified_sample(
        docs, ["source"], {"a": 2.5, "b": 3.0}, default_rate=0.1, copy_col="copy"
    )
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 2 * 100 + math.ceil(0.5 * 100)
    assert counts["b"] == 3 * 100
    assert counts["c"] == math.ceil(0.1 * 100)
    # copy index: every 'a' doc appears with copies {1,2} or {1,2,3};
    # the extra-copy docs are the lowest md5 ranks
    pdf = out.filter(F.col("source") == "a").toPandas()
    per_doc = pdf.groupby("doc_id")["copy"].agg(["count", "max"])
    assert set(per_doc["count"].unique()) == {2, 3}
    assert (per_doc["count"] == per_doc["max"]).all()
    tripled = set(per_doc[per_doc["count"] == 3].index)
    src = docs.filter(F.col("source") == "a").toPandas()
    want = set(
        src.assign(h=src.doc_id.map(_md5)).sort_values(["h", "doc_id"]).head(50).doc_id
    )
    assert tripled == want


def test_stratified_negative_rate_raises(docs):
    with pytest.raises(ValueError):
        mixing.stratified_sample(docs, ["source"], {"a": -0.1})


def test_stratified_rate_key_mismatch_raises(docs):
    with pytest.raises(ValueError):
        mixing.stratified_sample(docs, ["source", "doc_id"], {"a": 0.5})


def test_sequence_pack_matches_pandas_reference(docs):
    budget = 100
    out = mixing.sequence_pack(docs, budget=budget, strata_cols=["source"]).toPandas()
    ref = docs.toPandas()
    ref["h"] = ref.doc_id.map(_md5)
    ref = ref.sort_values(["source", "h", "doc_id"])
    cum = ref.groupby("source").n_tokens.cumsum()
    ref["shard_id"] = ((cum - ref.n_tokens) // budget).astype("int64")
    got = out.set_index("doc_id").shard_id
    want = ref.set_index("doc_id").shard_id
    assert got.sort_index().equals(want.sort_index())


def test_sequence_pack_shard_properties(docs):
    budget = 100
    out = mixing.sequence_pack(docs, budget=budget, strata_cols=["source"]).toPandas()
    max_doc = int(out.n_tokens.max())
    for src, grp in out.groupby("source"):
        shards = sorted(grp.shard_id.unique())
        # contiguous from 0
        assert shards == list(range(len(shards)))
        totals = grp.groupby("shard_id").n_tokens.sum()
        # every shard except the last holds ~budget tokens (first-token
        # cut ⇒ total within one max-document of the budget)
        for sid in shards[:-1]:
            assert budget - max_doc < totals[sid] < budget + max_doc


def test_sequence_pack_partition_invariant(docs):
    a = mixing.sequence_pack(docs.repartition(7), budget=64, strata_cols=["source"]).toPandas()
    b = mixing.sequence_pack(docs.repartition(2), budget=64, strata_cols=["source"]).toPandas()
    assert a.set_index("doc_id").shard_id.sort_index().equals(
        b.set_index("doc_id").shard_id.sort_index()
    )


def test_sequence_pack_global_no_strata(docs):
    out = mixing.sequence_pack(docs, budget=1 << 60).toPandas()
    assert (out.shard_id == 0).all()


def test_sequence_pack_bad_budget_raises(docs):
    with pytest.raises(ValueError):
        mixing.sequence_pack(docs, budget=0)


def test_stratified_nonstring_strata(spark):
    # ADVICE r4: the rate table was built all-string; integer strata
    # now join on the df's own type with no implicit cross-cast
    rows = [(i, i % 2, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang_id int, n_tokens int")
    out = mixing.stratified_sample(df, ["lang_id"], {0: 0.5, 1: 0.1}, default_rate=0.0)
    counts = {r["lang_id"]: r["n"] for r in out.groupBy("lang_id").agg(F.count("*").alias("n")).collect()}
    assert counts == {0: 25, 1: 5}


def test_stratified_missing_stratum_column_raises(docs):
    with pytest.raises(ValueError, match="not in DataFrame"):
        mixing.stratified_sample(docs, ["nope"], {"a": 0.5})

# ---- host_quota ----

def _naive_quota(docs_pd: pd.DataFrame, k: int) -> set:
    """Single-stage reference: top-k per host by (n_tokens desc, md5(id), id)."""
    d = docs_pd.copy()
    d["_m"] = d["doc_id"].map(_md5)
    d = d.sort_values(["source", "n_tokens", "_m", "doc_id"], ascending=[True, False, True, True])
    return set(d.groupby("source").head(k)["doc_id"])


def test_host_quota_matches_single_stage_reference(docs):
    pd_docs = docs.toPandas()
    for k in (1, 3, 7):
        out = mixing.host_quota(
            docs, host_col="source", k=k, order_col="n_tokens", id_col="doc_id"
        )
        assert set(r["doc_id"] for r in out.collect()) == _naive_quota(pd_docs, k)


def test_host_quota_salted_two_stage_exact(docs):
    """The salted TopK (stage-one truncation per (host, salt)) must be
    EXACTLY the single-stage result — the union of per-salt top-k
    contains the global per-host top-k."""
    plain = mixing.host_quota(
        docs, host_col="source", k=5, order_col="n_tokens", id_col="doc_id", rank_col="r"
    )
    salted = mixing.host_quota(
        docs, host_col="source", k=5, order_col="n_tokens", id_col="doc_id",
        n_salt=4, rank_col="r",
    )
    a = sorted(map(tuple, plain.select("doc_id", "r").collect()))
    b = sorted(map(tuple, salted.select("doc_id", "r").collect()))
    assert a == b


def test_host_quota_partition_invariant(docs):
    base = set(
        r["doc_id"]
        for r in mixing.host_quota(docs, host_col="source", k=4, id_col="doc_id").collect()
    )
    rep = set(
        r["doc_id"]
        for r in mixing.host_quota(
            docs.repartition(13), host_col="source", k=4, id_col="doc_id", n_salt=3
        ).collect()
    )
    assert base == rep


def test_host_quota_rejects_bad_args(docs):
    with pytest.raises(ValueError):
        mixing.host_quota(docs, host_col="source", k=0)
    with pytest.raises(ValueError):
        mixing.host_quota(docs, host_col="source", k=2, n_salt=0)


def test_corpus_build_composition_invariants(spark):
    """q76: the five-stage corpus-construction chain holds its
    stage-level invariants end-to-end (the value-exactness itself is
    the DuckDB oracle's job)."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as e

    out = e.queries()["q76_corpus_build"](spark, "/root/testdata/sf0.001").toPandas()
    # downsampling-only rates → no duplicate docs survive the chain
    assert out["doc_id"].is_unique
    # host quota: at most 20 docs per host
    assert out.groupby("host")["doc_id"].count().max() <= 20
    # packing: shard ids contiguous from 0 within each language
    for _, g in out.groupby("lang"):
        ids = sorted(g["shard_id"].unique())
        assert ids == list(range(len(ids)))
    # quality filter lower bound survived the chain
    assert (out["n_words"] >= 10).all()


# ---- select_by_budget ----

def _budget_prefix_py(rows, budget):
    """Naive reference: global (score desc, md5, id) prefix under budget."""
    order = sorted(rows, key=lambda r: (-r[1], _md5(r[0]), r[0]))
    out, cum = set(), 0
    for rid, _, tok in order:
        if cum + tok > budget:
            break
        cum += tok
        out.add(rid)
    return out


def test_select_by_budget_matches_naive_prefix(spark):
    rows = [(i, float((i * 53) % 211), 1 + (i * 11) % 60) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens int")
    for budget in (1, 500, 3_000, 10_000):
        got = set(
            r["doc_id"]
            for r in mixing.select_by_budget(df, budget, n_buckets=16).collect()
        )
        assert got == _budget_prefix_py(rows, budget), f"budget {budget}"


def test_select_by_budget_keep_all_and_invariance(spark):
    rows = [(i, float(i % 7), 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens int")
    # total tokens = 1000 <= budget -> everything kept (boundary null)
    assert mixing.select_by_budget(df, 1_000).count() == 200
    a = sorted(r["doc_id"] for r in mixing.select_by_budget(df, 333, n_buckets=8).collect())
    b = sorted(
        r["doc_id"]
        for r in mixing.select_by_budget(df.repartition(17), 333, n_buckets=8).collect()
    )
    assert a == b
    import pytest

    with pytest.raises(ValueError):
        mixing.select_by_budget(df, 0)


# ---- hash_split ----

def test_hash_split_deterministic_group_aware(spark):
    import hashlib

    import pytest

    rows = [(i, f"h{i % 23}.example") for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    out = mixing.hash_split(
        df, {"train": 0.8, "valid": 0.1, "test": 0.1}, by_col="host"
    ).collect()
    # group-aware: every doc of a host lands in the same split
    by_host = {}
    for r in out:
        by_host.setdefault(r["host"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_host.values())
    # python replay of the md5-threshold rule
    cuts = mixing.split_cuts([0.8, 0.1, 0.1])
    for r in out[:50]:
        h = int(hashlib.md5(r["host"].encode()).hexdigest()[:15], 16)
        exp = "train" if h < cuts[0] else ("valid" if h < cuts[1] else "test")
        assert r["split"] == exp, r
    # doc-level split: realized fractions near nominal on 600 ids
    doc = mixing.hash_split(df, {"a": 0.5, "b": 0.5}).collect()
    n_a = sum(1 for r in doc if r["split"] == "a")
    assert 240 <= n_a <= 360
    # split is stable under repartitioning
    rep = mixing.hash_split(
        df.repartition(7), {"train": 0.8, "valid": 0.1, "test": 0.1}, by_col="host"
    ).collect()
    assert {(r["doc_id"], r["split"]) for r in rep} == {(r["doc_id"], r["split"]) for r in out}
    with pytest.raises(ValueError):
        mixing.hash_split(df, {"only": 1.0})
    with pytest.raises(ValueError):
        mixing.hash_split(df, {"a": 0.5, "b": 0.2})


# ---- temperature_mix ----

def test_temperature_mix_exact_counts_and_selection(spark):
    import hashlib
    import math

    import pytest

    rows = []
    sizes = {"a": 400, "b": 100, "c": 25, "d": 4}
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = mixing.temperature_mix(
        df, ["stratum"], tau=0.5, scale=2.0, count_col="n"
    ).collect()
    # exact per-stratum keep counts: min(n, ceil(2*sqrt(n)))
    got = {}
    for r in out:
        got.setdefault(r["stratum"], []).append(r["doc_id"])
        assert r["n"] == sizes[r["stratum"]]
    for s, n in sizes.items():
        assert len(got[s]) == min(n, math.ceil(2.0 * math.sqrt(n))), s
    # selection is the lowest-md5-rank prefix (python replay)
    by_stratum = {}
    for i, s in rows:
        by_stratum.setdefault(s, []).append(i)
    for s, ids in by_stratum.items():
        ranked = sorted(ids, key=lambda x: (hashlib.md5(str(x).encode()).hexdigest(), x))
        keep = min(len(ids), math.ceil(2.0 * math.sqrt(len(ids))))
        assert sorted(got[s]) == sorted(ranked[:keep]), s
    # tau=1, scale=1 is the identity (ceil(n^1) = n)
    ident = mixing.temperature_mix(df, ["stratum"], tau=1.0, scale=1.0).collect()
    assert len(ident) == len(rows)
    # partition invariance
    rep = mixing.temperature_mix(
        df.repartition(9), ["stratum"], tau=0.5, scale=2.0
    ).collect()
    assert {r["doc_id"] for r in rep} == {r["doc_id"] for r in out}
    # flattening: tau=0 keeps ceil(scale) per stratum regardless of size
    flat = mixing.temperature_mix(df, ["stratum"], tau=0.0, scale=2.0).collect()
    cnt = {}
    for r in flat:
        cnt[r["stratum"]] = cnt.get(r["stratum"], 0) + 1
    assert cnt == {s: 2 for s in sizes}
    with pytest.raises(ValueError):
        mixing.temperature_mix(df, ["stratum"], tau=-0.1)
    with pytest.raises(ValueError):
        mixing.temperature_mix(df, ["stratum"], scale=0.0)
    with pytest.raises(ValueError):
        mixing.temperature_mix(df, ["missing"], tau=0.5)


def test_temperature_mix_null_stratum(spark):
    """r6 advice: a NULL stratum value is a stratum like any other —
    counted, rated at its own n^tau, and present in the output (the
    old equi-join silently dropped it)."""
    from webdq import mixing

    rows = [(i, "a" if i < 16 else None) for i in range(32)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = mixing.temperature_mix(df, ["src"], tau=0.5, count_col="n").collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], []).append(r)
    # ceil(sqrt(16)) = 4 kept per stratum, INCLUDING the null stratum
    assert len(by.get("a", [])) == 4
    assert len(by.get(None, [])) == 4
    assert all(r["n"] == 16 for r in out)

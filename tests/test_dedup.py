"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine — vs hand-computed / pandas oracles."""

import numpy as np
from pyspark.sql import functions as F

from webdq import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat", "en"),  # near dup
    (4, "completely different text about spark engines here", "en"),
    (5, "spark engines here completely different text about", "en"),  # same token set as 4
    (6, "unrelated short doc", "de"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


def test_exact_dedup(spark):
    out = {r["fingerprint"]: r for r in dedup.exact_dedup(_df(spark)).collect()}
    dup_groups = [r for r in out.values() if r["n_copies"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["keep_id"] == 1 and dup_groups[0]["n_copies"] == 2
    kept = dedup.dedup_keep_first(_df(spark)).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 3, 4, 5, 6]


def test_minhash_identical_sets_always_pair(spark):
    pairs = {(r["id1"], r["id2"]) for r in dedup.minhash_lsh_pairs(_df(spark)).collect()}
    # identical texts share every band; identical token SETS too (4,5)
    assert (1, 2) in pairs
    assert (4, 5) in pairs
    # near-dup (1,3)/(2,3) likely; disjoint docs must not pair
    assert (4, 6) not in pairs and (1, 4) not in pairs


def test_minhash_matches_pandas_oracle(spark):
    """Same md5-minhash computed in pure python must give identical
    signatures (portability invariant used by the DuckDB oracle)."""
    import hashlib

    sig = dedup.minhash_signatures(_df(spark), n_bands=4).collect()
    got = {(r["doc_id"], r["band"]): r["minhash"] for r in sig}
    for doc_id, text, _ in DOCS:
        toks = list(dict.fromkeys(text.split()))
        for b in range(4):
            exp = min(hashlib.md5(f"{t}#{b}".encode()).hexdigest() for t in toks)
            assert got[(doc_id, b)] == exp


def test_simhash_properties(spark):
    s = {r["doc_id"]: r["simhash"] for r in dedup.simhash(_df(spark)).collect()}
    assert s[1] == s[2]  # identical text → identical fingerprint
    assert s[4] == s[5]  # same token set → identical fingerprint
    m64 = (1 << 64) - 1
    ham13 = bin((s[1] ^ s[3]) & m64).count("1")
    ham16 = bin((s[1] ^ s[6]) & m64).count("1")
    assert ham13 < ham16  # near dup closer than unrelated
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in dedup.simhash_pairs(_df(spark), max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(4, 5)] == 0


def test_ngram_jaccard(spark):
    out = {(r["id1"], r["id2"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(_df(spark), n=3, threshold=0.3).collect()}
    assert out[(1, 2)] == 1.0
    # docs 1 and 3: 7 distinct 3-grams each, 6 shared → J = 6/8
    assert abs(out[(1, 3)] - 0.75) < 1e-9
    assert (1, 4) not in out


def test_embedding_neardup_and_cosine(spark):
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.999, 0.04, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0], 1),  # other block — never paired with 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {(r["id1"], r["id2"]): r["cosine"] for r in dedup.embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert (1, 2) in out and out[(1, 2)] > 0.99
    assert (1, 3) not in out and (1, 4) not in out
    exp = 0.999 / np.sqrt(0.999**2 + 0.04**2)
    assert abs(out[(1, 2)] - round(exp, 6)) < 1e-9


def test_minhash_banding_precision(spark):
    """r rows/band is the precision knob: exact duplicates always
    collide at any r; banded (r=2) candidates are a subset of r=1
    candidates (P(collide)=s^r per band); near-identical docs
    survive banding."""
    from pyspark.sql import Row

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    docs = [
        Row(doc_id=0, text=base),
        Row(doc_id=1, text=base),  # exact dup of 0
        Row(doc_id=2, text=base.replace("today", "tonight")),  # near dup
        Row(doc_id=3, text="completely different words about spark partitions and shuffles everywhere"),
        Row(doc_id=4, text="another unrelated document mentioning the fox only once in passing"),
    ]
    df = spark.createDataFrame(docs)
    p1 = {(r["id1"], r["id2"]) for r in dedup.minhash_lsh_pairs(df, n_bands=8, shingle_n=1).collect()}
    p2 = {(r["id1"], r["id2"]) for r in dedup.minhash_lsh_pairs(df, n_bands=8, shingle_n=1, rows_per_band=2).collect()}
    assert (0, 1) in p1 and (0, 1) in p2  # exact dups always pair
    assert (0, 2) in p2 and (1, 2) in p2  # near dups survive r=2
    assert p2 <= p1  # banding can only drop candidates
    # the weak single-shared-word tie must not survive 2 rows/band on
    # every band with near-certainty; p1 is allowed to contain it
    assert (0, 4) not in p2


def test_simhash64_portable_matches_xxhash_structure(spark):
    """Portable md5 simhash: identical texts → identical (hi, lo);
    fingerprints reconstruct to 64 distinct bits."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta"), Row(doc_id=1, text="alpha beta gamma delta"),
         Row(doc_id=2, text="totally different content here")]
    )
    rows = {r["doc_id"]: (r["sim_hi"], r["sim_lo"]) for r in dedup.simhash64_portable(df).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]
    for hi, lo in rows.values():
        assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32


def test_winnowing_matches_python_and_guarantee(spark):
    """Winnowing vs a python reference, plus the MOSS guarantee: two
    docs sharing a substring of >= k + window - 1 tokens share at
    least one fingerprint."""
    import hashlib

    from webdq.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens >= 3+4-1=6
    rows = [
        (0, "one two " + shared + " tail words here"),
        (1, shared + " completely different ending tokens now"),
        (2, "unrelated text with no overlap at all whatsoever"),
        (3, "tiny doc"),  # < k tokens -> no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict = {}
    for r in winnow_fingerprints(df, k=3, window=4).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])

    def ref(text, k=3, w=4):
        toks = text.split()
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}

    for did, text in rows:
        assert got.get(did, set()) == ref(text), did
    assert got[0] & got[1], "shared 7-token run must yield a common fingerprint"
    assert not (got[0] & got[2])
    assert 3 not in got  # too short for any complete window


# ---- corpus-wide line dedup ----

def _line_dedup_py(docs, min_count=2):
    """Independent python reference: global line occurrence counts,
    keep first occurrence (by (id, idx)) of frequent lines."""
    from collections import Counter

    cnt = Counter()
    for _, text in docs:
        cnt.update(text.split("\n"))
    seen = set()
    out = {}
    for did, text in docs:  # docs must be pre-sorted by id
        kept = []
        for line in text.split("\n"):
            if cnt[line] < min_count:
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
        out[did] = "\n".join(kept)
    return out


def test_line_dedup_corpus_matches_python(spark):
    from webdq import dedup

    docs = [
        (0, "nav bar\nhello world\nfooter"),
        (1, "nav bar\nunique line one\nfooter"),
        (2, "nav bar\nnav bar\nsomething else"),
        (3, "all original\ncontent here"),
        (4, ""),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["text_deduped"] for r in dedup.line_dedup_corpus(df).collect()}
    assert got == _line_dedup_py(docs)
    # doc 0 keeps everything (first occurrences); doc 1 loses both
    # boilerplate lines; doc 2's within-doc repeat also dedups
    assert got[0] == "nav bar\nhello world\nfooter"
    assert got[1] == "unique line one"
    assert got[2] == "something else"
    assert got[3] == "all original\ncontent here"


def test_line_dedup_corpus_partition_invariant_and_args(spark):
    import pytest

    from webdq import dedup

    docs = [(i, f"common line\nbody {i} text\nshared {i % 3}") for i in range(60)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(map(tuple, dedup.line_dedup_corpus(df, min_count=3).collect()))
    b = sorted(map(tuple, dedup.line_dedup_corpus(df.repartition(13), min_count=3).collect()))
    assert a == b
    assert len(a) == 60  # every doc present
    with pytest.raises(ValueError):
        dedup.line_dedup_corpus(df, min_count=1)

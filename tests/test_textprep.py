"""Chunking + repetition removal: python-reference parity and
coverage properties."""

from pyspark.sql import functions as F

from webdq import textprep


def _docs(spark):
    rows = [
        (0, "a b c d e f g h i j k l m n o p"),
        (1, "x"),
        (2, "the the the quick quick brown fox fox fox fox"),
        (3, " ".join(f"w{i}" for i in range(100))),
        (4, "solo pair pair solo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunking_covers_and_overlaps(spark):
    out = (
        textprep.chunk_documents(_docs(spark), chunk_tokens=8, overlap=2)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    docs = {r["doc_id"]: r["text"].split() for r in _docs(spark).collect()}
    stride = 6
    for did, toks in docs.items():
        chunks = out[out["doc_id"] == did]
        import math

        exp_n = max(1, math.ceil((len(toks) - 2) / stride))
        assert len(chunks) == exp_n
        for _, r in chunks.iterrows():
            i = r["chunk_id"]
            exp = toks[i * stride : i * stride + 8]
            assert r["chunk_text"].split() == exp
            assert r["n_tokens"] == len(exp)
        # every token position is covered by some chunk
        covered = set()
        for _, r in chunks.iterrows():
            covered.update(range(r["chunk_id"] * stride, r["chunk_id"] * stride + r["n_tokens"]))
        assert covered == set(range(len(toks)))


def test_chunking_rejects_bad_overlap(spark):
    import pytest

    with pytest.raises(ValueError):
        textprep.chunk_documents(_docs(spark), chunk_tokens=8, overlap=8)


def test_dedup_consecutive_matches_python(spark):
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in textprep.dedup_consecutive_tokens(_docs(spark)).collect()
    }
    for r in _docs(spark).collect():
        toks = r["text"].split()
        kept = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
        assert got[r["doc_id"]] == (" ".join(kept), len(toks) - len(kept)), r["doc_id"]
    assert got[2][1] == 6  # 2×the + 1×quick + 3×fox


def test_token_counts_match_python_re(spark):
    import re

    rows = [
        (0, "it's a test, isn't it? 123 abc-def   trailing  "),
        (1, "don't you'll we're I'd o'clock 'quoted'"),
        (2, "x"),
        (3, "a  b\tc\nd"),
        (4, "!!!???...:;(){}[]"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in textprep.token_counts(df).collect()}
    pat = re.compile(textprep.BPE_ISH_PATTERN)
    for did, text in rows:
        ws = len(text.strip().split())
        # Spark's split on \s+ of a trimmed string == python .split()
        bpe = len(pat.findall(text))
        assert got[did] == (ws, bpe), (did, got[did], (ws, bpe))

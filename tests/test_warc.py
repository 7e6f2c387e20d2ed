"""WARC assembly/parse: python replay parity, multi-record ordering,
unicode byte lengths, corrupt-shard totality, partition invariance."""

import pytest

from pyspark.sql import functions as F

from webdq import warc


DOCS = [
    (0, "alpha.example", "hello world"),
    (1, "beta.example", ""),                      # empty payload
    (2, "alpha.example", "café résumé"),  # multi-byte UTF-8
    (3, "gamma.example", "line1\r\nline2"),       # CRLF inside payload
    (8, "alpha.example", "same shard as 0"),      # doc_id % 8 == 0
    (9, "beta.example", None),                    # null text
]


def _df(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_warc_roundtrip_matches_python(spark):
    shards = warc.warc_shards_from_documents(_df(spark), n_shards=8)
    got = {
        r["uri"]: (r["rec_type"], r["n_bytes"], r["payload"])
        for r in warc.parse_warc(shards).collect()
    }
    exp = {
        f"https://{src}/{i}": ("response", len((t or "").encode()), t or "")
        for i, src, t in DOCS
    }
    assert got == exp
    # shard blob layout: records in doc_id order, python-parseable
    blob = {r["shard_id"]: r["warc"] for r in shards.collect()}[0]
    assert blob.index("https://alpha.example/0") < blob.index("https://alpha.example/8")
    assert blob.startswith("WARC/1.0\r\n")
    # partition invariance
    rep = {
        r["uri"]: r["n_bytes"]
        for r in warc.parse_warc(
            warc.warc_shards_from_documents(_df(spark).repartition(5), n_shards=8)
        ).collect()
    }
    assert rep == {u: n for u, (_, n, _) in exp.items()}
    with pytest.raises(ValueError):
        warc.warc_shards_from_documents(_df(spark), n_shards=0)


def test_warc_corrupt_shard_is_total(spark):
    shards = warc.warc_shards_from_documents(_df(spark), n_shards=1)
    blob = shards.collect()[0]["warc"]
    n_all = len(DOCS)
    # a trailing record whose declared length exceeds the bytes present:
    # the records before it survive, the truncated one is dropped
    cut = blob + (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: https://cut.example/x\r\n"
        "Content-Length: 99\r\n\r\nz"
    )
    # garbage that never matches the version line: zero records, no crash
    cases = spark.createDataFrame(
        [(0, cut), (1, "not a warc at all"), (2, None), (3, blob)],
        "shard_id int, warc string",
    )
    rows = warc.parse_warc(cases).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard_id"], []).append(r)
    assert len(by_shard.get(3, [])) == n_all       # intact shard: all records
    assert 1 not in by_shard and 2 not in by_shard  # garbage/null: zero rows
    assert len(by_shard.get(0, [])) == n_all        # prefix kept...
    assert all("cut.example" not in r["uri"] for r in by_shard[0])  # ...cut dropped

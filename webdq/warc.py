"""WARC record assembly and parsing — the CommonCrawl interchange
format (ISO 28500, public spec), completing the source matrix next to
CSV (q40), partitioned parquet (q49), JSONL (q70), ORC (q95), and
JDBC (S9). Reference analog: the reference ingests OSM history files
(/root/reference/osmdq/extract-changesets.py); WARC is the web-payload
equivalent for this engine's domain.

Spark-first decomposition (the multimodal codec pattern — real
formats, synthetic deterministic content):

- ``warc_shards_from_documents``: NATIVE assembly — each document
  becomes a minimal valid WARC/1.0 response record (version line,
  headers, byte-accurate Content-Length, CRLF framing), records
  concatenated per shard in doc_id order via one ordered
  collect_list (shards are bounded: n_docs/n_shards records each —
  at real scale a shard is one task's write, not a driver object).
- ``parse_warc``: an Arrow ``mapInPandas`` chunk-walk over the shard
  blob — find the CRLF-CRLF header terminator, parse headers, take
  exactly Content-Length payload BYTES, skip the record trailer,
  repeat. TOTAL on malformed input: a corrupt shard yields the
  records parsed up to the corruption, never a task failure (the
  decode_media convention).

Content-Length is BYTE length (UTF-8), not character count —
octet_length in Spark, strlen in DuckDB; the parser walks byte
offsets and re-decodes payloads.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_DATE = "2026-01-01T00:00:00Z"  # fixed synthetic timestamp


def warc_shards_from_documents(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(shard_id, warc) — documents assembled into multi-record
    WARC/1.0 shard blobs, records in doc_id order within each shard
    (deterministic, partition-invariant). URL is derived from
    (source, id) so the parse side is value-checkable without
    carrying extra columns."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    text = F.coalesce(F.col(text_col), F.lit(""))
    url = F.concat(F.lit("https://"), F.col(source_col), F.lit("/"), F.col(id_col))
    rec = F.concat(
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Target-URI: "), url, F.lit("\r\n"),
        F.lit(f"WARC-Date: {WARC_DATE}\r\n"),
        F.lit("Content-Length: "), F.octet_length(text).cast("string"), F.lit("\r\n"),
        F.lit("\r\n"),
        text,
        F.lit("\r\n\r\n"),
    )
    g = df.select(
        F.pmod(F.col(id_col), F.lit(int(n_shards))).cast("int").alias("shard_id"),
        F.struct(F.col(id_col).alias("_id"), rec.alias("_rec")).alias("_s"),
    )
    return (
        g.groupBy("shard_id")
        .agg(F.array_sort(F.collect_list("_s")).alias("_rs"))
        .select(
            "shard_id",
            F.array_join(
                F.transform("_rs", lambda s: s["_rec"]), ""
            ).alias("warc"),
        )
    )


_PARSE_SCHEMA = StructType(
    [
        StructField("shard_id", IntegerType()),
        StructField("uri", StringType()),
        StructField("rec_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload", StringType()),
    ]
)


def parse_warc(df: DataFrame, warc_col: str = "warc", shard_col: str = "shard_id") -> DataFrame:
    """(shard_id, uri, rec_type, n_bytes, payload) — one row per WARC
    record. Byte-offset chunk walk; a malformed tail yields the
    records parsed before it (total, no task failure)."""

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for shard_id, blob in zip(pdf[shard_col], pdf[warc_col]):
                if blob is None:
                    continue
                b = blob.encode("utf-8")
                i = 0
                try:
                    while i < len(b):
                        he = b.index(b"\r\n\r\n", i)
                        lines = b[i:he].decode("utf-8").split("\r\n")
                        if not lines[0].startswith("WARC/"):
                            break
                        hdr = {}
                        for ln in lines[1:]:
                            k, _, v = ln.partition(": ")
                            hdr[k] = v
                        clen = int(hdr["Content-Length"])
                        payload = b[he + 4 : he + 4 + clen]
                        if len(payload) != clen:
                            break  # truncated record
                        rows.append(
                            (
                                int(shard_id),
                                hdr.get("WARC-Target-URI"),
                                hdr.get("WARC-Type"),
                                clen,
                                payload.decode("utf-8"),
                            )
                        )
                        i = he + 4 + clen + 4  # record trailer CRLFCRLF
                except (ValueError, KeyError, UnicodeDecodeError):
                    pass  # keep whatever parsed before the corruption
            yield pd.DataFrame(rows, columns=[f.name for f in _PARSE_SCHEMA.fields])

    return df.mapInPandas(walk, schema=_PARSE_SCHEMA)

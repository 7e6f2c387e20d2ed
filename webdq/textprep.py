"""Training-data text preparation: chunking + repetition removal.

Two ops every LLM-corpus pipeline runs between filtering and
tokenization, re-expressed as native Spark expressions (no UDFs —
both are array algebra):

- ``chunk_documents``: overlapping token-window chunks (the standard
  pretraining sharding: fixed window, fixed stride, last window
  ragged). One Generate per doc over a materialized token array —
  the token split is computed ONCE per document (projected before the
  explode), never per chunk.
- ``dedup_consecutive_tokens``: collapse immediate token repetitions
  ("the the the" → "the") — the cheapest member of the
  repetition-removal family (Gopher §A.1.1 removes higher-order
  repeated n-grams/lines the same way: compare against a shifted
  copy). Built as arrays_zip(tokens, shifted) + filter whose lambda
  touches only the zipped element (the captured-expression HOF trap —
  see dedup._shingles).

Both carry DuckDB oracles (q50/q51) — list slicing and comprehensions
reproduce the exact outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toks(text_col: str):
    return F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """One row per (doc, chunk): chunk i covers tokens
    [i·stride, i·stride + chunk_tokens), stride = chunk_tokens −
    overlap; a document shorter than one window yields exactly one
    (ragged) chunk. Output: (doc_id, chunk_id, chunk_text, n_tokens).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    base = df.select(F.col(id_col).alias("doc_id"), _toks(text_col).alias("_toks"))
    n = F.size("_toks")
    n_chunks = F.greatest(F.lit(1).cast("long"), F.ceil((n - overlap) / F.lit(float(stride))))
    ex = base.select(
        "doc_id", "_toks", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("_i")
    )
    start = (F.col("_i") * stride).cast("int")
    return ex.select(
        "doc_id",
        F.col("_i").cast("int").alias("chunk_id"),
        F.concat_ws(" ", F.slice(F.col("_toks"), start + 1, chunk_tokens)).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.size("_toks") - start).alias("n_tokens"),
    )


# GPT-2-style pretokenizer pattern, restricted to constructs both Java
# regex and RE2 support with identical leftmost-first alternation
# semantics (no lookarounds, no unicode categories): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs. Counting its matches approximates BPE token counts
# ~within a few % on English text (each match is one pretoken; BPE
# only splits rare pretokens further).
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish pretoken count, both as single
    native regexp passes (no split arrays materialized)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.trim(t), r"\s+")).alias("n_ws_tokens"),
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).alias("n_bpe_tokens"),
    )


def dedup_consecutive_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Collapse runs of identical consecutive tokens. Output:
    (doc_id, clean_text, n_removed)."""
    toks = _toks(text_col)
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    cnt = F.size("_toks")
    prev = F.concat(F.array(F.lit(None).cast("string")), F.slice(F.col("_toks"), 1, cnt - 1))
    z = F.arrays_zip(F.col("_toks").alias("t"), prev.alias("p"))
    kept = F.filter(z, lambda s: s["p"].isNull() | (s["t"] != s["p"]))
    return base.select(
        "doc_id",
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("clean_text"),
        (cnt - F.size(kept)).alias("n_removed"),
    )

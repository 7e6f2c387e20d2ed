"""Regex PII/toxicity scrubbing — native expressions, byte-stable.

The north rule requires byte-identical scrubbed text per url at any
parallelism. The scrub is therefore a pure function of ``text``: an
ORDERED chain of ``regexp_replace`` with fixed patterns, no locale, no
normalization, no trimming (SURVEY.md §7.3 item 7). Reference analog:
the editor-name canonicalization chain
(/root/reference/osmdq/extract_user_editor.py:32-48) — the one string
pipeline whose exact byte behavior is part of the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import PII_PATTERNS

# Tiny demonstrative toxicity/blocklist — term list scrubbing is the
# mechanism under test, not the lexicon.
BLOCK_TERMS = ["badword1", "badword2", "slur1"]

# Ordered: emails first (their dots would otherwise partially match the
# ipv4 pattern), then phones, then IPs, then the term list.
SCRUB_CHAIN: list[tuple[str, str]] = [
    (PII_PATTERNS["email"], "<EMAIL>"),
    (PII_PATTERNS["phone"], "<PHONE>"),
    (PII_PATTERNS["ipv4"], "<IP>"),
] + [(rf"(?i)\b{t}\b", "<TERM>") for t in BLOCK_TERMS]


def scrub_col(text: Column) -> Column:
    out = text
    for pat, repl in SCRUB_CHAIN:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub(df: DataFrame, text_col: str = "text", out_col: str = "scrubbed_text") -> DataFrame:
    return df.withColumn(out_col, scrub_col(F.col(text_col)))


def scrub_py(text: str) -> str:
    """Pure-Python oracle of the same chain (tests: byte-identity)."""
    import re

    out = text
    for pat, repl in SCRUB_CHAIN:
        out = re.sub(pat, repl, out)
    return out

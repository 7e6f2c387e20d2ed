"""Model-backed scorers as Arrow-vectorized pandas UDFs (SURVEY.md §2.9).

The only Python in the hot path, and it is batch-vectorized: Spark
ships Arrow batches; inside we use pandas str ops / numpy. Reference
analog: the per-row ``.apply`` lambdas
(/root/reference/osmdq/analysis_tasks.py:298,324) — upgraded from
row-at-a-time to Arrow batches.

- ``langid``: fastText-style linear scorer over character/stopword
  n-gram features. Profiles are built at import from small public
  stopword lists (self-contained, no external files); at real scale
  the coefficient table would be a broadcast numpy array — same code
  path, bigger table.
- ``perplexity``: hashed 5-gram (byte n-gram) KenLM-style scorer with
  an add-one-smoothed count table trained at import on the engine's
  clean-English vocabulary; deterministic pure function of text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ------------------------------------------------------------- language ID

# Public, ubiquitous function-word lists (top function words per language).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": "the of and to in a is that it for on with as are was at be this have from or by not".split(),
    "de": "der die das und zu in ein ist dass es für auf mit als sind war bei sein dies von nicht".split(),
    "fr": "le la les de des du et à en un une est que il elle pour sur avec ne pas ce cette au".split(),
    "es": "el la los las de del y a en un una es que por con para no se su al lo como más".split(),
}
LANGS = [*LANG_STOPWORDS.keys(), "zh"]

_LANG_PATTERNS = {
    lang: r"(?i)\b(?:" + "|".join(ws) + r")\b" for lang, ws in LANG_STOPWORDS.items()
}
_CJK = r"[一-鿿㐀-䶿]"

_LANGID_SCHEMA = T.StructType(
    [T.StructField("lang_pred", T.StringType()), T.StructField("langid_conf", T.DoubleType())]
)


def _langid_impl(text: pd.Series) -> pd.DataFrame:
    t = text.fillna("")
    n_words = t.str.count(r"\S+").clip(lower=1)
    n_chars = t.str.len().clip(lower=1)
    scores = np.zeros((len(t), len(LANGS)))
    for i, lang in enumerate(LANGS[:-1]):
        scores[:, i] = (t.str.count(_LANG_PATTERNS[lang]) / n_words).to_numpy()
    scores[:, -1] = (t.str.count(_CJK) / n_chars).to_numpy()
    best = scores.argmax(1)
    conf = scores.max(1)
    return pd.DataFrame(
        {"lang_pred": [LANGS[b] for b in best], "langid_conf": np.clip(conf, 0.0, 1.0)}
    )


langid_udf = pandas_udf(_langid_impl, _LANGID_SCHEMA)


# ------------------------------------------------------------- perplexity

_PPL_BUCKETS = 1 << 15
_PPL_N = 5  # byte 5-grams


def _ngram_hashes(b: np.ndarray, n: int) -> np.ndarray:
    """Rolling polynomial hash of byte n-grams, vectorized."""
    if len(b) < n:
        return np.empty(0, dtype=np.int64)
    acc = np.zeros(len(b) - n + 1, dtype=np.int64)
    for i in range(n):
        acc = (acc * 257 + b[i : len(b) - n + 1 + i]) & 0x7FFFFFFF
    return acc % _PPL_BUCKETS


def _train_counts() -> np.ndarray:
    # Deterministic training corpus: the engine's clean-English vocab
    # cycled into sentences (pure function of constants).
    from .synth import _CLEAN_VOCAB

    words = [_CLEAN_VOCAB[(i * 7 + 3) % len(_CLEAN_VOCAB)] for i in range(5000)]
    corpus = " ".join(words).encode("utf-8")
    b = np.frombuffer(corpus, dtype=np.uint8).astype(np.int64)
    counts = np.bincount(_ngram_hashes(b, _PPL_N), minlength=_PPL_BUCKETS).astype(np.float64)
    return counts


_COUNTS = _train_counts()
_LOGP = np.log((_COUNTS + 1.0) / (_COUNTS.sum() + _PPL_BUCKETS))


def _perplexity_impl(text: pd.Series) -> pd.Series:
    out = np.empty(len(text))
    for i, s in enumerate(text.fillna("")):
        b = np.frombuffer(s.lower().encode("utf-8"), dtype=np.uint8).astype(np.int64)
        h = _ngram_hashes(b, _PPL_N)
        out[i] = float(np.exp(-_LOGP[h].mean())) if len(h) else 1e6
    return pd.Series(out)


perplexity_udf = pandas_udf(_perplexity_impl, T.DoubleType())


def model_features(df, text_col: str = "text", lang_col: str = "lang"):
    """Append langid_conf, lang_match, perplexity. One projection; the
    struct-returning UDF is evaluated once per batch."""
    s = langid_udf(F.col(text_col))
    df = df.withColumn("_lid", s)
    return (
        df.withColumn("langid_conf", F.col("_lid.langid_conf"))
        .withColumn(
            "lang_match",
            F.when(F.col("_lid.lang_pred") == F.col(lang_col), F.lit(1.0)).otherwise(F.lit(0.0)),
        )
        .withColumn("perplexity", perplexity_udf(F.col(text_col)))
        .drop("_lid")
    )

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

from pyspark.sql import DataFrame, Window
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
    return _dedup_consecutive(df, id_col, _toks(text_col), " ")


def dedup_consecutive_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", line_delim: str = "\n"
) -> DataFrame:
    """Collapse runs of identical consecutive LINES (the Gopher §A.1.1
    repeated-paragraph member at line granularity). Output:
    (doc_id, clean_text, n_removed)."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), _re_escape(line_delim))
    return _dedup_consecutive(df, id_col, lines, line_delim)


def _re_escape(delim: str) -> str:
    import re

    return re.escape(delim)


def _dedup_consecutive(df: DataFrame, id_col: str, units, join_delim: str) -> DataFrame:
    """Shared run-collapse over an array column: keep element i when it
    differs from element i-1. arrays_zip-first so the filter/transform
    lambdas touch only their zipped element (the interpreted-HOF
    captured-expression trap, CLAUDE.md)."""
    base = df.select(F.col(id_col).alias("doc_id"), units.alias("_u"))
    cnt = F.size("_u")
    prev = F.concat(F.array(F.lit(None).cast("string")), F.slice(F.col("_u"), 1, cnt - 1))
    z = F.arrays_zip(F.col("_u").alias("t"), prev.alias("p"))
    kept = F.filter(z, lambda s: s["p"].isNull() | (s["t"] != s["p"]))
    return base.select(
        "doc_id",
        F.concat_ws(join_delim, F.transform(kept, lambda s: s["t"])).alias("clean_text"),
        (cnt - F.size(kept)).alias("n_removed"),
    )


def _run_best(sorted_col):
    """Over a SORTED string array: the (count, count·len) of the best
    repeated run — max count, ties broken by larger character
    coverage. One F.aggregate whose lambda touches only (acc, x):
    interpreted but O(n) with no captured outer expressions."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bc"),
        F.lit(0).cast("long").alias("bch"),
    )

    def step(acc, x):
        run = F.when(acc["prev"].isNotNull() & (acc["prev"] == x), acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        chars = run * F.length(x)
        better = (run > acc["bc"]) | ((run == acc["bc"]) & (chars > acc["bch"]))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["bc"]).alias("bc"),
            F.when(better, chars).otherwise(acc["bch"]).alias("bch"),
        )

    return F.aggregate(sorted_col, init, step)


def _dup_stats(sorted_col):
    """Over a SORTED string array: (total, total_chars, dup, dup_chars)
    where dup counts occurrences beyond the first of each distinct
    value — the Gopher duplicate-line accounting."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0).cast("long").alias("ch"),
        F.lit(0).cast("long").alias("dn"),
        F.lit(0).cast("long").alias("dch"),
    )

    def step(acc, x):
        is_dup = acc["prev"].isNotNull() & (acc["prev"] == x)
        return F.struct(
            x.alias("prev"),
            (acc["n"] + 1).alias("n"),
            (acc["ch"] + F.length(x)).alias("ch"),
            F.when(is_dup, acc["dn"] + 1).otherwise(acc["dn"]).alias("dn"),
            F.when(is_dup, acc["dch"] + F.length(x)).otherwise(acc["dch"]).alias("dch"),
        )

    return F.aggregate(sorted_col, init, step)


def gopher_repetition(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_delim: str = "\n",
    ngram_ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """The Gopher §A.1.1 repetition metric family (Rae et al. 2021,
    public), per document and fully native (array algebra, zero
    shuffle):

    - ``dup_line_frac``: fraction of lines that are duplicates of an
      earlier line (occurrences beyond the first of each distinct
      line).
    - ``dup_line_char_frac``: fraction of line characters inside those
      duplicate occurrences.
    - ``top_{n}gram_char_frac`` for each n in ``ngram_ns``: characters
      covered by the most frequent word n-gram (count × len, ties →
      larger coverage) over the total text length; 0 when the doc has
      fewer than n tokens.

    All run accounting happens on SORTED arrays with F.aggregate
    lambdas that touch only (acc, element) — no captured outer
    expressions (the interpreted-HOF trap), no explode, no shuffle."""
    from .dedup import _shingles

    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), _re_escape(line_delim))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_text"),
        F.array_sort(lines).alias("_slines"),
    )
    ds = _dup_stats(F.col("_slines"))
    out = base.select(
        "doc_id",
        "_text",
        F.when(ds["n"] > 0, ds["dn"] / ds["n"]).otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(ds["ch"] > 0, ds["dch"] / ds["ch"]).otherwise(F.lit(0.0)).alias("dup_line_char_frac"),
    )
    tot = F.length(F.coalesce(F.col("_text"), F.lit("")))
    for n in ngram_ns:
        best = _run_best(F.array_sort(_shingles("_text", n, distinct=False)))
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.when(tot > 0, best["bch"] / tot).otherwise(F.lit(0.0)),
        )
    return out.drop("_text")


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary table (token, freq, vocab_id) — the
    tokenizer-construction step between text prep and training.
    vocab_id is the frequency rank (0-based, ties broken
    lexicographically — fully deterministic). Shape: one explode +
    one hash groupBy (map-side combined); the rank is a global window
    over the VOCAB table, which is bounded — pass ``max_vocab`` at
    web scale so the TopK (parallel per-partition truncation + merge)
    runs BEFORE the single-partition rank, leaving the window
    max_vocab rows regardless of corpus size."""
    from pyspark.sql import Window

    tok = df.select(F.explode(_toks(text_col)).alias("token")).filter(F.col("token") != "")
    counts = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= int(min_count))
    )
    order = [F.desc("freq"), F.col("token")]
    if max_vocab is not None:
        counts = counts.orderBy(*order).limit(int(max_vocab))
    w = Window.orderBy(*order)
    return counts.withColumn("vocab_id", F.row_number().over(w) - 1)


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary stats vs a vocab table:
    (id, n_tokens, n_oov, oov_rate). The vocab is broadcast (it is
    max_vocab-bounded by construction); one explode + broadcast left
    join + one groupBy keyed by the doc id — no skew (ids unique).
    Documents with zero tokens don't appear (nothing to rate)."""
    tok = df.select(
        F.col(id_col), F.explode(_toks(text_col)).alias("token")
    ).filter(F.col("token") != "")
    marked = tok.join(
        F.broadcast(vocab.select("token").withColumn("_in", F.lit(True))),
        "token",
        "left",
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
        (
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            / F.count(F.lit(1))
        ).alias("oov_rate"),
    )

def tfidf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_vocab: int | None = None,
) -> DataFrame:
    """Per-(document, term) TF-IDF weights — the classic sparse
    featurization between text prep and classical-ML training, and the
    standard relevance weight for corpus search/inspection tooling.

    Output: (id, token, tf, df, idf, tfidf) with the smooth-idf
    convention idf = ln((1 + N) / (1 + df)) + 1 (sklearn's
    ``TfidfTransformer(smooth_idf=True)`` — public, engine-neutral
    arithmetic) where N = total corpus documents and df = number of
    distinct documents containing the token.

    Shape: one explode + one (id, token) hash groupBy gives tf; df is
    a second groupBy OVER THE TF TABLE (already one row per (doc,
    token), so no countDistinct shuffle); N is a 1-row aggregate
    broadcast via crossJoin. The vocabulary join is broadcast when
    ``max_vocab`` bounds it (TopK by (df desc, token) — same
    deterministic order as ``build_vocab``), a plain shuffle equi-join
    otherwise. At web scale pass ``max_vocab``/``min_df``: both bound
    the term dimension, and min_df also drops the hapax tail that
    dominates raw vocabulary size."""
    tok = df.select(
        F.col(id_col), F.explode(_toks(text_col)).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= int(min_df))
    )
    if max_vocab is not None:
        dfreq = dfreq.orderBy(F.desc("df"), F.col("token")).limit(int(max_vocab))
        dfreq = F.broadcast(dfreq)
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    idf = F.log((1.0 + F.col("_n")) / (1.0 + F.col("df"))) + F.lit(1.0)
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "token",
            "tf",
            "df",
            idf.alias("idf"),
            (F.col("tf") * idf).alias("tfidf"),
        )
    )


def bigram_lm_score(
    df: DataFrame,
    model_df: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 1.0,
    score_col: str = "avg_logprob",
) -> DataFrame:
    """Count-based bigram language-model quality scoring — the CCNet /
    Wenzek et al. '20 shape (train a small LM on a clean reference
    corpus, score every candidate document, filter/bucket by
    perplexity) with the LM re-expressed as two count aggregations
    instead of a trained model: p(w|v) = (c(v,w) + k) / (c(v·) + k·V)
    (add-k smoothing over the model corpus's transition counts; V =
    model vocabulary size), and a document's score is the MEAN log
    transition probability over its (w_{i-1}, w_i) pairs (null for
    docs with < 2 tokens — no transitions to score). ``model_df``
    is the clean reference corpus; ``None`` scores ``df`` against
    itself (self-perplexity — boilerplate-heavy and repetitive docs
    score HIGH, gibberish scores LOW, so both filter directions are
    useful).

    Shape: transitions are an arrays_zip of two pre-sliced token
    arrays (no captured-expression HOF — the r3 quadratic trap), one
    explode each for model counts and scoring; context counts c(v·)
    aggregate OVER the bigram table (one row per distinct bigram —
    no second pass over the corpus); V is a 1-row aggregate broadcast
    via crossJoin (no driver sync). The model tables join back on
    (prev, cur) / prev — broadcast when the model corpus is the usual
    bounded clean reference (wiki-sized), shuffle equi-join otherwise.
    Unseen transitions (model_df ≠ df) fall back to the add-k floor
    via left joins + coalesce(0). At 10^12 docs the scored side is
    one explode + two equi-joins + one map-side-combined groupBy —
    no window, no Python.

    Reference analog: the reference's per-record quality features
    feeding KMeans (SURVEY.md §2 M9); the LM score is the web-corpus
    quality feature CCNet adds on top (§8 quality scoring)."""
    if add_k <= 0:
        raise ValueError(f"add_k must be positive, got {add_k}")
    model_src = df if model_df is None else model_df

    def _transitions(d: DataFrame) -> DataFrame:
        t = d.select(F.col(id_col), _toks(text_col).alias("_w"))
        n = F.size("_w")
        pairs = F.arrays_zip(
            F.slice("_w", 1, n - 1).alias("_prev"),
            F.slice("_w", 2, n - 1).alias("_cur"),
        )
        return (
            t.filter(n >= 2)
            .select(F.col(id_col), F.explode(pairs).alias("_p"))
            .select(
                F.col(id_col),
                F.col("_p._prev").alias("_prev"),
                F.col("_p._cur").alias("_cur"),
            )
        )

    mt = _transitions(model_src)
    big = mt.groupBy("_prev", "_cur").agg(F.count(F.lit(1)).alias("_cb"))
    ctx = big.groupBy("_prev").agg(F.sum("_cb").alias("_cc"))
    vocab = (
        model_src.select(F.explode(_toks(text_col)).alias("_tok"))
        .filter(F.col("_tok") != "")
        .agg(F.count_distinct("_tok").alias("_v"))
    )
    st = _transitions(df)
    k = F.lit(float(add_k))
    # degenerate-model guard (ADVICE r6): an empty/whitespace-only
    # model corpus has V = 0, making the smoothed denominator 0 and
    # every logp +Inf — silently propagating Inf scores. The when()
    # guard (the contamination_score 0-denominator pattern) yields
    # NULL scores instead: an explicit "no model" signal.
    logp = F.when(
        F.col("_v") > 0,
        F.log(
            (F.coalesce(F.col("_cb"), F.lit(0)) + k)
            / (F.coalesce(F.col("_cc"), F.lit(0)) + k * F.col("_v"))
        ),
    )
    scored = (
        st.join(big, ["_prev", "_cur"], "left")
        .join(ctx, "_prev", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            (F.sum(logp) / F.count(F.lit(1))).alias(score_col),
            F.count(F.lit(1)).alias("n_transitions"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.col(score_col),
            F.coalesce(F.col("n_transitions"), F.lit(0)).alias("n_transitions"),
        )
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    n_buckets: int = 3,
    labels: list[str] | None = None,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-group quantile bucketing — the CCNet head/middle/tail split
    (Wenzek '20 §4.3: rank every document by LM score WITHIN its
    language, cut into equal-count tiers, train on the head): ntile
    over (value desc, md5(id), id) inside each ``by`` group, with
    optional tier ``labels`` replacing the 1-based tile index. Ties
    and float noise are neutralized by the md5(id) tie-break, so the
    assignment is deterministic, partition-invariant, and
    engine-replayable (round engine-derived float scores BEFORE
    bucketing — the q87 6dp contract — or last-ulp differences can
    reorder near-equal neighbors).

    Scale note: one window sort per group — languages are few and the
    sort is the point (exact equal-count tiers). At 10^12 docs use
    ``quantile_buckets_scalable`` (r7): identical output, with the
    per-group sort replaced by range-bucketed exact ranks so no task
    ever sorts a whole group."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(f"labels must have {n_buckets} entries, got {len(labels)}")
    w = Window.partitionBy(*(by or [])).orderBy(
        F.desc(value_col), F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    tile = F.ntile(int(n_buckets)).over(w)
    if labels is None:
        return df.withColumn(bucket_col, tile)
    lab = None
    for i, name in enumerate(labels[:-1]):
        cond = tile == (i + 1)
        lab = F.when(cond, name) if lab is None else lab.when(cond, name)
    lab = lab.otherwise(labels[-1]) if lab is not None else F.lit(labels[-1])
    return df.withColumn(bucket_col, lab)


def quantile_buckets_scalable(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    n_buckets: int = 3,
    labels: list[str] | None = None,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    range_buckets: int = 1024,
) -> DataFrame:
    """``quantile_buckets`` without the per-group data-sized sort —
    OUTPUT-IDENTICAL tier assignment (r7, promoting the scale note
    into code; VERDICT r6 #3 asked for an approximate ecdf-threshold
    variant, this one is exact):

    - range-bucket each group's values with an affine map over a
      per-group (min, max, count) broadcast (the ``select_by_budget``
      / ``pr_curve`` pattern) — equal values always share a bucket,
      so the (value desc, md5(id), id) tie-break order restricted to
      a bucket is the global order restricted to it;
    - per-(group, range-bucket) counts → exclusive above-offsets via
      a window over ≤ ``range_buckets`` rows PER GROUP (partition-
      parallel across groups; with ``by=[]`` this one window is a
      single partition of ≤ range_buckets parameter-bounded rows);
    - exact global rank = offset + within-bucket row_number (window
      partitioned by (group, range-bucket));
    - ntile's exact tier arithmetic from (rank, group count): the
      first n mod k tiles take ceil(n/k) rows, the rest floor(n/k).

    At 10^12 docs the English partition of the CCNet split is ~half
    the corpus: ``quantile_buckets`` sorts it on one task, this form
    sorts each of ~range_buckets slices of it independently. Size
    ``range_buckets`` so a slice fits a task."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if labels is not None and len(labels) != n_buckets:
        raise ValueError(f"labels must have {n_buckets} entries, got {len(labels)}")
    by = list(by or [])
    v = F.col(value_col).cast("double")
    stats = df.groupBy(*by).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi"), F.count(F.lit(1)).alias("_gn")
    )
    d = (
        df.join(F.broadcast(stats), by)
        if by
        else df.crossJoin(F.broadcast(stats))
    )
    # descending-value rank order → ascending bucket id; nulls sort
    # LAST under desc (Spark default), so they take the sentinel
    # bucket past every non-null one
    rb = int(range_buckets)
    b = (
        F.when(v.isNull(), F.lit(rb))
        .when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(rb - 1),
                F.floor((F.col("_hi") - v) / (F.col("_hi") - F.col("_lo")) * rb),
            )
        )
    )
    d = d.withColumn("_rb", b)
    wa = (
        Window.partitionBy(*by)
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = (
        d.groupBy(*by, "_rb")
        .agg(F.count(F.lit(1)).alias("_bc"))
        .select(*by, "_rb", F.coalesce(F.sum("_bc").over(wa), F.lit(0)).alias("_above"))
    )
    wi = Window.partitionBy(*by, "_rb").orderBy(
        F.desc(value_col), F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    joined = d.join(F.broadcast(offs), by + ["_rb"])
    rank = F.col("_above") + F.row_number().over(wi)
    # ntile(k) over n rows: q = n div k, r = n mod k; tiles 1..r hold
    # q+1 rows, tiles r+1..k hold q — the exact SQL-standard split
    q = F.floor(F.col("_gn") / n_buckets)
    r = F.col("_gn") % n_buckets
    big = r * (q + 1)
    tile = (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big) / F.greatest(q, F.lit(1))))
        .cast("int")
    )
    if labels is None:
        out_col = tile
    else:
        lab = None
        for i, name in enumerate(labels[:-1]):
            cond = tile == (i + 1)
            lab = F.when(cond, name) if lab is None else lab.when(cond, name)
        out_col = lab.otherwise(labels[-1]) if lab is not None else F.lit(labels[-1])
    return joined.withColumn(bucket_col, out_col).drop("_rb", "_lo", "_hi", "_gn", "_above")


def _bpe_merge_fold(arr_col, a: str, b: str):
    """Greedy non-overlapping left-to-right merge of adjacent (a, b) →
    a+b inside a symbol array — the classic BPE apply step (Sennrich
    '16), as ONE native aggregate fold with a (out, prev) carry: the
    merged token never re-pairs with the next symbol in the same pass.
    The lambda touches only its own element and the accumulator, so
    the interpreted-HOF capture trap does not apply."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, s):
        return (
            F.when(
                acc["prev"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("prev")),
            )
            .when(
                (acc["prev"] == a) & (s == b),
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(a + b))).alias("out"),
                    F.lit(None).cast("string").alias("prev"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["prev"])).alias("out"),
                    s.alias("prev"),
                )
            )
        )

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["prev"]))
        )

    return F.aggregate(arr_col, init, step, finish)


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(
            F.explode(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")).alias(
                "word"
            )
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def learn_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_word_count: int = 1,
    min_pair_count: int = 2,
    incremental_threshold: int = 150_000,
) -> list:
    """Corpus-level BPE merge learning (Sennrich '16 word-level BPE,
    GPT-2 practice): ONE corpus scan builds the (word, count) type
    table; every merge iteration then runs on that table alone — a
    pair-count groupBy (map-side combined), a deterministic 1-row
    argmax (count desc, then lexicographic — TakeOrdered, no global
    sort), and one native greedy merge fold. Returns the driver-side
    merge list [(left, right, pair_count)] in rank order — bounded
    O(n_merges) driver state, the KMeans-centroid pattern.

    Word types, not occurrences, carry the iteration cost: a 10^12-
    token corpus has ~10^8 word types, and ``min_word_count`` bounds
    the table further (hapaxes rarely influence early merges). The
    word table is eagerly localCheckpointed EVERY iteration — the
    merge fold otherwise nests one aggregate per round and the plan
    grows without bound (the DBSCAN iterative-loop gotcha). Symbols
    split on UTF-16 code-unit boundaries (Java regex); astral-plane
    text would need a codepoint splitter.

    Incremental pair maintenance (r7 — VERDICT r6 #5, the structure
    of Sennrich's reference implementation): only word types that
    CONTAIN the merged pair change any pair count, so each iteration
    folds just the affected rows and updates a standing (left, right,
    pair_count) table with their before/after delta — exact integer
    arithmetic, so the argmax sees bit-identical counts to a full
    re-count (the pytest random-corpus merge-list equality pins
    this). The affected test is a substring ``contains`` on a
    NUL-delimited symbol encoding carried IN the checkpointed table
    (computed once per materialization): it can never miss a true
    adjacency (a real (a,b) neighbor pair always encodes as
    ``\\0a\\0b\\0``), and a false positive (a symbol containing NUL)
    only adds a zero-delta row. An `exists`-over-arrays_zip predicate
    was tried first and REJECTED by measurement: building the zip
    costs as much as the explode it replaces and is paid twice
    (filter + negation) — 172 s vs 51 s for 10 merges over 2M word
    types. The former full-recount shape re-exploded and re-shuffled
    EVERY word type once per merge AND re-folded every row; at 32k
    merges × 10^8 word types that is 32k full-table explode shuffles,
    vs. two contains-scans plus a small delta aggregation here.

    Hybrid dispatch: incremental maintenance carries one extra
    materialization (the standing pair table) per merge, which
    DOMINATES below ~10^5 word types where the full re-count is
    nearly free — measured 24 s vs 53 s incremental-vs-recount at 2M
    types, but 14 s vs 7 s at ~4k types (10/30 merges resp.). The
    strategy is picked ONCE from the exact type count (one job on the
    checkpointed table) against ``incremental_threshold`` (the
    measured crossover); both strategies produce the identical merge
    list, so the switch is performance-only.

    Stops early when no pair reaches ``min_pair_count``."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    sep = "\x00"

    def enc(syms_col):
        return F.concat(F.lit(sep), F.concat_ws(sep, syms_col), F.lit(sep))

    words = _word_table(df, text_col)
    if min_word_count > 1:
        words = words.filter(F.col("cnt") >= int(min_word_count))
    words = (
        words.select("cnt", F.split("word", r"(?!^)(?=.)").alias("syms"))
        .withColumn("_enc", enc(F.col("syms")))
        .localCheckpoint(eager=True)
    )

    def pair_counts(w: DataFrame, sign: int = 1) -> DataFrame:
        return (
            w.select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(syms, 1, size(syms) - 1)").alias("l"),
                        F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
            .agg((F.lit(sign) * F.sum("cnt")).alias("pair_count"))
        )

    merges: list = []
    if words.count() < int(incremental_threshold):
        # small type table: full re-count per merge is cheaper than
        # maintaining the standing pair table
        for _ in range(int(n_merges)):
            top = (
                pair_counts(words)
                .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_count"] < min_pair_count:
                break
            a, b, c = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
            merges.append((a, b, c))
            prev = words
            words = words.select(
                "cnt", _bpe_merge_fold(F.col("syms"), a, b).alias("syms")
            ).localCheckpoint(eager=True)
            prev.unpersist()
        return merges

    pairs = pair_counts(words).localCheckpoint(eager=True)
    # the per-iteration unaffected∪folded union concatenates both
    # sides' partition lists — without the coalesce below the words
    # table would DOUBLE its partition count every merge (32 → 131k
    # tasks by merge 12, measured); coalesce is merge-only (no
    # shuffle) back to the checkpointed width
    n_parts = words.rdd.getNumPartitions()
    for _ in range(int(n_merges)):
        top = pairs.orderBy(
            F.desc("pair_count"), F.asc("left"), F.asc("right")
        ).limit(1).collect()
        if not top or top[0]["pair_count"] < min_pair_count:
            break
        a, b, c = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
        merges.append((a, b, c))
        pred = F.col("_enc").contains(sep + a + sep + b + sep)
        affected = words.filter(pred)
        folded = affected.select(
            "cnt", _bpe_merge_fold(F.col("syms"), a, b).alias("syms")
        ).withColumn("_enc", enc(F.col("syms")))
        prev_w, prev_p = words, pairs
        words = (
            words.filter(~pred)
            .unionByName(folded)
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
        delta = pair_counts(affected, -1).unionByName(pair_counts(folded, 1))
        pairs = (
            pairs.unionByName(delta)
            .groupBy("left", "right")
            .agg(F.sum("pair_count").alias("pair_count"))
            .filter(F.col("pair_count") > 0)
            .localCheckpoint(eager=True)
        )
        prev_w.unpersist()
        prev_p.unpersist()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) — tokenize every document with a
    learned merge list (rank order, greedy per pass — exactly the
    ``learn_bpe`` semantics). The merge folds run on the DISTINCT-word
    table only; documents then equi-join word → token count and sum —
    the corpus never re-tokenizes per occurrence. Folds are
    checkpointed every ``checkpoint_every`` merges to keep the plan
    bounded."""
    occ = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
            ).alias("word"),
        )
        .filter(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    uw = occ.select("word").distinct().withColumn(
        "syms", F.split("word", r"(?!^)(?=.)")
    )
    for i, m in enumerate(merges):
        a, b = m[0], m[1]
        uw = uw.withColumn("syms", _bpe_merge_fold(F.col("syms"), a, b))
        if (i + 1) % int(checkpoint_every) == 0:
            uw = uw.localCheckpoint(eager=True)
    uw = uw.select("word", F.size("syms").alias("_wt"))
    return (
        occ.join(uw, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_words"),
            F.sum(F.col("n_occ") * F.col("_wt")).cast("long").alias("n_bpe_tokens"),
        )
    )


def bpe_pair_stats(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 10,
) -> DataFrame:
    """(lsym, rsym, pair_count) — the top-k adjacent character pairs
    weighted by word frequency: exactly ``learn_bpe``'s first-
    iteration argmax table, exposed so the corpus-scale aggregation
    core of the merge loop is value-checkable by an external engine
    (the loop itself is iterative and rows-only — q100). Total
    ordering (count desc, lsym, rsym) makes the top-k deterministic."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    words = _word_table(df, text_col).withColumn(
        "syms", F.split("word", r"(?!^)(?=.)")
    )
    return (
        words.select(
            "cnt",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(syms, 1, size(syms) - 1)").alias("l"),
                    F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("lsym"), F.col("p.r").alias("rsym"))
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("lsym"), F.asc("rsym"))
        .limit(int(top_k))
    )

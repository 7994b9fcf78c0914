"""Distributed BPE merge-rule training (Sennrich et al. 2016)
(SURVEY §2.8 extension surface; no reference counterpart).

``build_vocab``/``encode_tokens`` (text.py) CONSUME a token
vocabulary; this module LEARNS one: byte-pair-encoding merge rules
fitted on the corpus itself, so packing budgets, OOV audits and
length histograms can speak real subword units instead of
whitespace proxies.

Scale shape — the key trick is that BPE never needs the corpus after
one pass: iteration runs on the DISTINCT-WORD table (word, freq,
symbol array), which is orders of magnitude smaller than the corpus
(Heaps' law) and shrinks further as merges fuse symbols. Each of the
T merge steps is:

  1. pair counts: one explode of adjacent symbol bigrams weighted by
     word frequency → groupBy(left, right) partial-agg sum — a
     map-side-combined shuffle over the distinct-word table only;
  2. argmax: a driver fetch of ONE row (max count, lexicographic
     (left, right) tiebreak → fully deterministic) — a fit scalar,
     never row data;
  3. merge apply: a map-only ``F.aggregate`` fold over each symbol
     array — left-to-right non-overlapping replacement, pure JVM
     expression, no Python.

The word table is localCheckpoint'ed every few iterations to stop
the T-deep expression lineage from growing unboundedly (T merge
folds nest otherwise). Iterative argmax makes the op genuinely
non-SQL-expressible — declared rows-only for the oracle harness,
pinned instead by an exact-equality property test against a
sequential reference implementation (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from safedata_pipeline_spark.checkpoint import pin_eager, pin_lazy

END_OF_WORD = "</w>"
_CHECKPOINT_EVERY = 8


def _codepoints(w: Column) -> Column:
    """Split a word into CODE POINTS, not UTF-16 code units.
    ``F.split(w, "")`` splits at every UTF-16 unit, so non-BMP
    characters (emoji, rare CJK) would shatter into unpaired
    surrogates and diverge from the code-point-based sequential
    reference. Java regex ``.`` matches one code point (surrogate
    pairs stay whole); ``(?s)`` keeps any embedded line terminators
    matchable."""
    return F.regexp_extract_all(w, F.lit("(?s)."), 0)


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass → (word, freq, sym) where sym is the initial
    character-level symbol array with the end-of-word marker."""
    words = df.select(
        F.explode(
            F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>")).otherwise(
                F.split(F.trim(F.col(text_col)), "\\s+")
            )
        ).alias("word")
    )
    wf = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    chars = _codepoints(F.col("word"))
    return wf.select(
        "word", "freq", F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("sym")
    )


def _merge_fold(sym: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping replacement of the adjacent pair
    (left, right) with the fused symbol, as a pure expression fold:
    a freshly fused element never re-fuses with the element that
    produced it (standard BPE semantics, e.g. 'aaa' + (a,a) → [aa, a])."""
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == left) & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    n = F.size("sym")
    bigram = F.zip_with(
        F.slice("sym", 1, F.greatest(n - 1, F.lit(0))),
        F.slice("sym", 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        words.select(F.explode(bigram).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_fit(
    df: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules; returns the merge table
    (step, left, right, merged, pair_count) as a DataFrame — the fit
    artifact every encode/pack/OOV consumer keys off. Stops early when
    no pair reaches ``min_pair_count``."""
    spark = df.sparkSession
    words = word_freq_table(df, text_col).transform(pin_eager)
    rules: list[tuple[int, str, str, str, int]] = []
    for step in range(1, num_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_count < min_pair_count:
            break
        left, right, cnt = top[0].left, top[0].right, int(top[0].pair_count)
        rules.append((step, left, right, left + right, cnt))
        words = words.select("word", "freq", _merge_fold(F.col("sym"), left, right).alias("sym"))
        if step % _CHECKPOINT_EVERY == 0:
            words = words.transform(pin_eager)
    return spark.createDataFrame(
        rules, "step int, left string, right string, merged string, pair_count bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to every document: (id, bpe_tokens
    array, n_bpe_tokens). Map-only — the merge list is a fit artifact
    (≤ num_merges entries) baked into the expression as chained folds;
    encoding 100 TB is scan-bound with zero shuffles."""
    chars_of = lambda w: F.concat(_codepoints(w), F.array(F.lit(END_OF_WORD)))  # noqa: E731
    words = F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.col(text_col)), "\\s+")
    )

    def encode_word(w: Column) -> Column:
        sym = chars_of(w)
        for left, right in merges:
            sym = _merge_fold(sym, left, right)
        return sym

    toks = F.flatten(F.transform(words, encode_word))
    return df.select(
        F.col(id_col),
        toks.alias("bpe_tokens"),
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
    )


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts in REAL BPE units: (id, n_tokens).

    Aggregate-FIRST twin of ``bpe_segment`` for counting: the chained
    merge folds are expensive per evaluation (|merges| nested
    ``F.aggregate`` passes), so they run once per DISTINCT WORD — the
    Heaps'-law-small vocabulary table — instead of once per word
    occurrence inside a per-document ``transform`` lambda (measured
    ~10× at sf0.1: 18.9s → the explode+broadcast-join shape below).
    Occurrences then join the broadcast word→n_pieces table and sum
    per doc. Blank/empty docs keep a row with 0 tokens.
    """
    base = df.where(F.col(text_col).isNotNull())
    words = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), "\\s+"))
    occ = base.select(F.col(id_col), F.explode(words).alias("word"))
    distinct_words = occ.select("word").distinct()
    sym = F.concat(_codepoints(F.col("word")), F.array(F.lit(END_OF_WORD)))
    for left, right in merges:
        sym = _merge_fold(sym, left, right)
    per_word = distinct_words.select("word", F.size(sym).alias("n_pieces"))
    per_doc = (
        occ.join(F.broadcast(per_word), "word")
        .groupBy(id_col)
        .agg(F.sum("n_pieces").cast("bigint").alias("n_tokens"))
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(id_col, F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens"))
    )

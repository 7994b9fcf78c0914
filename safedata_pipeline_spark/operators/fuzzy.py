"""Fuzzy string matching — edit-distance threshold self-join
(SURVEY §2.8 extension surface; no reference counterpart).

The record-linkage sibling of the Jaccard family: all pairs of
distinct values within Levenshtein distance ``max_dist``, without the
all-pairs cross join. Candidate generation is Ed-Join-style q-gram
PREFIX filtering (Xiao, Wang & Lin, VLDB 2008): k edits destroy at
most q·k q-gram occurrences, so order every string's distinct grams
by GLOBAL document frequency ascending (rarest first, gram string as
tiebreak) and keep only the first ``q·k + 1`` — for any qualifying
pair, the globally-smallest aligned-surviving gram must sit inside
BOTH prefixes (≤ q·k grams can precede it on either side), so a
prefix×prefix equi-join on the gram is a complete candidate set.
Verification is Spark's built-in ``levenshtein`` (JVM codegen).

Why prefixes and not the positional count filter: on adversarial
domains like sequential IDs (``Customer#000000123``) every pair
shares almost every gram, and a count-filter join degenerates to
all-pairs through the hot grams. The df-ascending prefix confines the
join to each string's q·k+1 RAREST grams (the discriminating ones),
exactly like ``jaccard_prefix_join``'s rarest-first order — hot
boilerplate grams never generate candidates.

Completeness corner: the prefix argument needs ≥ q·k+1 grams, i.e.
length ≥ q·(k+1); shorter values go through a cross join within the
short bucket — bounded because distinct strings under that length
are few by alphabet counting. Both routes end in the same
length-filter + verify.

Scale shape: equi-joins + groupBys over DISTINCT values (value-level
output; callers join ids back); the per-string prefix is picked by a
row_number window PARTITIONED BY value (bounded rows per key). No
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
    q: int = 2,
) -> DataFrame:
    """All distinct-value pairs with levenshtein ≤ max_dist:
    (value_a, value_b, dist), value_a < value_b."""
    if max_dist < 1 or q < 1:
        raise ValueError("need max_dist >= 1 and q >= 1")
    from pyspark.sql import Window

    k = max_dist
    prefix = q * k + 1
    short_cut = q * (k + 1)  # below this the prefix argument is vacuous

    vals = (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias("value"))
        .distinct()
        .select("value", F.length("value").alias("len"))
    )
    long_vals = vals.where(F.col("len") >= short_cut)
    grams = (
        long_vals.select(
            "value",
            "len",
            F.explode(F.sequence(F.lit(1), F.col("len") - F.lit(q - 1))).alias("pos"),
        )
        .select("value", "len", F.substr("value", F.col("pos"), F.lit(q)).alias("gram"))
        .distinct()
    )
    dfreq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    pref = (
        grams.join(dfreq, "gram")
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("value").orderBy("__df", "gram"))
        )
        .where(F.col("rk") <= prefix)
        .select("value", "len", "gram")
    )
    a = pref.select(F.col("value").alias("va"), F.col("len").alias("la"), "gram")
    b = pref.select(F.col("value").alias("vb"), F.col("len").alias("lb"), "gram")
    cands = (
        a.join(
            b,
            (a["gram"] == b["gram"])
            & (F.col("va") < F.col("vb"))
            & (F.abs(F.col("la") - F.col("lb")) <= k),
        )
        .select("va", "vb")
        .distinct()
    )
    # short bucket: any pair with at least one side under q·(k+1)
    # escapes the prefix argument; its partner is then under
    # q·(k+1)+k by the length filter, so BOTH sides of the bucket are
    # bounded-short and the cross join is tiny by alphabet counting
    near_short = vals.where(F.col("len") < short_cut + k)
    sa = near_short.select(F.col("value").alias("va"), F.col("len").alias("la"))
    sb = near_short.select(F.col("value").alias("vb"), F.col("len").alias("lb"))
    shorts = sa.join(
        sb,
        (F.col("va") < F.col("vb"))
        & (F.abs(F.col("la") - F.col("lb")) <= k)
        & ((F.col("la") < short_cut) | (F.col("lb") < short_cut)),
    ).select("va", "vb")
    return (
        cands.union(shorts)
        .select(
            F.col("va").alias("value_a"),
            F.col("vb").alias("value_b"),
            F.levenshtein("va", "vb").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= k)
    )

"""Compressibility quality signals (SURVEY §2.8 extension surface).

Public lineage: DataComp-LM and Dolma use a cheap compression-ratio
screen (zstd/LZ4/gzip output size over raw size) as a quality /
repetition proxy — highly repetitive or template text compresses far
below natural prose, and near-random noise barely compresses at all.
Two operators, one per verification channel:

* ``compression_entropy`` — the ORDER-0 ENTROPY BOUND: per-document
  Shannon entropy over bytes, plus the implied ideal compressed
  fraction H/8 (the floor any order-0 coder can reach — Shannon's
  source-coding theorem, public). Pure column expressions: one char
  explode + one (doc, byte) count + one doc aggregate, with the
  engine-stable ln/DECIMAL discipline (each ln fixed to 6 decimals,
  counts exact integers, sums DECIMAL(38,6)) — hash-checkable against
  a SQL oracle, the channel the deflate ratio itself cannot ride
  (no SQL engine exposes a deflate).

* ``zlib_signal`` — the REAL codec ratio (stdlib zlib = DEFLATE,
  RFC 1951; the same family as the gzip screens in the public
  pipelines). Captures what entropy alone cannot: REPETITION.
  A doc of 'abab…' has 1 bit/byte of order-0 entropy ≈ a coin-flip
  stream, but deflate's LZ77 window collapses the repeats —
  ``zlib_ratio ≪ entropy_ratio`` flags template/boilerplate text the
  entropy bound misses. Arrow ``mapInPandas`` (a per-record C codec is
  exactly the justified-Python contract shared with the image/audio
  codecs). Deterministic for a fixed zlib library + level, but not
  SQL-reproducible ⇒ rows-only channel, pinned by unit determinism /
  monotone-repetition tests and a stat gate correlating it with the
  oracle-checked entropy bound on the fixture.

100 TB shape: both are map-dominated single scans. The entropy
aggregate shuffles (doc, byte) rows that die in the per-doc combine
(map-side combinable — at most 256 rows per doc survive); the zlib
pass is map-only, no shuffle at all. ``spread_small`` unlocks all
cores under the char explode on few-split inputs without ever
coalescing a real corpus scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from safedata_pipeline_spark.partitioning import spread_small

LN2 = 0.6931471805599453  # double literal mirrored in the oracle SQL


def _hex_bytes(col):
    """Array of the UTF-8 BYTES of ``col``, each as a 2-char hex pair
    (empty array for ''). ``hex(encode(col,'utf-8'))`` turns the byte
    string into a hex string whose (2i−1, 2)-substrings are the
    individual byte values — true bytes, not characters, so multi-byte
    text (é = 0xC3 0xA9) counts per BYTE exactly like ``zlib_signal``
    does. Stays JVM-side; DuckDB mirrors it with the same
    hex(encode(..)) pairing."""
    hexed = F.hex(F.encode(col, "UTF-8"))
    n = F.octet_length(col)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.substr(hexed, i * 2 - 1, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def compression_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document order-0 byte entropy and the ideal compressed
    fraction it implies.

    Output: ``(doc_id, n_bytes, n_distinct_bytes, entropy_bits_per_byte,
    ideal_ratio)`` with
    ``H = (n·ln(n) − Σ_b c_b·ln(c_b)) / (n·ln 2)`` bits/byte and
    ``ideal_ratio = H/8`` — the fraction of the raw size an order-0
    coder could reach. Every ln is rounded to 6 decimals before the
    exact-integer multiply and DECIMAL(38,6) sum (the langid/unigram
    discipline), and the finishing divides are the same double ops in
    both engines, floor-snapped to 6dp — hash-stable. Empty documents
    keep their row with 0 bytes / 0.0 entropy."""
    zero6 = F.lit(0).cast("decimal(38,6)")
    # The byte histogram is PER-DOCUMENT state — the former
    # explode → (doc, byte) → (doc) hash-aggregate chain shuffled a
    # row per byte purely to group within the doc, then joined the
    # corpus back to resurrect empty docs. In-row form: distinct byte
    # values (≤ 256) + one count fold per distinct value, one map-only
    # projection chain — zero exchanges, zero joins (guide §2.4), and
    # empty docs keep their row for free. The byte array and its
    # distinct set are materialized as projection COLUMNS so the
    # per-element count folds reference attributes instead of
    # re-evaluating the hex split (CollapseProject never inlines a
    # non-cheap expression referenced more than once).
    m = spread_small(df).select(
        F.col(id_col), _hex_bytes(F.col(text_col)).alias("__b")
    ).select(
        id_col, "__b", F.array_distinct("__b").alias("__db")
    )
    # count × 6dp-ln as a DECIMAL(12,0) × DECIMAL(20,6) multiply: the
    # product (≤32 digits) stays inside decimal-38 on BOTH engines, so
    # the term is EXACT — a double multiply here could drift the sum by
    # an ulp and flip the 6dp snap at a boundary. The per-run sum is
    # the same exact DECIMAL(38,6) addition as the former F.sum —
    # order-independent, so grouping in-row cannot move a bit.
    def _term(c):
        return (
            c.cast("decimal(12,0)")
            * F.round(F.log(c.cast("double")), 6).cast("decimal(20,6)")
        ).cast("decimal(38,6)")

    s = F.aggregate(
        F.transform(
            F.col("__db"),
            lambda x: _term(F.size(F.filter(F.col("__b"), lambda y: y == x))),
        ),
        zero6,
        lambda a, t: (a + t).cast("decimal(38,6)"),
    )
    per_doc = m.select(
        id_col,
        F.size("__b").cast("bigint").alias("n_bytes"),
        F.size("__db").cast("bigint").alias("n_distinct_bytes"),
        s.alias("s"),
    )
    n = F.col("n_bytes")
    # n·ln(n) under the same exact-multiply discipline
    total_bits = (
        n.cast("decimal(12,0)")
        * F.round(F.log(n.cast("double")), 6).cast("decimal(20,6)")
    ).cast("decimal(38,6)")
    h_raw = (total_bits - F.coalesce("s", zero6)).cast("double") / n / F.lit(LN2)
    h = F.when(n == 0, F.lit(0.0)).otherwise(
        F.floor(h_raw * 1e6 + F.lit(0.5)) / 1e6
    )
    base = per_doc.select(
        id_col,
        "n_bytes",
        "n_distinct_bytes",
        h.alias("entropy_bits_per_byte"),
    )
    ratio = F.floor(F.col("entropy_bits_per_byte") / 8 * 1e6 + F.lit(0.5)) / 1e6
    return base.select("*", ratio.alias("ideal_ratio"))


def zlib_signal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> DataFrame:
    """Per-document DEFLATE compressibility: raw UTF-8 byte count,
    ``zlib.compress(..., level)`` output size, and their ratio
    (floor-snapped to 6dp). Ratio is 0.0 for empty docs. LZ77's window
    makes this a REPETITION detector, not just an alphabet-skew one —
    the signal the public gzip/zstd screens threshold on.

    The output id column keeps the CALLER's name and type — the
    ``mapInPandas`` schema is built from ``id_col`` and the input
    column's actual dtype, so a string/int id or a non-default column
    name round-trips (``CorpusPipeline.filter_compressibility`` selects
    back by ``self.id_col``)."""
    import math
    import zlib

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"`{id_col}` {id_type}, n_bytes long, zlib_len long, zlib_ratio double"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                raw = b"" if t is None else str(t).encode("utf-8")
                n = len(raw)
                zl = len(zlib.compress(raw, level)) if n else 0
                ratio = math.floor(zl / n * 1e6 + 0.5) / 1e6 if n else 0.0
                rows.append((did, n, zl, ratio))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_bytes", "zlib_len", "zlib_ratio"]
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(batches, schema)

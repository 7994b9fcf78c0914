"""Deduplication operators for LLM training-data pipelines
(SURVEY §2.8 extension surface; no reference counterpart).

Five dedup families, each with a distinct scale profile:

  * ``dedup_exact``          — hash-groupBy on content digest. One
    shuffle keyed by md5, map-side partial agg; the canonical 100 TB
    exact dedup (never groupBy raw text — the digest is 16 bytes).
  * ``ngram_jaccard_pairs``  — exact n-gram-shingle Jaccard via a
    shingle-inverted-index self-join. Exact but candidate-pair-
    quadratic per shared shingle; used as the verifier/oracle for the
    approximate families.
  * ``minhash_signatures`` / ``minhash_lsh_pairs`` — MinHash (k
    md5-derived hash slots) + banded LSH: candidates come from
    equi-joins on band keys, so cost is O(docs·k) + bucket collisions,
    never all-pairs. The 100 TB near-dup path.
  * ``simhash_signatures``   — 32-bit SimHash over word tokens as a
    pure array-expression fold (no explode, no shuffle).
  * ``embedding_cosine_pairs`` — near-dup by embedding cosine; brute
    upper-triangle self-join as the exact baseline (the ANN module owns
    the scale path).
  * ``dedup_components``     — resolves a near-dup PAIR list into
    duplicate CLUSTERS (connected components, min-id canonical doc) —
    the step that turns any of the pair generators above into an
    actual keep/drop decision.

Everything is md5-based so hashes are engine-reproducible (DuckDB can
compute the identical signatures — these operators are fully
oracle-checkable, unusual for MinHash implementations).
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from safedata_pipeline_spark.checkpoint import pin_eager, pin_lazy
from safedata_pipeline_spark.partitioning import spread_small

_LOG = logging.getLogger(__name__)

ROUND_N = 6


def _word_shingles(col: Column, n: int) -> Column:
    """Distinct word n-gram shingles of a text column (array<string>).
    Blank text → empty array.

    Built by zip_with-folding ``n`` shifted slices of the token array —
    the slices are top-level arguments evaluated once per row. The
    obvious ``transform(sequence, i -> slice(toks, i, n))`` form
    re-evaluates the captured ``toks`` expression (the split itself)
    per element, turning shingling O(len²) — measured ~9x slower on
    the same corpus."""
    toks = F.when(F.trim(col) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(col), "\\s+")
    )
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.slice(toks, 1, cnt)
    for i in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, i + 1, cnt), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(cnt > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: one row per distinct content with the kept
    (minimum) id and the copy count. Output: (content_md5, keep_id,
    n_copies)."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Exact near-dup pairs by word-n-gram Jaccard ≥ threshold.

    Shape: explode distinct shingles → inverted index → self-join on
    shingle (equi-join; only docs sharing a shingle ever pair) → count
    common shingles per (a,b) → Jaccard from per-doc shingle counts.
    Output: (id_a, id_b, jaccard) with id_a < id_b.

    ``max_df`` caps the inverted index's posting lists: shingles shared
    by more than ``max_df`` documents are dropped from candidate
    generation (a shingle with document frequency f contributes f²
    join rows — one web-corpus stop-shingle would otherwise explode the
    self-join). The hot-shingle set is tiny (at most total-occurrences/
    max_df entries), so it is removed with a broadcast anti-join. Per-
    doc shingle counts (the Jaccard denominator) stay EXACT; only the
    intersection count ignores hot shingles, so pairs whose sole
    overlap is stop-shingles are skipped and other jaccards are a
    slight underestimate — the standard trade for bounded cost. Set
    ``max_df=None`` for the fully exact verifier.
    """
    # the exploded shingle table feeds the size agg, the df-cap scan,
    # and BOTH sides of the self-join — materialize once instead of
    # re-running the explode per consumer (measured ~1.5x on the pair
    # chain at sf0.1; narrow (id, shingle) rows). spread_small first:
    # the shingle fold+explode is ~len-fold work per row and a
    # few-split fixture scan would run it (and the pinned partitions
    # every consumer reads) single-core — measured 2.5s -> 0.4s on the
    # pin at sf0.1; exact-integer counts, so the spread cannot move
    # any output bit. No-op on a many-split corpus scan.
    sh = spread_small(df).select(
        F.col(id_col).alias("id"), F.explode(_word_shingles(F.col(text_col), n)).alias("s")
    ).transform(pin_eager)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    joinable = sh
    if max_df is not None:
        # the hot set stays LAZY: the broadcast exchange of the
        # anti-join computes it once from the pinned shingle table —
        # the former pin_eager + count() paid two driver jobs at plan
        # BUILD time per consumer query (guide §5; 8 registry queries
        # build this generator) purely to log a count that is zero
        # below web scale
        hot = (
            sh.groupBy("s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_df)
            .select("s")
        )
        joinable = sh.join(F.broadcast(hot), on="s", how="left_anti")
    a = joinable.alias("a")
    b = joinable.alias("b")
    common = (
        a.join(b, on=(F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                ROUND_N,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


from safedata_pipeline_spark.functions.hashing import md5_slot32 as _hash_slot
from safedata_pipeline_spark.functions.hashing import md5_unit_interval


MINHASH_P = 4294967311  # prime > 2^32


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-family parameters (aᵢ odd, 20-bit so
    aᵢ·x stays < 2^52 — exact in int64 AND in a float64 engine)."""
    import hashlib

    out = []
    for i in range(num_hashes):
        a = (int(hashlib.md5(f"a{i}".encode()).hexdigest()[:8], 16) % (1 << 20)) | 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:8], 16)
        out.append((a, b))
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """MinHash signature per document: slot i = min over shingles of
    hᵢ(shingle), with hᵢ(s) = (aᵢ·md5₃₂(s) + bᵢ) mod P — ONE md5 per
    shingle and k cheap integer transforms, instead of k md5 passes
    over a recomputed shingle array (measured 60s → 3s at sf0.1).
    Pure array expressions per row (the shingle set never leaves the
    task). Output: (doc_id, mh_0..mh_{k-1})."""
    base = F.transform(_word_shingles(F.col(text_col), n), lambda s: _hash_slot(s, 0))
    # the shingle fold + per-shingle md5 is the heavy map work of every
    # MinHash family member; spread it across cores when the scan is a
    # handful of splits (no-op at scale, integer/hash outputs only)
    with_base = spread_small(df).select(F.col(id_col), base.alias("__bh"))

    def slot_min(a: int, b: int):
        return F.array_min(
            F.transform(
                F.col("__bh"), lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)
            )
        )

    cols = [F.col(id_col)]
    for i, (a, b) in enumerate(minhash_params(num_hashes)):
        cols.append(slot_min(a, b).alias(f"mh_{i}"))
    return with_base.select(*cols)


def band_buckets(
    sig: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    id_out: str = "id",
    mh_prefix: str = "",
) -> DataFrame:
    """The ONE banded-LSH digest construction every MinHash family
    shares (``minhash_lsh_pairs`` self-join, ``dedup_incremental_near``
    NEW×REF, ``text.decontaminate_fuzzy`` probe broadcast): cut the
    k-slot signature into ``bands`` bands, md5 the '|'-joined slot
    values of each band into a bucket key, and explode one row per
    (band, key) — carrying the full signature through for the
    verification step. IMPORTANT: callers must hand in a signature
    frame whose mh_i columns are already materialized (an exchange
    barrier or ``pin_lazy``) — fed raw fold expressions, the explode
    re-evaluates every signature once per band row.

    Output: ``(id_out, {mh_prefix}mh_0..{k-1}, band, key)``.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *parts).cast("binary")).alias("key"),
            )
        )
    return sig.select(
        F.col(id_col).alias(id_out),
        *[F.col(f"mh_{i}").alias(f"{mh_prefix}mh_{i}") for i in range(num_hashes)],
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(
        id_out, *[f"{mh_prefix}mh_{i}" for i in range(num_hashes)], "bk.band", "bk.key"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Banded-LSH candidate generation + MinHash-estimated Jaccard.

    Signatures are cut into ``bands`` bands of k/bands rows; docs
    agreeing on ALL rows of any band become candidates (equi-join on
    the band digest — no all-pairs stage anywhere). Estimated Jaccard =
    fraction of agreeing signature slots; pairs ≥ threshold survive.
    Output: (id_a, id_b, est_jaccard) with id_a < id_b.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    # signatures feed BOTH sides of the self-join — localCheckpoint
    # computes them once and, unlike cache(), releases the blocks when
    # the result DataFrame is GC'd instead of leaking a CacheManager
    # entry per invocation in a long-lived session. (Caveat: no lineage
    # to recompute on executor loss; acceptable for a deterministic
    # single-pass signature table.)
    sig = minhash_signatures(df, text_col, id_col, num_hashes, n).transform(pin_lazy)
    buckets = band_buckets(sig, id_col, num_hashes, bands)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            *[
                (F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}")).cast("int").alias(f"eq_{i}")
                for i in range(num_hashes)
            ],
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = sum(F.col(f"eq_{i}") for i in range(num_hashes))
    return cand.select(
        "id_a",
        "id_b",
        F.round(agree / F.lit(float(num_hashes)), ROUND_N).alias("est_jaccard"),
    ).where(F.col("est_jaccard") >= threshold)


def minhash_threshold_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    buckets: int = 10,
) -> DataFrame:
    """Candidate-pair counts per estimated-Jaccard bucket — the tuning
    curve for choosing ``minhash_lsh_pairs``' threshold ("how many
    pairs would each cutoff keep?"). One grouped count over the
    candidate pairs at threshold 0: bucket = floor(est·buckets),
    clamped to the top bucket so est = 1.0 lands in it. Output one
    row per occupied bucket: ``(bucket_lo, n_pairs)``.

    Estimates are exact dyadic fractions (k/num_hashes), so the
    bucket arithmetic is engine-identical; the pair generation is the
    same banded equi-join, never all-pairs.
    """
    pairs = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes=num_hashes, bands=bands, n=n, threshold=0.0
    )
    b = F.least(
        F.floor(F.col("est_jaccard") * buckets), F.lit(buckets - 1)
    )
    return (
        pairs.groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            F.round(F.col("bucket") / F.lit(float(buckets)), 6).alias("bucket_lo"),
            "n_pairs",
        )
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32
) -> DataFrame:
    """SimHash over word tokens: bit j of the signature is the sign of
    Σ_tokens (±1 depending on bit j of hash(token)). A pure array fold
    per row — no explode, no shuffle. Output: (doc_id, simhash bigint).
    Near-duplicate docs differ in few bits (Hamming distance)."""
    toks = F.when(F.trim(F.col(text_col)) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(F.col(text_col)), "\\s+")
    )
    hashes = F.transform(toks, lambda t: _hash_slot(t, 0))
    # bit masks are Python-int literals; per-token ±1 votes fold into a
    # bits-long accumulator array, sign pattern re-packs into a bigint
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(h.bitwiseAND(F.lit(1 << j)) != 0, F.lit(1).cast("long")).otherwise(
                        F.lit(-1).cast("long")
                    )
                    for j in range(bits)
                ]
            ),
            lambda x, y: x + y,
        ),
    )
    powers = F.array(*[F.lit(1 << j).cast("bigint") for j in range(bits)])
    sim = F.aggregate(
        F.zip_with(votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # the ±1-vote fold is O(tokens × bits) per row — spread a few-split
    # fixture scan across cores (no-op at scale; bigint output only)
    return spread_small(df).select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming`` —
    the pair-generation step for the SimHash family (Manku et al. 2007,
    "Detecting Near-Duplicates for Web Crawling" — the public Google
    web-dedup paper; its table-of-rotations becomes a band equi-join
    here).

    By pigeonhole, two signatures within Hamming distance d agree on at
    least one of d+1 disjoint bit blocks — so candidates come from an
    equi-join on (band index, band bits), never an all-pairs scan, and
    with ``bands`` > ``max_hamming`` the result is EXACT for the given
    signatures. The final Hamming filter is a bit-count over XOR.

    Scale: |docs|·bands shuffle rows of (int, int, id); collisions per
    band bucket are the only quadratic term (same profile as MinHash
    LSH). Everything md5-derived — oracle-reproducible in any engine
    with xor + bit_count.

    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) for the "
            "pigeonhole band join to be exact"
        )
    band_bits = bits // bands
    sig = simhash_signatures(df, text_col, id_col, bits).select(
        F.col(id_col).alias("id"), F.col("simhash")
    )
    banded = sig.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .cast("bigint")
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    # materialize the banded table once (narrow: id + signature +
    # band, `bands` rows per doc). The simhash column is a token-array
    # fold; left lazy, CollapseProject inlines it into the posexplode
    # projection and the self-join evaluates the whole signature
    # subtree on BOTH sides (measured 5.5-10s → 2.3s at sf0.1) — the
    # same discipline as dedup_incremental_near's bucket tables.
    banded = banded.transform(pin_eager)
    a, b = banded.alias("a"), banded.alias("b")
    # bit_count is a JVM intrinsic (one popcount per pair); an array
    # fold over 32 masks here cost ~30x more per candidate
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.cast("bigint").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold — exact brute
    upper-triangle self-join baseline (O(n²·d); ANN module owns the
    LSH-bucketed scale path). Output: (id_a, id_b, cosine). Zero-norm
    vectors have undefined cosine → explicit NULL on both engines (see
    ``functions.vector.cosine``), so their pairs never pass the
    threshold."""
    from safedata_pipeline_spark.functions.vector import cosine as _cos
    from safedata_pipeline_spark.functions.vector import norm as _norm

    v = F.col(vec_col).cast("array<double>")
    e = df.select(F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("nrm"))
    # spread the probe side of the broadcast NLJ across cores when the
    # scan is a handful of splits; no-op (and no shuffle) at scale
    a, b = spread_small(e).alias("a"), e.alias("b")
    return (
        a.join(F.broadcast(b), on=F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _cos(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")), ROUND_N
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def dedup_components_star(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via large-star/small-star alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the deep-diameter variant of ``dedup_components``.

    Plain min-label propagation needs O(diameter) rounds; the star
    operations contract paths so convergence is O(log² n) rounds even
    for chain-shaped components. Use this when duplicate clusters are
    NOT near-cliques (e.g. transitive chains from asof/threshold
    pairing). Same output contract as ``dedup_components``:
    (doc_id, comp_id, is_canonical).

    Each operation is a groupBy-min + equi-join — no per-node neighbor
    lists are ever collected, so giant stars don't OOM a task. Edge
    frames are localCheckpoint'ed per round (auto-released on GC).
    """
    # undirected edge set, kept as (u, v); self-loops dropped. Lazy
    # pin + count: the count materializes the checkpoint AND seeds the
    # convergence bookkeeping (edge counts are tracked driver-side so
    # no round ever re-counts an already-pinned frame)
    e = (
        pairs.select(F.col("id_a").cast("bigint").alias("u"), F.col("id_b").cast("bigint").alias("v"))
        .where(F.col("u") != F.col("v"))
        .dropDuplicates()
        .transform(pin_lazy)
    )
    e_cnt = e.count()
    for _ in range(max_iter):
        # large-star: connect every neighbor v > u to m(u) = min(N(u) ∪ {u})
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        large = (
            sym.join(m, on="u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .dropDuplicates()
        )
        # small-star: orient (u = max, v = min); connect u and all its
        # smaller neighbors to m(u) = min of those neighbors
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        sm = oriented.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            oriented.join(sm, on="u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(sm.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .dropDuplicates()
            .transform(pin_lazy)
        )
        # converged when the star rounds stop rewriting the edge set.
        # The count job doubles as the pin materialization; the prior
        # round's count rides a driver variable, and the (expensive)
        # exceptAll probe only runs when the counts already agree
        small_cnt = small.count()
        if small_cnt == e_cnt and small.exceptAll(e).limit(1).count() == 0:
            e = small
            break
        e, e_cnt = small, small_cnt
    comp = e.groupBy("u").agg(F.min("v").alias("comp"))
    labels = (
        docs.select(F.col(id_col).cast("bigint").alias("id"))
        .join(comp, on=F.col("id") == F.col("u"), how="left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    )
    return labels.select(
        F.col("id").alias(id_col),
        F.col("comp").alias("comp_id"),
        (F.col("comp") == F.col("id")).alias("is_canonical"),
    )


def dedup_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup pairs into duplicate clusters: every doc gets
    the minimum id of its connected component as its canonical
    representative. Output: (doc_id, comp_id, is_canonical) — keep the
    canonical rows, drop the rest.

    Iterative min-label propagation **restricted to the edge-vertex
    set**: a doc that appears in no near-dup pair can never change
    label, so the loop runs only over docs that occur in at least one
    edge (at 100 TB this is the small duplicated fraction of the
    corpus, not the corpus), and the full-corpus frame is touched
    exactly once — a final left join that defaults every untouched doc
    to its own id. Each round every edge-vertex takes the min of its
    own and its neighbors' labels; converges in O(component diameter)
    rounds (web-corpus dup clusters are near-cliques ⇒ 2–3 rounds).
    Per round: one equi-join edges⋈labels + one groupBy min — both
    map-side combinable — and the convergence check reads the changed
    count off the just-pinned frame's carried ``prev`` column (no extra
    join job). If diameters grow, switch to the large-star/small-star
    alternation, which squares label reach per round. Labels only ever
    decrease, so the changed-count convergence check is exact.
    """
    edges = pairs.select(
        F.col("id_a").cast("bigint").alias("src"), F.col("id_b").cast("bigint").alias("dst")
    )
    # localCheckpoint throughout the loop: materializes each round's
    # labels, truncates the otherwise round-deep lineage, and the blocks
    # are auto-released on GC — the final labels frame no longer leaves
    # a permanent CacheManager entry behind (the old persist() did).
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(pin_lazy)
    # symmetric edge set ⇒ every edge-vertex appears as src, so the
    # vertex table and the per-round neighbor agg both cover exactly
    # the propagation domain (inner joins below are loss-free).
    # The semi-join guards the pairs-ids ⊆ docs-ids precondition: a
    # stray edge id absent from docs gets NO label row, so it can
    # neither transmit a label (neighbor join on dst is inner against
    # labels) nor receive one (per-round labels join is inner) — it
    # cannot win the min-label election and strand a component without
    # a canonical doc. Guarding the DEDUPLICATED vertex table costs one
    # |V|-sized semi-join instead of two |E|-sized ones.
    doc_ids = docs.select(F.col(id_col).cast("bigint").alias("id")).dropDuplicates()
    labels = (
        sym.select(F.col("src").alias("id"))
        .dropDuplicates()
        .join(doc_ids, "id", "left_semi")
        .select("id", F.col("id").alias("comp"))
        .transform(pin_lazy)
    )
    for _ in range(max_iter):
        neigh = (
            sym.alias("e")
            .join(labels.alias("l"), F.col("e.dst") == F.col("l.id"))
            .groupBy(F.col("e.src").alias("id"))
            .agg(F.min("l.comp").alias("ncomp"))
        )
        # lazy pin + count: the count action MATERIALIZES the
        # checkpoint (a LogicalRDD computes whole partitions, so
        # nothing is pruned) — one job per round where the eager
        # pin + count pair cost two
        new_labels = (
            labels.join(neigh, "id")
            .select(
                "id",
                F.least(F.col("comp"), F.col("ncomp")).alias("comp"),
                F.col("comp").alias("prev"),
            )
            .transform(pin_lazy)
        )
        changed = new_labels.where(F.col("comp") != F.col("prev")).count()
        labels = new_labels.drop("prev")
        if changed == 0:
            break
    return (
        docs.select(F.col(id_col).cast("bigint").alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("comp", F.col("id")).alias("comp_id"),
            (F.coalesce("comp", F.col("id")) == F.col("id")).alias("is_canonical"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Global sub-document exact dedup, C4-style (Raffel et al. 2020
    §2.2 — public paper; the C4 pipeline drops every repeated three-
    sentence span corpus-wide): split each document on ``sep``, keep
    only the FIRST occurrence of each unit across the whole corpus
    (first = smallest ``(doc_id, position)``), and reassemble the
    surviving units in their original order.

    Output per input doc: ``(id, text_dedup, n_units, n_kept)`` —
    every doc keeps a row even if all its units were dropped
    (``text_dedup`` = '').

    Plan shape: posexplode → per-unit first-occurrence window
    partitioned BY UNIT (shuffle keyed on unit text — high cardinality,
    well spread; no global sort) → re-assemble with a map-side-
    combinable ``collect_list`` + in-row ``array_sort``. For 100 TB,
    partition the window on ``md5(unit)`` instead of raw text to keep
    shuffle rows small; semantics are identical (md5 collisions aside),
    kept as raw text here so any SQL engine reproduces it exactly.
    """
    # \Q...\E-quote the separator: F.split takes a REGEX, but the
    # contract here (and the oracle's string_split) is a literal
    # separator — an unquoted "." or "|" would split on every character
    units = F.filter(
        F.transform(
            F.split(F.col(text_col), f"\\Q{sep}\\E"), lambda u: F.trim(u)
        ),
        lambda u: u != "",
    )
    # unit explode is ~len-fold map work: spread a few-split fixture
    # scan (no-op at scale; the first-occurrence window and integer
    # counts are partition-order independent)
    exploded = spread_small(df).select(
        F.col(id_col).alias("id"), F.posexplode(units).alias("pos", "unit")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("unit").orderBy("id", "pos")
    kept = exploded.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1)
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "unit"))), lambda s: s["unit"]
            ),
            sep,
        ).alias("text_dedup"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.select(F.col(id_col).alias("id"), F.size(units).cast("bigint").alias("n_units"))
    return (
        base.join(rebuilt, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.col("n_units"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )


def dedup_incremental(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental exact dedup: keep only new documents whose content
    digest does NOT appear in an already-ingested reference corpus —
    the batch-over-batch ingestion step (each crawl drop dedups against
    everything accepted before it, the streaming twin being
    ``stream_dedup_exact``'s watermark state).

    Shape: digest both sides (map-only md5) → LEFT ANTI equi-join on
    the digest. The anti-join shuffles only digests + ids, never
    payloads; Spark's runtime Bloom-filter join optimization
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects the
    classic "bloom prefilter before the shuffle" automatically when the
    reference side is selective, and AQE picks broadcast when the
    reference digest set is small. Self-duplicates WITHIN the new batch
    are also collapsed (min-id wins, ``dedup_exact`` semantics), so the
    output is duplicate-free against ref ∪ itself. NULL-text rows are
    dropped on BOTH sides before digesting: Spark's null digest never
    equi-joins while SQL ``NOT IN`` nulls evaluate UNKNOWN, so keeping
    them would make the engines disagree on null-text documents.
    """
    w_digest = F.md5(F.col(text_col).cast("binary")).alias("__digest")
    ref_d = (
        ref_docs.where(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col).cast("binary")).alias("__digest"))
        .dropDuplicates()
    )
    new_d = new_docs.where(F.col(text_col).isNotNull()).select("*", w_digest)
    survivors = new_d.join(ref_d, on="__digest", how="left_anti")
    # collapse in-batch duplicates: keep the min id per digest
    keep = survivors.groupBy("__digest").agg(F.min(F.col(id_col)).alias(id_col))
    return survivors.join(keep, on=["__digest", id_col], how="left_semi").drop("__digest")


def cluster_size_histogram(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster size distribution → one row per size:
    ``(cluster_size, n_clusters)`` — the dedup diagnostic ("is the
    corpus mostly singletons with a few mega-clusters, or uniformly
    near-duplicated?") that decides whether keep-one-per-cluster is
    safe or a mega-cluster needs inspection first.

    Composes on ``dedup_components``; two grouped counts on top of the
    label frame (components → sizes → histogram), both map-side
    combinable. Output is at most |distinct sizes| rows — tiny.
    """
    labels = dedup_components(docs, pairs, id_col, max_iter)
    sizes = labels.groupBy("comp_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    ).select(F.col("cluster_size").cast("bigint").alias("cluster_size"), "n_clusters")


def dedup_components_best(
    docs: DataFrame,
    pairs: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster resolution that keeps the BEST document of
    each cluster instead of the arbitrary min-id one — what a curation
    run actually wants (drop the truncated/boilerplate variants, keep
    the highest-quality copy). ``quality`` is any (id, score) frame —
    e.g. ``text.quality_score`` output.

    Same min-label propagation as ``dedup_components``; the keeper is
    then one window per component ordered by (score desc, id asc) —
    components are numerous and small, so the window partitions well.
    Output: (doc_id, comp_id, score, is_kept).
    """
    from pyspark.sql import Window

    labels = dedup_components(docs, pairs, id_col, max_iter)
    scored = labels.join(
        quality.select(F.col(id_col), F.col(quality_col).alias("score")),
        on=id_col,
        how="left",
    )
    w = Window.partitionBy("comp_id").orderBy(
        F.desc_nulls_last("score"), F.asc(id_col)
    )
    return scored.select(
        id_col,
        "comp_id",
        "score",
        (F.row_number().over(w) == 1).alias("is_kept"),
    )


def split_leakage_pairs(
    assignments: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Train/eval SPLIT-LEAKAGE audit: near-duplicate pairs that cross
    the split boundary. A document whose near-dup sits in the eval
    split inflates eval scores exactly like benchmark contamination —
    this is the within-corpus twin of ``text.decontaminate``.

    ``assignments``: (id, split) — any deterministic split column.
    ``pairs``: output of any pair generator here (id_a, id_b, …).
    Output: the crossing pairs, each annotated with both splits.

    Shape: two broadcast-or-shuffle hash joins on the id (the
    assignment table is narrow); no new pair generation — the audit
    reuses whatever candidate structure (LSH bands, shingle postings)
    produced ``pairs``, so its cost is O(|pairs|), not O(n²).
    """
    a = assignments.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a")
    )
    b = assignments.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b")
    )
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .where(F.col("split_a") != F.col("split_b"))
    )


def split_leakage_summary(
    assignments: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """One row per (split_a, split_b) direction pair: how many
    near-dup edges cross it, and how many distinct eval-side docs are
    compromised. ``n_leaked_docs`` counts distinct id_b — the docs
    whose split is contaminated by a near-dup on the other side."""
    crossing = split_leakage_pairs(assignments, pairs, id_col, split_col)
    return crossing.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.count_distinct("id_b").cast("bigint").alias("n_leaked_docs"),
    )


def dedup_rate_by_source(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-health KPI: per source, what fraction of documents are
    exact duplicates of another document IN that source — the number a
    curation dashboard watches between runs (a rising dup rate means
    an upstream feed started re-sending). Output: one row per group —
    (group, n_docs, n_unique, dup_rate). NULL texts count as docs but
    never as duplicates of each other (digest NULL ≠ digest NULL,
    matching ``dedup_exact``).

    Shape: ONE groupBy with a distinct-count over the md5 digest —
    map-side combinable counts plus the usual distinct expand; no
    join, no second scan."""
    digest = F.md5(F.col(text_col).cast("binary"))
    return df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.count_distinct(digest)
            + F.sum(F.col(text_col).isNull().cast("bigint"))
        ).cast("bigint").alias("n_unique"),
        F.round(
            F.lit(1.0)
            - F.try_divide(
                F.count_distinct(digest)
                + F.sum(F.col(text_col).isNull().cast("bigint")),
                F.count(F.lit(1)),
            ),
            6,
        ).alias("dup_rate"),
    )


def _positional_windows(words: Column, k: int) -> Column:
    """All k-word windows of a token array, POSITION-ALIGNED: element
    ``i`` of the result is words[i..i+k-1] joined by a single space
    (0-based start ``i``). Fewer than ``k`` words → empty array.

    Same zip_with-fold as ``_word_shingles`` (the slices are top-level
    arguments evaluated once per row; a ``transform(sequence, ...)``
    capture would re-evaluate the token split per element, O(len²)) —
    but WITHOUT the ``array_distinct``: position identity is the point.
    """
    cnt = F.greatest(F.size(words) - F.lit(k - 1), F.lit(0))
    grams = F.slice(words, 1, cnt)
    for i in range(1, k):
        grams = F.zip_with(
            grams, F.slice(words, i + 1, cnt), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(cnt > 0, grams).otherwise(F.array().cast("array<string>"))


def _merged_cover_intervals(starts: Column, k: int) -> Column:
    """Merged closed intervals ``[s, s+k-1]`` covering every start in
    ``starts`` (an ASCENDING int array): one in-row fold, adjacent or
    overlapping windows coalesce (``s_next <= e_prev + 1``). Because
    the input is sorted, each new window's end exceeds the previous
    end, so extending is always ``e = s_next + k - 1``.

    This is the shuffle-thin representation of the ExactSubstr marked
    set: a duplicated occurrence ships ONE int (its start) instead of
    its k covered positions, and the union-of-marks set the removal
    step needs is recovered per doc as O(intervals) rather than
    O(k x occurrences) flattened indices.
    """
    empty = F.array().cast("array<struct<s:int,e:int>>")
    return F.aggregate(
        starts,
        empty,
        lambda acc, p: F.when(
            F.try_element_at(acc, F.lit(-1)).getField("e") >= p - 1,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.try_element_at(acc, F.lit(-1)).getField("s").alias("s"),
                        (p + F.lit(k - 1)).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + F.lit(k - 1)).alias("e"))))
        ),
    )


def _intervals_total_len(intervals: Column) -> Column:
    """Total covered positions of disjoint merged intervals."""
    return F.aggregate(
        intervals, F.lit(0), lambda acc, iv: acc + (iv.getField("e") - iv.getField("s") + 1)
    )


def substring_dedup(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact repeated-SUBSTRING dedup at sub-document granularity —
    the dedup mode large-corpus curation applies against boilerplate
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better", public paper: its ExactSubstr pass removes every
    substring of ≥ N tokens occurring twice anywhere in the corpus,
    keeping one copy). ``paragraph_dedup`` needs a separator; this
    operator catches repeats ANYWHERE inside running text.

    Spark-first reformulation (no distributed suffix array): the match
    unit is the fixed-length k-word window, slid over EVERY position.
    Any repeated run of m ≥ k words is covered by exactly its m−k+1
    repeated k-windows; every NON-FIRST occurrence of each duplicated
    window (first = smallest ``(doc_id, start)``, a total order) marks
    its k word positions for removal, and a document's cleaned text is
    its unmarked words re-joined by single spaces.

    Boundary semantics — WORD-EXACT for repeats ≥ k: because windows
    overlap at every offset, the duplicated windows of a maximal
    repeated run tile precisely its word span, and a window straddling
    the run boundary is by maximality not a repeat — so no adjacent
    word is ever clipped, in either direction (pinned by the
    sequential-twin test
    ``test_substring_dedup_exact_boundaries_vs_sequential_twin``).
    Remaining deltas vs Lee et al.'s suffix-array ExactSubstr are only
    granularity: repeats shorter than k WORDS survive (their threshold
    counts tokens/bytes), matches are word-aligned (a repeat starting
    mid-word is invisible), and the rebuild renders inter-word
    whitespace as single spaces.

    Output per input doc (null/blank texts dropped):
    ``(id, n_words, n_removed, clean_text)``; a fully-duplicated doc
    keeps its row with ``clean_text = ''``.

    Plan shape, in 100 TB terms: window digests are md5 strings, so
    the corpus text itself never shuffles — (1) map-only shingle +
    posexplode, (2) groupBy(digest) with map-side-combinable
    min(struct)/count (high-cardinality key, well spread), (3) digest
    equi-join occurrences×duplicated-digests (AQE broadcasts when the
    dup set is small — boilerplate corpora), (4) groupBy(doc) of
    marked START positions — one int per duplicated occurrence through
    the shuffle, never the k-wide span — (5) doc-keyed left join back,
    merged-interval cover rebuilt in-row, keep-filter per word tests
    O(intervals) not O(marked chars). Deterministic
    end-to-end: md5 windows, (doc_id, start) first-occurrence order —
    fully oracle-checkable, DuckDB reproduces every hash.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (a 1-word window dedups the vocabulary)")
    words = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), "\\s+"))
    base = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col).alias("id"), words.alias("__words"))
    )
    # spread before the ~n_words-fold window explode (no-op at scale)
    occ = spread_small(base).select(
        "id", F.posexplode(_positional_windows(F.col("__words"), k)).alias("pos", "gram")
    ).select("id", "pos", F.md5(F.col("gram").cast("binary")).alias("h"))
    dup = (
        occ.groupBy("h")
        .agg(
            F.min(F.struct(F.col("id"), F.col("pos"))).alias("first"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") >= 2)
        .select("h", "first")
    )
    marked_occ = (
        occ.join(dup, on="h")
        .where(
            ~((F.col("id") == F.col("first.id")) & (F.col("pos") == F.col("first.pos")))
        )
        .select("id", "pos")
    )
    # one int per duplicated occurrence through the shuffle; the k-wide
    # covered span is recovered in-row as merged intervals
    marked = marked_occ.groupBy("id").agg(
        F.array_sort(F.collect_list("pos")).alias("__starts")
    )
    intervals = _merged_cover_intervals(
        F.coalesce(F.col("__starts"), F.array().cast("array<integer>")), k
    )
    kept = F.filter(
        F.col("__words"),
        lambda w, i: ~F.exists(
            F.col("__iv"), lambda iv: (i >= iv.getField("s")) & (i <= iv.getField("e"))
        ),
    )
    return (
        base.join(marked, on="id", how="left")
        .withColumn("__iv", intervals)
        .select(
            F.col("id").alias(id_col),
            F.size("__words").cast("bigint").alias("n_words"),
            _intervals_total_len(F.col("__iv")).cast("bigint").alias("n_removed"),
            F.concat_ws(" ", kept).alias("clean_text"),
        )
    )


def substring_dedup_chars(
    df: DataFrame,
    k: int = 40,
    text_col: str = "text",
    id_col: str = "doc_id",
    snap: str = "word",
) -> DataFrame:
    """CHARACTER-granular ExactSubstr dedup — the tightened sibling of
    word-window ``substring_dedup``, closing most of the granularity
    gap to Lee et al. 2022's suffix-array formulation (their threshold
    counts ~50 BPE tokens of raw bytes; here: any repeated run of
    ≥ k CHARACTERS, word alignment NOT required — a repeat starting
    mid-word is now visible).

    Construction (same covering argument as the word form, at char
    offsets): the match unit is the k-char window slid over every
    position of the whitespace-NORMALIZED text (words joined by single
    spaces — the word form's rebuild convention, applied up front so
    char offsets are engine-reproducible); a maximal repeated run of
    m ≥ k chars is tiled exactly by its m−k+1 duplicated windows, so
    marked chars cover precisely the repeated span — CHAR-EXACT
    boundaries, pinned by the char-level sequential twin test.
    Every non-first occurrence (first = min (doc_id, pos)) marks its k
    char positions.

    Removal modes:
      * ``snap='word'`` (default, conservative): a word is removed iff
        EVERY one of its characters is marked — partially-duplicated
        boundary words survive intact (under-removal bounded by one
        word per run edge), and the output never contains word
        fragments. The safe default for corpus curation.
      * ``snap='none'``: exact char splice (Lee et al. semantics on
        the normalized text) — keeps every unmarked char, fragments
        and all.

    Output per surviving doc: ``(id, n_chars, n_marked_chars,
    clean_text)``; fully-duplicated docs keep their row with
    ``clean_text = ''``.

    100 TB shape: identical skeleton to ``substring_dedup`` — digests
    shuffle, text doesn't; the char grid multiplies the occurrence
    table ~6× over the word grid (the honest cost of char exactness —
    run the word form first as the cheap pass, this one on survivors).
    Marked occurrences ship one START int each; the covered char set
    is recovered in-row as merged disjoint intervals, so the word-snap
    coverage check is O(words × intervals) and the exact splice is
    O(intervals) substring concatenations.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if snap not in ("word", "none"):
        raise ValueError("snap must be 'word' or 'none'")
    norm = F.concat_ws(" ", F.split(F.trim(F.col(text_col)), "\\s+"))
    base = (
        df.where(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col).alias("id"), norm.alias("__t"))
    )
    n = F.length("__t")
    # window identity = TWO independent xxhash64 values (128 bits
    # total: h2 seeds the word stream with a literal) instead of the
    # former md5 hex string. The key shrinks from a 32-char string
    # (~48 shuffle bytes + string hashing/GC in the group-by) to two
    # longs (16 bytes), and the per-window digest is cheaper. The
    # 2⁻¹²⁸ cross-corpus collision latitude is the md5 one — the same
    # measure-zero class every hashed kernel here accepts; the output
    # carries no hash (clean_text/counts only), and the sequential
    # twin test groups by the actual substring.
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.xxhash64(F.substr(F.col("__t"), i, F.lit(k))).alias("h1"),
                F.xxhash64(
                    F.lit(1), F.substr(F.col("__t"), i, F.lit(k))
                ).alias("h2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,h1:bigint,h2:bigint>>"))
    # spread before the ~len-fold char-window explode (no-op at scale)
    occ = spread_small(base).select("id", F.explode(grams).alias("g")).select(
        "id", F.col("g.pos").alias("pos"), F.col("g.h1").alias("h1"), F.col("g.h2").alias("h2")
    )
    dup = (
        occ.groupBy("h1", "h2")
        .agg(
            F.min(F.struct(F.col("id"), F.col("pos"))).alias("first"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .where(F.col("cnt") >= 2)
        .select("h1", "h2", "first")
    )
    marked_occ = (
        occ.join(dup, on=["h1", "h2"])
        .where(
            ~((F.col("id") == F.col("first.id")) & (F.col("pos") == F.col("first.pos")))
        )
        .select("id", "pos")
    )
    # one int per duplicated occurrence through the shuffle (not k char
    # indices); the covered char set is recovered in-row as merged
    # disjoint intervals, so the splice/coverage steps are O(intervals)
    marked = marked_occ.groupBy("id").agg(
        F.array_sort(F.collect_list("pos")).alias("__starts")
    )
    joined = base.join(marked, on="id", how="left").withColumn(
        "__iv",
        _merged_cover_intervals(
            F.coalesce(F.col("__starts"), F.array().cast("array<integer>")), k
        ),
    )
    if snap == "none":
        # splice: concatenate the unmarked gaps between merged intervals
        clean = F.aggregate(
            F.col("__iv"),
            F.struct(F.lit(1).alias("c"), F.lit("").alias("t")),
            lambda acc, iv: F.struct(
                (iv.getField("e") + 1).alias("c"),
                F.concat(
                    acc.getField("t"),
                    F.substr(
                        F.col("__t"),
                        acc.getField("c"),
                        F.greatest(iv.getField("s") - acc.getField("c"), F.lit(0)),
                    ),
                ).alias("t"),
            ),
            lambda acc: F.concat(
                acc.getField("t"),
                F.substr(
                    F.col("__t"),
                    acc.getField("c"),
                    F.greatest(n - acc.getField("c") + 1, F.lit(0)),
                ),
            ),
        )
    else:
        ws = F.split(F.col("__t"), " ")
        # word char spans [s, e] (1-based) by an expression fold: the
        # normalized text is single-space joined, so next start is
        # previous end + 2
        spans = F.aggregate(
            ws,
            F.array().cast("array<struct<s:int,e:int>>"),
            lambda acc, w: F.concat(
                acc,
                F.array(
                    F.struct(
                        F.coalesce(
                            F.try_element_at(acc, F.lit(-1)).getField("e") + 2, F.lit(1)
                        ).alias("s"),
                        (
                            F.coalesce(
                                F.try_element_at(acc, F.lit(-1)).getField("e") + 2, F.lit(1)
                            )
                            + F.length(w)
                            - 1
                        ).alias("e"),
                    )
                ),
            ),
        )
        tagged = F.zip_with(
            ws,
            spans,
            lambda w, sp: F.struct(
                w.alias("w"), sp.getField("s").alias("s"), sp.getField("e").alias("e")
            ),
        )
        # a word is fully covered iff its span sits inside ONE merged
        # interval (merged intervals are maximal contiguous runs)
        kept = F.filter(
            tagged,
            lambda x: ~F.exists(
                F.col("__iv"),
                lambda iv: (iv.getField("s") <= x.getField("s"))
                & (x.getField("e") <= iv.getField("e")),
            ),
        )
        clean = F.concat_ws(" ", F.transform(kept, lambda x: x.getField("w")))
    return joined.select(
        F.col("id").alias(id_col),
        n.cast("bigint").alias("n_chars"),
        _intervals_total_len(F.col("__iv")).cast("bigint").alias("n_marked_chars"),
        clean.alias("clean_text"),
    )


def leakage_free_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    train_fraction: float = 0.8,
    max_iter: int = 20,
) -> DataFrame:
    """Train/eval split with a ZERO-leakage guarantee: the md5 coin is
    flipped per duplicate CLUSTER, not per document, so every member
    of a near-dup component lands on the same side and
    ``split_leakage_pairs`` over this assignment is empty by
    construction (for the pair generator that produced ``pairs``).
    Per-doc random splits leak: with dup rate d, ~2·d·p·(1−p) of docs
    have a near-twin across the boundary — the within-corpus
    contamination that inflates eval scores.

    Output: (id, comp_id, split) — one row per doc; singletons form
    their own component (comp_id = own id), so non-duplicated docs
    still split ~train_fraction.

    Shape: ``dedup_components`` min-label propagation (O(diameter)
    equi-join rounds) + ONE map-side md5 coin on the component id —
    the same replayable-coin contract as ``assign_folds``, so the
    assignment is deterministic on any engine at any parallelism, and
    downstream incremental runs re-derive it instead of storing it.
    """
    if not 0.0 < train_fraction < 1.0:
        raise ValueError("train_fraction must be in (0, 1)")
    labels = dedup_components(docs, pairs, id_col, max_iter)
    coin = md5_unit_interval(F.col("comp_id"))
    return labels.select(
        F.col(id_col),
        "comp_id",
        F.when(coin <= F.lit(train_fraction), F.lit("train"))
        .otherwise(F.lit("eval"))
        .alias("split"),
    )


def dedup_incremental_near(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental NEAR-dup ingestion: drop every new document whose
    MinHash-estimated Jaccard against ANY accepted reference document
    reaches ``threshold`` — the production crawl-drop step
    ``dedup_incremental`` (exact digests) can't cover: re-crawls with
    boilerplate edits, template re-renders, near-verbatim syndication.
    In-batch near-dups among the survivors are deliberately left to
    the regular near-dedup step (the pipeline composes both).

    Output: the surviving ``new_docs`` rows, schema unchanged
    (null-text rows dropped on both sides, ``dedup_incremental``'s
    contract — a null text can neither match nor be matched).

    Shape, in 100 TB terms: both sides reduce to (id, band, band-key,
    signature) — text never crosses the wire. Candidates come from the
    band-key equi-join NEW × REF only (never new×new, never ref×ref —
    unlike the self-join in ``minhash_lsh_pairs``, cost scales with
    the CROSS collisions), verified against the full signatures; the
    matched-id set then drives one LEFT ANTI join (digest-narrow,
    bloom/broadcast-optimizable). md5-deterministic end to end, so
    even this approximate path is oracle-checkable.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")

    def buckets(df: DataFrame, side: str) -> DataFrame:
        # exchange barrier AFTER the signature projection: the mh_i
        # columns are fold expressions over the shingle array, and
        # CollapseProject would otherwise inline them into the
        # band-explode projection — re-evaluating every signature
        # once per band row (~5x the operator's cost, measured
        # 17.8s → 4.4s at sf0.1). The shuffle moves only the narrow
        # (id, 16×int) rows; band keys compute on materialized values.
        sig = minhash_signatures(df, text_col, id_col, num_hashes, n).repartition(
            F.col(id_col)
        )
        return band_buckets(
            sig, id_col, num_hashes, bands, id_out=f"id_{side}", mh_prefix=f"{side}_"
        )

    # materialize both bucket tables once (narrow: id + k ints + band
    # key, `bands` rows per doc). Leaving them lazy puts the whole
    # two-sided signature computation inside ONE join plan, which the
    # planner executes ~2.5x slower than the decomposed jobs
    # (measured 14s vs 5.6s at sf0.1) — same localCheckpoint
    # discipline as the hot-shingle set and the pagerank edge list.
    nb = buckets(new_docs.where(F.col(text_col).isNotNull()), "n").transform(pin_eager)
    rb = buckets(ref_docs.where(F.col(text_col).isNotNull()), "r").transform(pin_eager)
    agree = sum(
        (F.col(f"n_mh_{i}") == F.col(f"r_mh_{i}")).cast("int") for i in range(num_hashes)
    )
    matched = (
        nb.join(rb, on=["band", "key"])
        .select("id_n", (agree / F.lit(float(num_hashes))).alias("est"))
        .where(F.col("est") >= threshold)
        .select(F.col("id_n").alias(id_col))
        .dropDuplicates()
    )
    # No broadcast hint here: ``matched`` holds one row per matched NEW
    # doc, i.e. it is proportional to the ingest batch and unbounded at
    # 100 TB — a forced broadcast would blow the 8 GB broadcast ceiling
    # exactly when the operator matters most. AQE broadcasts it at
    # runtime whenever it measures small; otherwise the planner's
    # shuffle anti-join is the correct fallback.
    return new_docs.where(F.col(text_col).isNotNull()).join(
        matched, on=id_col, how="left_anti"
    )


def jaccard_prefix_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via prefix filtering (the
    PPJoin/AllPairs family — Bayardo et al. WWW'07, Xiao et al.
    WWW'08) — same output contract as ``ngram_jaccard_pairs`` with
    ``max_df=None`` but WITHOUT posting-list caps and WITHOUT the
    full inverted-index self-join: (id_a, id_b, jaccard) with
    id_a < id_b and jaccard ≥ threshold, no false negatives.

    Why it scales where the plain inverted index doesn't: a shingle
    with document frequency f contributes f² candidate rows to the
    naive self-join. Prefix filtering orders every doc's shingle set
    by GLOBAL document frequency ascending (rarest first, shingle
    string as tiebreak) and joins only short per-doc PREFIXES of that
    order: any qualifying pair must share a prefix shingle under a
    common total order, and hot boilerplate shingles sort LAST, so
    they almost never enter a prefix — the f² blowup is confined to
    rare shingles, where f is small by definition. Prefix lengths are
    asymmetric (AllPairs probe-prefix): the smaller record of a pair
    probes with ``n - ceil(2τ/(1+τ)·n) + 1`` shingles, the larger
    indexes ``n - ceil(τ·n) + 1``; the size filter (|B| ≤ |A|/τ,
    epsilon-slack so float rounding can only ADD candidates) prunes
    cross-length pairs before verification.

    Shape: shingle explode → df-count join → per-doc rank window
    (partitioned by doc — bounded rows per partition) → prefix
    equi-join → distinct candidate pairs → exact verify with one
    ``array_intersect`` against per-doc collected shingle sets.
    Verification is O(|candidates| · avg_set) map-side work; every
    shuffle is an equi-join or a doc-keyed aggregate. No caps means
    the result is the EXACT pair set — this is the 100 TB exact
    verifier, while ``minhash_lsh_pairs`` remains the probabilistic
    fast path.
    """
    from pyspark.sql import Window

    eps = 1e-9
    # the exploded shingle table feeds THREE consumers (df counts, the
    # rank window, the verify sets) — materialize it once instead of
    # re-running the explode per consumer (same discipline as the
    # banded signature tables). Spread first: the explode multiplies
    # each row ~len-fold, so scan splits of a small input leave the
    # whole shingle materialization on one core; spread_small is a
    # no-op (no shuffle, no coalesce) once the scan already exceeds
    # defaultParallelism splits.
    sh = spread_small(df).select(
        F.col(id_col).alias("id"), F.explode(_word_shingles(F.col(text_col), n)).alias("s")
    ).transform(pin_eager)
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    # pin the ranked table: BOTH prefix sides (probe + index) filter
    # it, and without the pin the whole df-count join + rank window
    # subtree is duplicated per side in the physical plan (verified in
    # the r15 plan dump — two Window+Exchange chains over the same
    # rows). Shingle-scale intermediate, the same class as the ``sh``
    # pin above.
    ranked = (
        sh.join(dfreq, "s")
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("id").orderBy("__df", "s")),
        )
        .join(sizes, "id")
        .transform(pin_lazy)
    )
    # asymmetric prefixes (AllPairs probe-prefix refinement): order the
    # pair by (size, id) so the PROBE side is always the smaller record.
    # For a qualifying pair with n_a ≤ n_b, overlap t ≥
    # ceil(2τ/(1+τ)·n_a) and t ≥ ceil(τ·n_b), so the probe prefix
    # shrinks to n_a - ⌈2τ/(1+τ)·n_a⌉ + 1 (≈18% of the set at τ=0.7
    # vs 30% for the symmetric form) while the index side keeps the
    # standard τ-prefix. floor(x - eps) in place of ceil(x) - 1 only
    # ever LENGTHENS a prefix under float rounding — candidates can be
    # added, never lost.
    c_probe = 2.0 * threshold / (1.0 + threshold)
    probe_len = (
        F.col("n_sh") - F.floor(F.lit(c_probe) * F.col("n_sh") - F.lit(eps)).cast("int") + F.lit(1)
    )
    index_len = (
        F.col("n_sh") - F.floor(F.lit(threshold) * F.col("n_sh") - F.lit(eps)).cast("int") + F.lit(1)
    )
    probe = ranked.where(F.col("rk") <= probe_len).select("id", "s", "n_sh")
    index = ranked.where(F.col("rk") <= index_len).select("id", "s", "n_sh")
    a = probe.select(F.col("id").alias("p_id"), F.col("s"), F.col("n_sh").alias("n_p"))
    b = index.select(F.col("id").alias("i_id"), F.col("s"), F.col("n_sh").alias("n_i"))
    cands = (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            # strict (size, id) order: probe side is the smaller record
            & (
                (F.col("a.n_p") < F.col("b.n_i"))
                | ((F.col("a.n_p") == F.col("b.n_i")) & (F.col("a.p_id") < F.col("b.i_id")))
            )
            # size filter: J ≥ τ forces n_i ≤ n_p/τ
            & (F.col("b.n_i") <= F.col("a.n_p") / F.lit(threshold) + F.lit(eps)),
        )
        .select(
            F.least("p_id", "i_id").alias("id_a"),
            F.greatest("p_id", "i_id").alias("id_b"),
        )
        .distinct()
    )
    # pinned for the same reason as ``ranked``: sa and sb are two
    # reads of this aggregate, which the plan otherwise computes twice
    ssets = sh.groupBy("id").agg(
        F.collect_set("s").alias("sset"), F.count(F.lit(1)).alias("n_sh")
    ).transform(pin_lazy)
    sa = ssets.select(F.col("id").alias("id_a"), F.col("sset").alias("set_a"), F.col("n_sh").alias("n_a"))
    sb = ssets.select(F.col("id").alias("id_b"), F.col("sset").alias("set_b"), F.col("n_sh").alias("n_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / (F.col("n_a") + F.col("n_b") - inter), ROUND_N).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def cross_source_dup_matrix(
    docs: DataFrame,
    pairs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Which feed copies from which: near/exact-dup PAIRS aggregated
    into a source×source matrix — ``(source_a, source_b, n_pairs,
    n_docs_a, n_docs_b)`` with the pair ordered so source_a <=
    source_b (one row per unordered source pair). Diagonal rows =
    within-feed duplication; off-diagonal = syndication between feeds —
    the matrix that tells a curator which upstream to dedup at the
    source. Composes on any pair generator (LSH bands, shingle
    postings, exact digests), so cost is O(|pairs|) + two id-keyed
    joins against the narrow (id, source) projection; the groupBy key
    space is |sources|² — dashboard-sized.
    """
    s = docs.select(F.col(id_col), F.col(group_col))
    a = s.select(F.col(id_col).alias("id_a"), F.col(group_col).alias("sa"))
    b = s.select(F.col(id_col).alias("id_b"), F.col(group_col).alias("sb"))
    tagged = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            F.when(F.col("sa") <= F.col("sb"), F.col("id_a")).otherwise(F.col("id_b")).alias("da"),
            F.when(F.col("sa") <= F.col("sb"), F.col("id_b")).otherwise(F.col("id_a")).alias("db"),
        )
    )
    return tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.count_distinct("da").cast("bigint").alias("n_docs_a"),
        F.count_distinct("db").cast("bigint").alias("n_docs_b"),
    )


def containment_prefix_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT shingle-CONTAINMENT threshold join: pairs where
    C(A→B) = |A∩B| / |A| ≥ threshold — the asymmetric dedup relation
    Jaccard misses: a short document quoted wholesale inside a long
    one has tiny Jaccard but containment ≈ 1. Output: (id_a, id_b,
    containment) where id_a is the CONTAINED side; both directions of
    a pair can appear (A⊂B and B⊂A both hold for near-equal sets).

    Same prefix-filter machinery as ``jaccard_prefix_join`` (rarest-
    first global shingle order), with containment's bounds: overlap
    t ≥ ceil(τ·|A|) depends only on the contained side, so the probe
    prefix is |A| - ceil(τ·|A|) + 1 and the INDEX side must index
    every shingle (any superset B qualifies regardless of |B| — no
    size filter, no index prefix; that asymmetry is inherent to
    containment). The verify is one ``array_intersect`` against the
    collected shingle sets. Hot shingles still stay out of probe
    prefixes, which is where the f² blowup lived."""
    from pyspark.sql import Window

    eps = 1e-9
    # four consumers of the exploded shingles (df counts, rank window,
    # index side, verify sets) — materialize once; spread first so the
    # len-fold explode doesn't run on the scan's few splits (no-op at
    # scale — spread_small never coalesces or adds a shuffle when the
    # scan already has enough splits)
    sh = spread_small(df).select(
        F.col(id_col).alias("id"), F.explode(_word_shingles(F.col(text_col), n)).alias("s")
    ).transform(pin_eager)
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    ranked = (
        sh.join(dfreq, "s")
        .withColumn(
            "rk", F.row_number().over(Window.partitionBy("id").orderBy("__df", "s"))
        )
        .join(sizes, "id")
    )
    probe_len = (
        F.col("n_sh") - F.floor(F.lit(threshold) * F.col("n_sh") - F.lit(eps)).cast("int") + F.lit(1)
    )
    probe = ranked.where(F.col("rk") <= probe_len).select(
        F.col("id").alias("id_a"), "s"
    )
    index = sh.select(F.col("id").alias("id_b"), "s")
    cands = (
        probe.join(index, ["s"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # pinned: sa and sb are two reads of this aggregate, which the
    # plan otherwise computes twice (the jaccard_prefix_join fix)
    ssets = sh.groupBy("id").agg(
        F.collect_set("s").alias("sset"), F.count(F.lit(1)).alias("n_sh")
    ).transform(pin_lazy)
    sa = ssets.select(F.col("id").alias("id_a"), F.col("sset").alias("set_a"), F.col("n_sh").alias("n_a"))
    sb = ssets.select(F.col("id").alias("id_b"), F.col("sset").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / F.col("n_a"), ROUND_N).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-cluster) dedup — SemDeDup lineage (Abbas et al.
# 2023): KMeans cells confine the cosine pair join, exactly as IVF
# confines the ANN probe.
# ---------------------------------------------------------------------------


SEMANTIC_SUB_SALT = 7  # md5 slot seed for cell-cap sub-bucketing


def semantic_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
    threshold: float = 0.9,
    dist_round: int = 6,
    cell_cap: int | None = None,
) -> DataFrame:
    """Semantic near-dup candidate pairs: deterministic KMeans
    clustering (``clustering.kmeans_fit_centers``, md5-seeded init,
    9dp-rounded trajectory, ``dist_round``-rounded distances) followed
    by an INTRA-CLUSTER cosine pair join at ``threshold``. Output:
    (id_a, id_b, cluster_id, cosine) with id_a < id_b.

    This is the SemDeDup move: the O(n²) cosine join runs per cell, so
    at 100 TB the pair cost is Σ|cell|² instead of n² — the same
    confinement IVF gives the ANN search, here applied to dedup.
    Trade: cross-cell near-dups are missed (pairs straddling a KMeans
    boundary); SemDeDup accepts this because embedding near-dups
    cluster tightly relative to cell granularity.

    ``cell_cap`` is the skew guard: Σ|cell|² only helps if no single
    cell degenerates toward n (one dense region + md5-seeded init can
    do that), so any cell whose population exceeds ``cell_cap`` is
    sub-bucketed into ``ceil(|cell| / cell_cap)`` md5-salted slices
    and pairs are generated within (cell, slice). Expected slice size
    is ≈ ``cell_cap`` regardless of how skewed the cells are, so the
    per-task pair cost is bounded by ~``cell_cap``²/2 everywhere.
    Pairs straddling a slice boundary are missed — the SAME contract
    as the cross-cell misses already accepted above, now also
    guaranteed under skew. Sub-bucketing is md5-deterministic
    (``md5_slot32(id, 7) % n_sub``), so the oracle SQL replays it
    bit-for-bit. ``None`` disables the guard (exact intra-cell join).

    Engine-deterministic end to end (seeded init + rounded distances +
    rounded per-iteration centroid means + rounded cosines) — the whole
    composition, KMeans included, is replayed by an unrolled SQL oracle
    and hash-checked, unusual for a clustering-based operator.
    """
    from safedata_pipeline_spark.functions.vector import cosine as _cos
    from safedata_pipeline_spark.functions.vector import norm as _norm
    from safedata_pipeline_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit_centers,
    )

    centers, _ = kmeans_fit_centers(
        emb, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col,
        dist_round=dist_round,
    )
    v = F.col(vec_col).cast("array<double>")
    base = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"), v.alias("v"), _norm(v).alias("nrm")
    )
    assign = kmeans_assign(
        emb, centers, id_col=id_col, vec_col=vec_col, dist_round=dist_round
    ).select(F.col(id_col).alias("id"), "cluster_id")
    # cells are narrow (id, cluster) rows; the join keys the pair
    # explosion strictly by cluster_id (and, under cell_cap, the
    # md5 sub-bucket)
    e = base.join(assign, "id")
    key = (F.col("a.cluster_id") == F.col("b.cluster_id")) & (
        F.col("a.id") < F.col("b.id")
    )
    if cell_cap is not None:
        if cell_cap < 1:
            raise ValueError("cell_cap must be >= 1")
        sizes = assign.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("__cn"))
        n_sub = F.ceil(F.col("__cn") / F.lit(float(cell_cap))).cast("bigint")
        # sizes is O(k) rows — broadcast; the slice id is a pure
        # md5 expression so both engines reproduce it
        e = e.join(F.broadcast(sizes), "cluster_id").select(
            "id",
            "v",
            "nrm",
            "cluster_id",
            (_hash_slot(F.col("id").cast("string"), SEMANTIC_SUB_SALT) % n_sub).alias(
                "__sub"
            ),
        )
        key = key & (F.col("a.__sub") == F.col("b.__sub"))
    e = e.transform(pin_lazy)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, on=key)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.cluster_id").alias("cluster_id"),
            F.round(
                _cos(F.col("a.v"), F.col("b.v"), F.col("a.nrm"), F.col("b.nrm")), ROUND_N
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
    threshold: float = 0.9,
    cell_cap: int | None = None,
) -> DataFrame:
    """Full semantic-dedup composition: ``semantic_pairs`` →
    ``dedup_components`` keep/drop labels. Output: (id, comp_id,
    is_canonical) — keep the canonical row per semantic cluster."""
    pairs = semantic_pairs(
        emb, id_col=id_col, vec_col=vec_col, k=k, iterations=iterations,
        threshold=threshold, cell_cap=cell_cap,
    )
    ids = emb.where(F.col(vec_col).isNotNull()).select(F.col(id_col))
    return dedup_components(ids, pairs, id_col=id_col)


def corpus_overlap(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level n-gram overlap audit between two corpora: ONE row
    ``(n_shingles_a, n_shingles_b, n_common, containment_a_in_b,
    containment_b_in_a, jaccard)`` over the DISTINCT shingle sets.

    The "are these two crawl snapshots basically the same data?"
    screen — run it before paying for a full cross-corpus near-dup
    join: high containment of A in B means ingesting A adds little.
    Also the corpus-level contamination number (eval-suite shingles vs
    training corpus) when ``a`` is small.

    Scale shape: each side collapses to its distinct-shingle DIGEST
    set (md5 — raw text never shuffles), the intersection is one
    equi-join on the digest, and the output is O(1) scalars. Cost is
    the two distinct-shuffles the audit needs anyway; no pair
    explosion anywhere.
    """
    def digests(df: DataFrame) -> DataFrame:
        return (
            df.where(F.col(text_col).isNotNull())
            .select(F.explode(_word_shingles(F.col(text_col), n)).alias("s"))
            .select(F.md5(F.col("s").cast("binary")).alias("h"))
            .distinct()
        )

    da, db = digests(a), digests(b)
    na = da.agg(F.count(F.lit(1)).cast("bigint").alias("n_shingles_a"))
    nb = db.agg(F.count(F.lit(1)).cast("bigint").alias("n_shingles_b"))
    nc = da.join(db, "h").agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    return (
        na.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_shingles_a",
            "n_shingles_b",
            "n_common",
            F.round(F.col("n_common") / F.nullif(F.col("n_shingles_a"), F.lit(0)), ROUND_N)
            .alias("containment_a_in_b"),
            F.round(F.col("n_common") / F.nullif(F.col("n_shingles_b"), F.lit(0)), ROUND_N)
            .alias("containment_b_in_a"),
            F.round(
                F.col("n_common")
                / F.nullif(
                    F.col("n_shingles_a") + F.col("n_shingles_b") - F.col("n_common"),
                    F.lit(0),
                ),
                ROUND_N,
            ).alias("jaccard"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints — the MOSS local fingerprinting
    algorithm (Schleimer, Wilkerson & Aiken, SIGMOD 2003; public).
    Hash every word ``k``-gram, slide a window of ``w`` consecutive
    hashes, and select each window's MINIMUM hash (ties → rightmost
    position). Output: distinct ``(id, pos, fingerprint)``.

    The winnowing guarantee: two documents sharing any word run of at
    least ``w + k − 1`` words share at least one fingerprint, while
    only ~``2/(w+1)`` of all k-gram hashes are kept — the
    position-aware, guaranteed-recall alternative to MinHash for
    substring-level matching (MinHash bounds whole-set resemblance,
    not local overlaps).

    Plan shape: one token explode (pos, md5-derived 32-bit hash) and
    ONE doc-keyed window pass — the rightmost-minimum is a single
    ``max(struct(−h, pos))`` aggregate over a ``[CURRENT, w−1
    FOLLOWING]`` frame, so no self-join and no second shuffle; the
    trailing DISTINCT collapses cross-window duplicates on the same partitioning.
    Docs with fewer than ``w`` k-grams winnow their single truncated
    window (one fingerprint), matching the oracle. md5 hashing keeps
    every fingerprint engine-reproducible (functions/hashing.py
    contract)."""
    from pyspark.sql import Window

    from safedata_pipeline_spark.operators.text import _ws_tokens

    # k-gram md5 explode is ~len-fold map work: spread a few-split
    # fixture scan (no-op at scale; md5/integer outputs only)
    tk = spread_small(df).select(
        F.col(id_col), _ws_tokens(F.lower(F.col(text_col))).alias("__tk")
    ).select(
        F.col(id_col),
        F.col("__tk"),
        (F.size("__tk") - (k - 1)).cast("int").alias("m"),
    )
    grams = tk.where(F.col("m") >= 1).select(
        F.col(id_col),
        F.col("m"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("m")),
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.array_join(F.slice("__tk", i, F.lit(k)), " ").cast(
                                "binary"
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint"),
            )
        ).alias("p0", "h"),
    ).select(id_col, "m", (F.col("p0") + 1).alias("pos"), "h")
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    best = F.max(F.struct((-F.col("h")).alias("nh"), F.col("pos").alias("p"))).over(
        frame
    )
    starts = grams.select(
        F.col(id_col), "m", "pos", best.alias("b")
    ).where(F.col("pos") <= F.greatest(F.col("m") - (w - 1), F.lit(1)))
    return starts.select(
        F.col(id_col),
        F.col("b.p").alias("pos"),
        (-F.col("b.nh")).alias("fingerprint"),
    ).dropDuplicates()


def winnowing_overlap_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 50,
) -> DataFrame:
    """Substring-overlap candidate pairs via shared winnowing
    fingerprints — the MOSS pair generator: documents sharing at least
    ``min_shared`` DISTINCT fingerprints are candidates, and the
    winnowing guarantee makes recall structural (any shared run of
    ≥ w+k−1 words contributes a shared fingerprint — this join finds
    quote/boilerplate overlap that whole-set MinHash dilutes away on
    long documents).

    Plan shape is the banded-LSH discipline: per-doc DISTINCT
    fingerprints form the posting table, ``max_df`` drops stop
    fingerprints (ubiquitous boilerplate would otherwise quadratically
    explode the hottest posting lists — same trade as
    ``ngram_jaccard_pairs``' df cap, documented miss class), and the
    pair stream is a fingerprint-keyed equi-join + one (a, b) count.
    No all-pairs join exists at any stage. Output:
    ``(id_a, id_b, n_shared)``."""
    fp = winnowing_fingerprints(df, text_col, id_col, k, w).select(
        F.col(id_col).alias("id"), "fingerprint"
    ).dropDuplicates()
    if max_df is not None:
        ok = (
            fp.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_df)
            .select("fingerprint")
        )
        fp = fp.join(ok, "fingerprint", "left_semi")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )

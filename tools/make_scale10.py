"""Synthesize the local "sf1-equivalent" fixture for the SECOND scale
decade (VERDICT r9 #5): ~10x documents / embeddings / customer derived
deterministically from the driver-shipped sf0.1 tables, written to
$SAFEDATA_SCALE10_DIR (default /root/repo/.scale10). The driver only
ships up to sf0.1; this tile-based synthesis lets the slope gates
measure sf0.1 -> sf1-equivalent for the pair-join families, the decade
where super-linearity would actually show.

The construction is PAIR-DENSITY-PRESERVING — the one property a
scaling fixture for pair generators must have. Naive row duplication
grows every near-dup group 10x and the true pair count 100x, which
would make even a perfectly linear operator measure quadratic. Tiling
instead:

* documents — tile t maps every whitespace token w -> "t{t}x" + w
  (injective per tile, disjoint ACROSS tiles): within a tile the
  token-set/shingle/window structure is isomorphic to the original, so
  intra-tile pairs replicate the original pair set exactly; cross-tile
  token sets are disjoint, so no new pairs form. Total pairs scale
  linearly (x10) with rows (x10). Tile 0 keeps the original text.
* embeddings — tile t applies a deterministic per-dimension Rademacher
  sign mask s_t (md5-derived; s_0 = identity). cos(s_t*x, s_t*y) =
  cos(x, y) exactly (s_i^2 = 1), so intra-tile cosine structure is
  bit-preserved; cross-tile cosines are sign-scrambled dot products
  concentrating near 0 with std ~ d^(-1/2) (≈0.125 at d=64). A small
  tail therefore leaks past low pairing thresholds — unavoidable for
  ANY orthogonal decorrelation without growing the dimension — so
  embedding pair counts scale linearly PLUS a bounded cross-tile tail
  (tests pin exact intra-tile replication and bound the leakage); the
  slope gates measure wall-clock, where the tail is noise.
* customer — keys offset per tile; c_name keeps the ORIGINAL 9-digit
  key but gets a doubled tile marker spliced into the constant prefix
  ("Cust{t}{t}omer#%09d"): within a tile the name neighborhood
  structure is isomorphic to the original (the prefix is constant), and
  any cross-tile name pair differs in >= 2 positions — above the
  Ed-Join fixture's max_dist=1, so no cross-tile pairs form. (The
  first cut used name = f(key + tile*1e9), whose names differ from
  their 9 siblings by ONE digit: 6.4k cross-tile distance-1 pairs and
  a 35x wall slope — a fixture artifact, not an operator one.)

Ids offset by tile * 10^9 so every id stays unique and md5-based
salts/splits redistribute freely. Output is plain parquet, one file
per table; regeneration is idempotent (same bytes modulo parquet
encoding nondeterminism — content is row-identical).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ID_OFF = 10**9
TILES = 10


def _sign_mask(tile: int, dim: int) -> list[int]:
    """Deterministic Rademacher mask for one tile (tile 0 = identity)."""
    if tile == 0:
        return [1] * dim
    return [
        1 if hashlib.md5(f"{tile}:{i}".encode()).digest()[0] & 1 else -1
        for i in range(dim)
    ]


def build(spark, src_dir: str, out_dir: str, tiles: int = TILES) -> None:
    os.makedirs(out_dir, exist_ok=True)

    docs = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(src_dir, "embeddings.parquet"))
    cust = spark.read.parquet(os.path.join(src_dir, "customer.parquet"))
    dim = len(emb.select("embedding").first()[0])

    doc_tiles = []
    for t in range(tiles):
        if t == 0:
            d = docs
        else:
            pfx = F.lit(f"t{t}x")
            retok = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "), lambda w: F.concat(pfx, w)
                ),
                " ",
            )
            new_text = F.when(F.length("text") > 0, retok).otherwise(F.col("text"))
            d = docs.select(
                (F.col("doc_id") + t * ID_OFF).alias("doc_id"),
                new_text.alias("text"),
                "lang",
                "source",
                F.length(new_text).cast(docs.schema["n_chars"].dataType).alias("n_chars"),
            )
        doc_tiles.append(d.select(*[f.name for f in docs.schema.fields]))
    from functools import reduce

    all_docs = reduce(lambda a, b: a.unionByName(b), doc_tiles)
    all_docs.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )

    emb_tiles = []
    for t in range(tiles):
        mask = _sign_mask(t, dim)
        if t == 0:
            e = emb
        else:
            marr = F.array(*[F.lit(float(s)) for s in mask])
            e = emb.select(
                (F.col("vec_id") + t * ID_OFF).alias("vec_id"),
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    marr,
                    lambda x, s: (x * s).cast(
                        emb.schema["embedding"].dataType.elementType.simpleString()
                    ),
                ).cast(emb.schema["embedding"].dataType).alias("embedding"),
                *[f.name for f in emb.schema.fields if f.name not in ("vec_id", "embedding")],
            )
        emb_tiles.append(e.select(*[f.name for f in emb.schema.fields]))
    all_emb = reduce(lambda a, b: a.unionByName(b), emb_tiles)
    all_emb.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
    )

    cust_tiles = []
    for t in range(tiles):
        if t == 0:
            c = cust
        else:
            newkey = F.col("c_custkey") + t * ID_OFF
            c = cust.select(
                newkey.alias("c_custkey"),
                F.format_string(
                    f"Cust{t}{t}omer#%09d", F.col("c_custkey")
                ).alias("c_name"),
                *[f.name for f in cust.schema.fields if f.name not in ("c_custkey", "c_name")],
            )
        cust_tiles.append(c.select(*[f.name for f in cust.schema.fields]))
    all_cust = reduce(lambda a, b: a.unionByName(b), cust_tiles)
    all_cust.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out_dir, "customer.parquet")
    )


def main() -> None:
    from safedata_pipeline_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SAFEDATA_SCALE10_DIR", "/root/repo/.scale10"
    )
    spark = get_spark("make-scale10")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, out)
    for t in ("documents", "embeddings", "customer"):
        n = spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

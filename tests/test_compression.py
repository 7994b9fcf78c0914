import math

from safedata_pipeline_spark.operators import compression as CMP


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _h6(counts):
    """The engine's disciplined entropy: 6dp-rounded lns, exact term
    sums, floor-snapped finish (within ~1e-6 of the theoretical H)."""
    n = sum(counts)
    s = sum(c * round(math.log(c), 6) for c in counts)
    return math.floor((n * round(math.log(n), 6) - s) / n / CMP.LN2 * 1e6 + 0.5) / 1e6


def test_entropy_known_values(spark):
    out = {
        r.doc_id: r
        for r in CMP.compression_entropy(
            _docs(
                spark,
                [
                    (1, "aaaaaaaa"),          # one symbol -> 0 bits
                    (2, "abababab"),          # two equiprobable -> ~1 bit
                    (3, "abcdabcd"),          # four equiprobable -> ~2 bits
                    (4, ""),                  # empty doc keeps its row
                ],
            )
        ).collect()
    }
    assert out[1].entropy_bits_per_byte == 0.0
    assert out[2].entropy_bits_per_byte == _h6([4, 4])
    assert abs(out[2].entropy_bits_per_byte - 1.0) < 1e-5
    assert out[3].entropy_bits_per_byte == _h6([2, 2, 2, 2])
    assert abs(out[3].entropy_bits_per_byte - 2.0) < 1e-5
    assert (out[4].n_bytes, out[4].n_distinct_bytes) == (0, 0)
    assert out[4].entropy_bits_per_byte == 0.0 and out[4].ideal_ratio == 0.0
    assert (out[2].n_bytes, out[2].n_distinct_bytes) == (8, 2)


def test_entropy_skewed_matches_formula(spark):
    # 6x'a' + 2x'b': H = -(3/4)log2(3/4) - (1/4)log2(1/4), via the
    # engine's 6dp-ln + floor-snap discipline
    txt = "aaaaaabb"
    n = 8
    s = 6 * round(math.log(6), 6) + 2 * round(math.log(2), 6)
    h = math.floor((n * round(math.log(n), 6) - s) / n / CMP.LN2 * 1e6 + 0.5) / 1e6
    got = CMP.compression_entropy(_docs(spark, [(1, txt)])).collect()[0]
    assert got.entropy_bits_per_byte == h


def test_zlib_detects_repetition_beyond_entropy(spark):
    # 'ab'*500 has 1 bit/byte of order-0 entropy (ideal_ratio 0.125)
    # but deflate's LZ77 window collapses the repeats far below that —
    # the signal the entropy bound cannot carry
    rep = "ab" * 500
    ent = CMP.compression_entropy(_docs(spark, [(1, rep)])).collect()[0]
    zl = CMP.zlib_signal(_docs(spark, [(1, rep)])).collect()[0]
    assert abs(ent.ideal_ratio - 0.125) < 1e-5
    assert zl.zlib_ratio < 0.05 < ent.ideal_ratio
    assert zl.n_bytes == 1000


def test_zlib_deterministic_and_ordered(spark):
    import zlib as _z

    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 20),
        (2, "".join(chr(33 + (i * 7919) % 90) for i in range(900))),  # noisy
        (3, ""),
    ]
    a = {r.doc_id: r for r in CMP.zlib_signal(_docs(spark, rows)).collect()}
    b = {r.doc_id: r for r in CMP.zlib_signal(_docs(spark, rows)).collect()}
    assert {k: (v.zlib_len, v.zlib_ratio) for k, v in a.items()} == {
        k: (v.zlib_len, v.zlib_ratio) for k, v in b.items()
    }
    # matches the stdlib reference exactly
    assert a[1].zlib_len == len(_z.compress(rows[0][1].encode(), 6))
    # repetitive prose compresses below pseudo-random symbol soup
    assert a[1].zlib_ratio < a[2].zlib_ratio
    assert a[3].zlib_len == 0 and a[3].zlib_ratio == 0.0

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


def test_entropy_counts_true_utf8_bytes(spark):
    # 'éé' is 4 UTF-8 bytes (C3 A9 C3 A9): 2 distinct byte values each
    # appearing twice -> exactly the 'abab' distribution, NOT the
    # 1-symbol/0-bit result a per-CHARACTER count would give. This pins
    # the ADVICE r9 fix: entropy is over bytes, consistent with
    # zlib_signal's n_bytes.
    out = {
        r.doc_id: r
        for r in CMP.compression_entropy(
            _docs(spark, [(1, "éé"), (2, "héllo")])
        ).collect()
    }
    assert (out[1].n_bytes, out[1].n_distinct_bytes) == (4, 2)
    assert out[1].entropy_bits_per_byte == _h6([2, 2])
    # 'héllo' = 68 C3 A9 6C 6C 6F: 6 bytes, 5 distinct, counts [1,1,1,2,1]
    assert (out[2].n_bytes, out[2].n_distinct_bytes) == (6, 5)
    assert out[2].entropy_bits_per_byte == _h6([1, 1, 1, 2, 1])
    # and n_bytes now agrees with the zlib side on multilingual text
    zl = CMP.zlib_signal(_docs(spark, [(1, "éé")])).collect()[0]
    assert zl.n_bytes == out[1].n_bytes == 4


def test_zlib_custom_id_column_name_and_type(spark):
    # ADVICE r9: the output id column keeps the caller's name and type
    df = spark.createDataFrame(
        [("d-1", "hello world"), ("d-2", "")], "uid string, body string"
    )
    out = {r.uid: r for r in CMP.zlib_signal(df, "body", "uid").collect()}
    assert set(out) == {"d-1", "d-2"}
    assert out["d-1"].n_bytes == 11 and out["d-2"].zlib_ratio == 0.0


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

"""Vendored baseline JPEG codec (jpeg_codec.py, VERDICT r12 #1).

Behavior parity target: the flat-quality-100 content class of
/root/reference has no JPEG path at all (the reference is a pandas
app); this codec exists so the engine's multimodal JPEG plumbing
EXECUTES in Pillow-less containers. Spec: ITU-T T.81 baseline.
"""

import struct

import numpy as np
import pytest

from safedata_pipeline_spark.operators import jpeg_codec as J


def test_flat_gray_roundtrip_exact():
    """The hash-channel class: flat 8×8-aligned grayscale at quality
    100 round-trips bit-exactly (DC-only DCT, all-ones quantizer)."""
    for g in (0, 1, 7, 128, 200, 254, 255):
        px = bytes([g]) * (16 * 24)
        payload = J.jpeg_encode_gray(px, 16, quality=100)
        assert payload.startswith(b"\xff\xd8\xff") and payload.endswith(b"\xff\xd9")
        out, w, h = J.jpeg_decode(payload)
        assert (w, h) == (16, 24)
        assert out == px, g


def test_general_content_q100_within_one():
    """Arbitrary content at quality 100: FDCT+IDCT float rounding is
    bounded by ±1/sample (why only the flat class rides the hash)."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(24, 32), dtype=np.uint8)
    out, w, h = J.jpeg_decode(J.jpeg_encode_gray(img.tobytes(), 32, quality=100))
    arr = np.frombuffer(out, dtype=np.uint8).reshape(h, w)
    assert (w, h) == (32, 24)
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 1


def test_non_multiple_of_8_dimensions():
    """Edge-replication padding (A.2.1): encoded dims are the true
    dims; decode crops back; flat content stays exact even unaligned
    (replicated edges are the same value)."""
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(13, 21), dtype=np.uint8)
    out, w, h = J.jpeg_decode(J.jpeg_encode_gray(img.tobytes(), 21, quality=90))
    assert (w, h) == (21, 13) and len(out) == 13 * 21
    flat = bytes([77]) * (11 * 9)
    out2, w2, h2 = J.jpeg_decode(J.jpeg_encode_gray(flat, 9, quality=100))
    assert (w2, h2) == (9, 11) and out2 == flat


def test_restart_intervals_roundtrip():
    """DRI/RSTn: any restart interval decodes to the same pixels (DC
    predictors reset per segment on both sides)."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, size=(32, 40), dtype=np.uint8)  # 20 blocks
    base = J.jpeg_decode(J.jpeg_encode_gray(img.tobytes(), 40, quality=100))[0]
    for ri in (1, 3, 7, 20, 25):
        p = J.jpeg_encode_gray(img.tobytes(), 40, quality=100, restart_interval=ri)
        assert J.jpeg_decode(p)[0] == base, ri


def test_sixteen_bit_dqt():
    """Pq=1 (16-bit quantizer entries) parses: patch an 8-bit DQT
    segment into its 16-bit form; decode is unchanged."""
    px = bytes([200]) * (16 * 16)
    p = J.jpeg_encode_gray(px, 16, quality=100)
    i = p.index(b"\xff\xdb")
    (seglen,) = struct.unpack(">H", p[i + 2 : i + 4])
    tid, tbl = p[i + 4], p[i + 5 : i + 5 + 64]
    seg16 = (
        b"\xff\xdb"
        + struct.pack(">H", 2 + 1 + 128)
        + bytes([0x10 | (tid & 0x0F)])
        + b"".join(struct.pack(">H", b) for b in tbl)
    )
    p2 = p[:i] + seg16 + p[i + 2 + seglen :]
    out, w, h = J.jpeg_decode(p2)
    assert out == px


def test_rgb_444_roundtrip_close():
    """3-component 4:4:4 color: round-trip within the BT.601 color
    transform's rounding (±3/sample at quality 100)."""
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    out, w, h = J.jpeg_decode(J.jpeg_encode_rgb(rgb.tobytes(), 16, quality=100))
    arr = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
    assert (w, h) == (16, 16)
    assert np.abs(arr.astype(int) - rgb.astype(int)).max() <= 3


def test_subsampled_420_flat_color_decode():
    """4:2:0 MCU geometry: hand-assemble a 2×2-sampled 3-component
    stream (one MCU = 4 Y + 1 Cb + 1 Cr blocks) for a flat color and
    check the decoder reproduces the inverse-transformed constant."""
    y0, cb0, cr0 = 120, 100, 160
    dc_tab = J._huff_encode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac_tab = J._huff_encode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    w = J._BitWriter()
    preds = {0: 0, 1: 0, 2: 0}

    def put_block(ci, val):
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = 8 * (val - 128)
        preds[ci] = J._encode_block(zz, preds[ci], dc_tab, ac_tab, w)

    # 16×16 image, 4:2:0 → one MCU: Y blocks (2×2 raster), then Cb, Cr
    for _ in range(4):
        put_block(0, y0)
    put_block(1, cb0)
    put_block(2, cr0)
    w.flush()
    qt = J.scaled_quant_table(J.QUANT_LUMA, 100)
    sof = struct.pack(">BHHB", 8, 16, 16, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    payload = (
        b"\xff\xd8"
        + J._dqt_segment(0, qt)
        + J._marker(0xC0, sof)
        + J._dht_segment(0, 0, J.DC_LUMA_BITS, J.DC_LUMA_VALS)
        + J._dht_segment(1, 0, J.AC_LUMA_BITS, J.AC_LUMA_VALS)
        + J._marker(0xDA, sos)
        + bytes(w.buf)
        + b"\xff\xd9"
    )
    out, width, height = J.jpeg_decode(payload)
    assert (width, height) == (16, 16)
    arr = np.frombuffer(out, dtype=np.uint8).reshape(16, 16, 3)
    # expected inverse BT.601 of the flat (y, cb, cr)
    r = round(y0 + 1.402 * (cr0 - 128))
    g = round(y0 - 0.344136 * (cb0 - 128) - 0.714136 * (cr0 - 128))
    b = round(y0 + 1.772 * (cb0 - 128))
    exp = np.clip([r, g, b], 0, 255)
    assert (arr.reshape(-1, 3) == exp).all()


def test_low_quality_decodes_and_compresses():
    """Lower quality: smaller payload, still decodes to the right
    shape; flat content survives any quality (DC = q·round(DC/q) only
    loses when quantizer > |DC|... flat g=128 has DC 0, always exact)."""
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(32, 32), dtype=np.uint8)
    p100 = J.jpeg_encode_gray(img.tobytes(), 32, quality=100)
    p10 = J.jpeg_encode_gray(img.tobytes(), 32, quality=10)
    assert len(p10) < len(p100)
    out, w, h = J.jpeg_decode(p10)
    assert (w, h) == (32, 32) and len(out) == 1024
    flat = bytes([128]) * 256
    assert J.jpeg_decode(J.jpeg_encode_gray(flat, 16, quality=10))[0] == flat


def test_unsupported_features_raise_by_name():
    px = bytes([50]) * 64
    p = bytearray(J.jpeg_encode_gray(px, 8))
    i = p.index(b"\xff\xc0")
    p[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        J.jpeg_decode(bytes(p))
    p[i + 1] = 0xC0
    p[i + 4] = 12  # precision byte
    with pytest.raises(ValueError, match="precision"):
        J.jpeg_decode(bytes(p))
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x89PNG")
    with pytest.raises(ValueError, match="truncated"):
        J.jpeg_decode(J.jpeg_encode_gray(px, 8)[:40])


def test_encode_input_validation():
    with pytest.raises(ValueError, match="multiple of width"):
        J.jpeg_encode_gray(b"abc", 2)
    with pytest.raises(ValueError, match="multiple of width"):
        J.jpeg_encode_gray(b"", 8)
    with pytest.raises(ValueError, match="quality"):
        J.jpeg_encode_gray(bytes(64), 8, quality=0)
    with pytest.raises(ValueError, match="3\\*width"):
        J.jpeg_encode_rgb(bytes(64), 8)


def test_pillow_interop_both_directions():
    """With Pillow present: libjpeg decodes the vendored encoder's
    stream and the vendored decoder reads libjpeg's — bit-exact on the
    flat class. Skips (only) where Pillow is absent; the vendored
    round-trip above runs everywhere."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    flat = bytes([200]) * (16 * 16)
    arr = np.asarray(Image.open(io.BytesIO(J.jpeg_encode_gray(flat, 16))))
    assert arr.shape == (16, 16) and set(arr.flatten()) == {200}
    img = Image.new("L", (16, 16), color=73)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=100, subsampling=0)
    out, w, h = J.jpeg_decode(buf.getvalue())
    assert (w, h) == (16, 16) and set(out) == {73}


def test_property_roundtrip_arbitrary_content_and_dims():
    """Hypothesis property: ANY 8-bit grayscale content at any
    (width, height) round-trips within ±1/sample at quality 100, and
    FLAT content round-trips exactly — across aligned and unaligned
    dims, all-extreme values, and restart intervals."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        ri=st.sampled_from([0, 1, 3]),
    )
    def check(w, h, seed, ri):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
        out, dw, dh = J.jpeg_decode(
            J.jpeg_encode_gray(img.tobytes(), w, quality=100, restart_interval=ri)
        )
        assert (dw, dh) == (w, h)
        arr = np.frombuffer(out, dtype=np.uint8).reshape(h, w)
        assert np.abs(arr.astype(int) - img.astype(int)).max() <= 1

    check()


def test_property_flat_exact_all_values_and_dims():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(g=st.integers(0, 255), w=st.integers(1, 33), h=st.integers(1, 33))
    def check(g, w, h):
        px = bytes([g]) * (w * h)
        out, dw, dh = J.jpeg_decode(J.jpeg_encode_gray(px, w, quality=100))
        assert (dw, dh, out) == (w, h, px)

    check()


def test_appn_and_comment_segments_skipped():
    """APPn/COM segments (EXIF blobs may contain 0xFF bytes) are
    length-skipped, not parsed: inject an APP1 with embedded FF bytes
    and a COM after SOI; decode is unchanged."""
    px = bytes(range(64))
    p = J.jpeg_encode_gray(px, 8, quality=100)
    base = J.jpeg_decode(p)
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + 10) + b"Exif\x00\x00\xff\xd9\xff\x00"
    com = b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hi\xffzz"
    p2 = p[:2] + app1 + com + p[2:]
    assert J.jpeg_decode(p2) == base


def test_bitwriter_flush_pads_all_ones():
    """T.81 F.1.2.3/B.1.1.5 (ADVICE r13): the final partial byte is
    completed with ALL-ONE bits, no surplus bit. The nbits==1 case is
    the regression: a 1 pending bit + 7 one-pads = 0xFF (then byte
    stuffing), where the old 9-nbits-of-0x7F pad emitted 0xBF."""
    for pending, nbits, want in [
        (1, 1, b"\xff\x00"),  # 1 + 1111111 = 0xFF -> stuffed
        (0, 1, b"\x7f"),  # 0 + 1111111
        (0b10, 2, b"\xbf"),  # 10 + 111111
        (0b101, 3, b"\xbf"),  # 101 + 11111
        (0b0000000, 7, b"\x01"),  # 0000000 + 1
    ]:
        w = J._BitWriter()
        w.put(pending, nbits)
        w.flush()
        assert bytes(w.buf) == want, (pending, nbits)
        assert w.nbits == 0


def test_flush_fix_roundtrip_unchanged():
    """The conformance pad must not disturb decode: re-run the flat
    round-trip class (whose streams end in every possible nbits
    phase as g and the dimensions vary)."""
    for g in (0, 3, 17, 255):
        for h in (8, 16, 24):
            px = bytes([g]) * (8 * h)
            out, w, hh = J.jpeg_decode(J.jpeg_encode_gray(px, 8, quality=100))
            assert (w, hh) == (8, h) and out == px

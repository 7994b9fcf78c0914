"""Multimodal (image/audio/video) column plumbing (SURVEY §2.8
extension surface).

Media payloads are opaque ``binary`` columns + a typed metadata struct;
all Spark-side plumbing (schemas, batch iteration, partitioning,
output shapes) is real and tested. Codec tiers:
  * ``decode="real"`` (default) — Pillow when importable (any format),
    else the vendored codecs: a minimal stdlib PNG decoder (8-bit
    gray/RGB/±alpha, non-interlaced; public PNG spec) and a baseline
    JPEG codec (``jpeg_codec``; T.81 baseline sequential, Annex K
    tables) so BOTH real paths execute in containers without Pillow.
    The default since r9 (PNG) / r13 (JPEG): each decoder is
    oracle-certified (decode∘encode == identity on its exact class,
    hash-checked), so nothing justifies shipping placeholder values.
  * ``decode="fake"`` — identity 'codec' (the payload bytes ARE the
    1×N image); a unit-test hook exercising every stage around the
    codec with no image container at all. Audio/video codecs
    (ffmpeg/torchvision) remain out of scope for this container.

Why mapInPandas: codecs are per-record Python/C work on big blobs —
exactly the case where Arrow-batched pandas iteration beats both
row-at-a-time UDFs (batch amortization) and JVM expressions (no JVM
codec). Batches stream; no partition is materialized whole.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal record schema: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_sec", DoubleType(), True),
    ]
)

# decoded-CONTENT features: the pixel digest is computed on the
# decoded sample buffer, not the container bytes, so the same image
# re-encoded (different zlib level, different container) keeps the
# same fingerprint — content-addressed image dedup. Payload-level
# n_bytes/sha256 live in ``media_meta`` (the JVM-side pass).
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("pixel_sha256", StringType(), True),
        StructField("mean_pixel", DoubleType(), True),
        StructField("n_samples", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap an arbitrary binary column as the canonical media table."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("double").alias("duration_sec"),
    )


def media_meta(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass over payload bytes (no decode): size +
    content digest. This is the part that must never need Python."""
    return df.select(
        "media_id",
        "mime",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def _fake_decode(payload: bytes) -> tuple[bytes, int, int]:
    """Identity 'codec' (unit-test hook): the payload bytes are the
    decoded 1×N sample buffer. Exercises every stage around the codec
    without needing an image container."""
    return (payload, len(payload), 1)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# samples per pixel for PNG color types 0/2/4/6 (palette type 3 needs
# the PLTE chunk — out of scope for the minimal decoder)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_decode_pixels(payload: bytes) -> tuple[bytes, int, int]:
    """Minimal stdlib PNG decoder (public spec, RFC 2083): 8-bit
    gray/RGB/gray+alpha/RGBA, non-interlaced. Parses IHDR, inflates the
    IDAT stream, reverses the per-scanline filters (None/Sub/Up/
    Average/Paeth), and returns the EXACT decoded sample buffer
    ``(pixels, width, height)`` in row-major sample order — the
    byte-exact contract that lets image stats AND the content digest
    ride the hash-checked oracle channel (same discipline as the audio
    frame sums, X158)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, idat = len(_PNG_MAGIC), []
    width = height = channels = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth} color={color} interlace={interlace})")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    prev = bytearray(stride)
    out = bytearray()
    for row in range(height):
        off = row * (stride + 1)
        ftype, line = raw[off], bytearray(raw[off + 1 : off + 1 + stride])
        if ftype > 4:
            raise ValueError(f"invalid PNG scanline filter type {ftype}")
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0  # left
            b = prev[i]  # up
            c = prev[i - channels] if i >= channels else 0  # up-left
            if ftype == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out += line
        prev = line
    return (bytes(out), width, height)


def _png_decode_sums(payload: bytes) -> tuple[int, int, int, int]:
    """EXACT integer totals ``(sample_sum, n_samples, width, height)``
    from the decoded buffer — the hash-channel contract
    ``image_pixel_stats`` aggregates on."""
    px, width, height = _png_decode_pixels(payload)
    return (sum(px), len(px), width, height)


def _png_decode(payload: bytes) -> tuple[float, int]:
    """(mean sample value, total samples), derived from the exact
    sums."""
    total, n, _, _ = _png_decode_sums(payload)
    return (total / n if n else 0.0, n)


_JPEG_MAGIC = b"\xff\xd8\xff"


def _real_decode(payload: bytes) -> tuple[bytes, int, int]:
    """Genuine image decode: Pillow when importable (any format it
    knows), else the vendored codecs — the stdlib PNG decoder for PNG
    magic and the baseline JPEG decoder (``jpeg_codec.jpeg_decode``,
    spec-conformant T.81 baseline: Huffman + dequant + IDCT, restart
    markers, subsampling) for FF D8 magic. Same output contract as
    ``_fake_decode``: (decoded sample buffer, width, height).

    VERDICT r12 #1 closed the last dependency stub: the JPEG path now
    EXECUTES everywhere — Pillow or not — and the flat quality-100
    class ``encode_jpeg_media`` plants decodes bit-exactly under both
    decoders, so the oracle channel is codec-independent. Progressive/
    arithmetic/12-bit streams raise ``ValueError`` naming the feature
    (honest scope, not a silent wrong answer)."""
    try:
        import io

        import numpy as np
        from PIL import Image  # type: ignore[import-not-found]

        arr = np.asarray(Image.open(io.BytesIO(payload)))
        h, w = (arr.shape + (1, 1))[:2]
        return (arr.astype(np.uint8).tobytes(), int(w), int(h))
    except ImportError:
        if payload.startswith(_JPEG_MAGIC):
            from safedata_pipeline_spark.operators.jpeg_codec import jpeg_decode

            return jpeg_decode(payload)
        return _png_decode_pixels(payload)


def png_encode_gray(pixels: bytes, width: int) -> bytes:
    """Encode raw 8-bit grayscale pixels as a REAL, spec-conformant
    PNG (RFC 2083: IHDR + one zlib IDAT of filter-0 scanlines + IEND,
    CRCs included). ``len(pixels)`` must be a multiple of ``width``.
    Any standards-compliant viewer opens the result; round-tripping
    through ``_png_decode_sums`` recovers the pixel bytes exactly."""
    import struct
    import zlib

    if width <= 0 or len(pixels) % width:
        raise ValueError("pixel buffer must be a positive multiple of width")
    height = len(pixels) // width

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # 8-bit gray
    raw = b"".join(
        b"\x00" + pixels[r * width : (r + 1) * width] for r in range(height)
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_png_media(
    df: DataFrame, id_col: str, bytes_col: str, width: int = 64
) -> DataFrame:
    """Build a real-PNG media table from a binary column: each row's
    first ``width·⌊len/width⌋`` bytes become a width-wide grayscale
    image (rows shorter than one scanline are dropped). Arrow-batched
    — the codec is the one genuinely Python step; everything around
    it stays in the JVM."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None:
                    continue
                b = bytes(b)
                n = (len(b) // width) * width
                if n == 0:
                    continue
                ids.append(mid)
                payloads.append(png_encode_gray(b[:n], width))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(id_col, bytes_col).mapInPandas(
        batches, "media_id long, payload binary"
    )


def encode_jpeg_media(
    df: DataFrame, id_col: str, bytes_col: str, width: int = 16
) -> DataFrame:
    """Build a REAL-JPEG media table whose decode is ORACLE-REPLAYABLE
    (VERDICT r10 #9 / r11 #5 — the JPEG anchor for the X183
    discipline): per row a FLAT grayscale image of value
    ``g = first byte`` and size ``width × 8·(1 + len(bytes) mod 3)``,
    encoded by Pillow at quality 100 with subsampling off.

    Why flat: a uniform 8×8 block has a DC-only DCT; at quality 100
    every quantizer step is 1, so the DC survives exactly and the
    IDCT reconstructs the constant bit-for-bit — the one JPEG content
    class where decode∘encode is the IDENTITY (general content picks
    up ±1 IDCT rounding, which would break the hash channel). Both
    dimensions are multiples of 8, so no edge-replication blocks
    exist. A SQL oracle therefore predicts the decoded stats from the
    SOURCE bytes alone: pixel value = ord(first char), n_pixels =
    width·height — while the engine really runs the codec both ways.

    Encoder: Pillow (libjpeg) when importable — the second-codec
    cross-check — else the vendored baseline encoder
    (``jpeg_codec.jpeg_encode_gray``, standard Annex K tables). Both
    produce genuine baseline JFIF streams whose flat-class decode is
    bit-exact, so the oracle prediction is encoder-independent."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            from PIL import Image as PILImage  # type: ignore[import-not-found]

            def enc(g: int, h: int) -> bytes:
                img = PILImage.new("L", (width, h), color=g)
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=100, subsampling=0)
                return buf.getvalue()

        except ImportError:
            from safedata_pipeline_spark.operators.jpeg_codec import (
                jpeg_encode_gray,
            )

            def enc(g: int, h: int) -> bytes:
                return jpeg_encode_gray(bytes([g]) * (width * h), width, 100)

        for pdf in it:
            ids, payloads = [], []
            for mid, b in zip(pdf[id_col], pdf[bytes_col]):
                if b is None or len(b) == 0:
                    continue
                b = bytes(b)
                g, h = b[0], 8 * (1 + len(b) % 3)
                ids.append(mid)
                payloads.append(enc(g, h))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return df.select(id_col, bytes_col).mapInPandas(
        batches, "media_id long, payload binary"
    )


IMAGE_PIXEL_STATS_SCHEMA = (
    "media_id long, width int, height int, n_pixels int, "
    "pixel_sum bigint, mean_pixel double"
)


def image_pixel_stats(df: DataFrame) -> DataFrame:
    """Decode real image payloads and emit INTEGER-EXACT pixel
    statistics: (media_id, width, height, n_pixels, pixel_sum,
    mean_pixel). PNG payloads take the stdlib decoder's streaming-sum
    path (IDAT inflate + scanline unfilter — no Pillow needed); any
    other magic (the JPEG second-codec path) goes through
    ``_real_decode`` (Pillow when importable, else the vendored
    baseline JPEG decoder). Because the sums
    are integers and the mean uses the engine-stable floor-snap
    (``floor(x·1e6 + 0.5)/1e6``), the whole decode is hash-checkable
    against a SQL oracle computing the same stats from the source
    bytes — decode∘encode must be the identity (PNG: any content;
    JPEG: the flat-block class ``encode_jpeg_media`` plants)."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                b = bytes(b)
                if b.startswith(_PNG_MAGIC):
                    total, n, w, h = _png_decode_sums(b)
                else:
                    px, w, h = _real_decode(b)
                    n = len(px)
                    total = sum(px)
                mean = math.floor(total / n * 1e6 + 0.5) / 1e6 if n else 0.0
                rows.append((mid, w, h, n, total, mean))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_pixels", "pixel_sum", "mean_pixel",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, IMAGE_PIXEL_STATS_SCHEMA
    )


def extract_image_features(df: DataFrame, decode: str = "real") -> DataFrame:
    """Decoded-content feature extraction over media payloads via
    Arrow-batched ``mapInPandas``: per media row the decoded sample
    buffer's sha256 (content-addressed fingerprint — survives
    re-encoding, the image analogue of text's content_md5), its
    integer-exact mean sample value (floor-snapped to 6dp, the shared
    hash-channel discipline), the sample count, and the decoded
    dimensions.

    ``decode='real'`` (default) runs a genuine decoder — Pillow if
    installed, else the built-in spec-conformant PNG path whose
    decode∘encode identity is oracle-certified; ``decode='fake'`` is
    the identity codec (payload bytes = the 1×N image), a unit-test
    hook keeping the plumbing testable with no image container.
    NULL/empty payloads keep their row with NULL fingerprint and
    0 samples (the metadata join stays total)."""
    import math

    if decode not in ("fake", "real"):
        raise ValueError("decode must be 'fake' or 'real'")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        decoder = _real_decode if decode == "real" else _fake_decode
        for pdf in it:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    rows.append((mid, None, 0.0, 0, None, None))
                    continue
                px, w, h = decoder(bytes(b))
                n = len(px)
                mean = math.floor(sum(px) / n * 1e6 + 0.5) / 1e6 if n else 0.0
                rows.append((mid, hashlib.sha256(px).hexdigest(), mean, n, w, h))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "pixel_sha256", "mean_pixel", "n_samples", "width", "height",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: cut each payload into fixed-size
    chunks JVM-side (the real operator would emit decoded video frames;
    the partitioning/explode shape is identical). Output one row per
    chunk: (media_id, frame_no, frame_bytes)."""
    n = F.ceil(F.octet_length("payload") / F.lit(every_n_bytes)).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
        lambda i: F.substring(F.col("payload"), (i * every_n_bytes + 1).cast("int"), every_n_bytes),
    )
    return (
        df.where(F.octet_length("payload") > 0)
        .select("media_id", F.posexplode(frames).alias("frame_no", "frame_bytes"))
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, frame_idx int, n_samples int, rms double, zcr double, peak int"
)


def extract_audio_features(df: DataFrame, frame_samples: int = 256) -> DataFrame:
    """Audio-modality feature extraction: the payload is RAW PCM
    (16-bit little-endian mono — the decode needs no external codec,
    so unlike the image path nothing is stubbed), framed into
    ``frame_samples``-sample windows with per-frame RMS, zero-crossing
    rate and absolute peak — the waveform-level screens an audio
    curation pipeline keys on (silence/clipping detection, energy
    profiles).

    One Arrow ``mapInPandas`` pass (vectorized numpy per batch —
    the justified-Python codec contract shared with the image path);
    output explodes one row per (media, frame), the shape a
    downstream VAD/filter joins on. A trailing partial frame is kept
    (n_samples < frame_samples tells the consumer). NULL/odd-length
    tails truncate to whole samples; empty payloads yield no rows —
    map-only either way, scan-bound at any scale."""
    if frame_samples < 1:
        raise ValueError("need frame_samples >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in it:
            ids, fidx, ns, rms, zcr, peak = [], [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                raw = bytes(b)
                x = np.frombuffer(raw[: (len(raw) // 2) * 2], dtype="<i2").astype(np.int64)
                if x.size == 0:
                    continue
                for f in range(0, x.size, frame_samples):
                    w = x[f : f + frame_samples]
                    n = int(w.size)
                    ids.append(mid)
                    fidx.append(f // frame_samples)
                    ns.append(n)
                    # INTEGER sum of squares / flip count → the float
                    # finish (one divide + sqrt, then round) is
                    # bit-reproducible in any engine — same discipline
                    # as the DECIMAL-sum aggregates
                    s2 = int((w * w).sum())
                    rms.append(round(math.sqrt(s2 / n), 6))
                    if n < 2:
                        zcr.append(0.0)
                    else:
                        flips = int(np.sum(np.sign(w[1:]) * np.sign(w[:-1]) < 0))
                        zcr.append(round(flips / (n - 1), 6))
                    peak.append(int(np.max(np.abs(w))))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": fidx, "n_samples": ns,
                 "rms": rms, "zcr": zcr, "peak": peak}
            )

    return df.select("media_id", "payload").mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


IMAGE_DHASH_SCHEMA = "media_id long, height int, w0 bigint, w1 bigint"


def image_dhash(df: DataFrame, grid_rows: int = 8, grid_cols: int = 8) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint of decoded
    images — the standard public near-dup screen for image corpora
    (Krawetz's aHash/dHash family): downsample the grayscale image to
    a ``grid_rows × (grid_cols+1)`` block grid, take one bit per
    horizontally-adjacent block pair (left mean > right mean), pack
    the ``grid_rows × grid_cols`` bits into two sign-safe 32-bit words
    ``(w0, w1)``.

    INTEGER-EXACT and hash-checkable: blocks are integer pixel sums
    over the floor-division grid ``rb = r·grid_rows // h``,
    ``cb = c·(grid_cols+1) // w``, and each mean comparison is the
    exact cross-multiplication ``s_l·cnt_r > s_r·cnt_l`` — no float
    touches the hash, so a SQL oracle replays the whole construction
    from the ORIGINAL bytes (decode∘encode is the identity, the X183
    discipline). Images shorter than ``grid_rows`` scanlines or
    narrower than ``grid_cols+1`` pixels are dropped (no 8×9 grid
    exists). Two 32-bit words instead of one 64-bit hash keep the top
    gradient bit out of the BIGINT sign bit on every engine.

    100 TB shape: map-only Arrow pass (one numpy scatter-add per
    image), output is 3 ints per image — the join work happens in
    ``dhash_pairs`` on band keys, never on pixels."""
    import numpy as np

    gr, gc = grid_rows, grid_cols
    # Each packed word must hold its half-grid's bits below bit 32 —
    # the sign-safe invariant dhash_pairs' 4x16-bit band math (and the
    # SQL oracle's // 65536 extraction) depends on. Mirror the
    # frames <= 32 validation in audio_energy_fingerprint (ADVICE
    # r11: grid_cols=16 would set bit 63 into the BIGINT sign bit).
    if (gr - gr // 2) * gc > 32 or (gr // 2) * gc > 32:
        raise ValueError(
            "dhash grid packs (grid_rows - grid_rows//2) * grid_cols "
            "bits per 32-bit word; got %dx%d (> 32 bits/word)" % (gr, gc)
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                px, w, h = _real_decode(bytes(b))
                if h < gr or w < gc + 1:
                    continue
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                arr = arr[: h * w].reshape(h, w)
                rb = (np.arange(h) * gr) // h
                cb = (np.arange(w) * (gc + 1)) // w
                sums = np.zeros((gr, gc + 1), dtype=np.int64)
                cnts = np.zeros((gr, gc + 1), dtype=np.int64)
                np.add.at(sums, (rb[:, None], cb[None, :]), arr)
                ones = np.ones_like(arr)
                np.add.at(cnts, (rb[:, None], cb[None, :]), ones)
                w0 = w1 = 0
                for r in range(gr):
                    for c in range(gc):
                        bit = int(sums[r, c]) * int(cnts[r, c + 1]) > int(
                            sums[r, c + 1]
                        ) * int(cnts[r, c])
                        if bit:
                            if r < gr // 2:
                                w0 |= 1 << (r * gc + c)
                            else:
                                w1 |= 1 << ((r - gr // 2) * gc + c)
                rows.append((mid, h, w0, w1))
            yield pd.DataFrame(rows, columns=["media_id", "height", "w0", "w1"])

    return df.select("media_id", "payload").mapInPandas(batches, IMAGE_DHASH_SCHEMA)


def _collapsed_banded_pairs(
    fingerprints: DataFrame,
    fp_cols: list[str],
    band_keys,
    ham_expr,
    max_hamming: int,
) -> DataFrame:
    """Shared engine for fingerprint band-join pair generators
    (dhash_pairs, audio_fingerprint_pairs): collapse IDENTICAL
    fingerprints to one representative row + sorted member-id list
    BEFORE the band self-join (VERDICT r11 #4b — a million flat
    images / silent clips would otherwise put m rows in one band
    bucket and pay m² candidate generation, xor verifies, and the
    (id_a, id_b) dropDuplicates shuffle; collapsed, they cost ONE
    group row through the join).

      * within-group pairs (hamming 0) expand IN-ROW from the sorted
        member array — no join, no verify, no dedup (each unordered
        pair appears exactly once);
      * cross-group candidates are DISTINCT GROUP pairs (deduped on
        the two fingerprints — g² band rows for g distinct
        fingerprints, not m² member rows), verified once per group
        pair, then expanded to member pairs with least/greatest
        ordering.

    The member expansion is the output contract itself (enumerating
    all pairs is inherently |pairs|-sized); what the collapse removes
    is every per-MEMBER-pair join/verify/dedup cost. ``band_keys``:
    fn(prefix) → list of band-key Columns; ``ham_expr``: fn() → exact
    Hamming Column over prefixed a./b. fingerprint columns."""
    g = fingerprints.groupBy(*fp_cols).agg(
        F.sort_array(F.collect_list("media_id")).alias("ids")
    )
    n = F.size("ids")
    # in-row unordered pair expansion over the sorted member array:
    # for i < j emit (ids[i], ids[j]) — ascending, so id_a < id_b
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    within = (
        g.where(n >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.lit(0).cast("bigint").alias("hamming"),
        )
    )
    bands = g.select(
        *fp_cols, "ids", F.explode(F.array(*band_keys(""))).alias("bk")
    )
    a, b = bands.alias("a"), bands.alias("b")
    # order GROUPS by fingerprint struct so each unordered group pair
    # appears once per shared band; dedup on the fingerprint pair
    # (4 ints), never on member pairs
    astruct = F.struct(*[F.col(f"a.{c}") for c in fp_cols])
    bstruct = F.struct(*[F.col(f"b.{c}") for c in fp_cols])
    cand = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (astruct < bstruct))
        .select(
            *[F.col(f"a.{c}").alias(f"a_{c}") for c in fp_cols],
            *[F.col(f"b.{c}").alias(f"b_{c}") for c in fp_cols],
            F.col("a.ids").alias("ids_a"),
            F.col("b.ids").alias("ids_b"),
            ham_expr().cast("bigint").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates([f"a_{c}" for c in fp_cols] + [f"b_{c}" for c in fp_cols])
    )
    cross = (
        cand.select(
            F.explode("ids_a").alias("x"), F.col("ids_b"), F.col("hamming")
        )
        .select(
            "x", F.explode("ids_b").alias("y"), "hamming"
        )
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            "hamming",
        )
    )
    return within.unionByName(cross)


def dhash_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs from dHash words: pigeonhole-banded
    candidate join (4 bands of 16 bits — a pair within Hamming
    ``max_hamming`` ≤ 3 must share at least one band VERBATIM, so the
    banding is complete, the simhash_pairs argument), then the exact
    Hamming verify via xor + bit_count on the two words. Output:
    (id_a, id_b, hamming), id_a < id_b.

    100 TB shape: identical fingerprints collapse to ONE group row
    before the band self-join (``_collapsed_banded_pairs`` — the
    all-zero dHash of flat images is the canonical hot band; a
    million of them cost one row through the join instead of 10¹²
    candidate pairs), the only join is an equi-join on the band key
    over DISTINCT fingerprints (AQE splits residual hot bands), and
    per-candidate work is two xors once per fingerprint pair.
    Nothing touches pixels."""
    if not 0 <= max_hamming <= 3:
        raise ValueError("banding is complete only for max_hamming <= 3")
    h = hashes.select("media_id", "w0", "w1")

    def band_keys(p):
        return [
            F.lit(0 * 65536) + F.shiftrightunsigned(f"{p}w0", 16),
            F.lit(1 * 65536) + (F.col(f"{p}w0") % 65536 + F.lit(65536)) % 65536,
            F.lit(2 * 65536) + F.shiftrightunsigned(f"{p}w1", 16),
            F.lit(3 * 65536) + (F.col(f"{p}w1") % 65536 + F.lit(65536)) % 65536,
        ]

    def ham():
        return F.bit_count(
            F.col("a.w0").bitwiseXOR(F.col("b.w0"))
        ) + F.bit_count(F.col("a.w1").bitwiseXOR(F.col("b.w1")))

    return _collapsed_banded_pairs(h, ["w0", "w1"], band_keys, ham, max_hamming)


AUDIO_FP_SCHEMA = "media_id long, n_samples int, fp bigint"


def audio_energy_fingerprint(df: DataFrame, frames: int = 32) -> DataFrame:
    """Energy-delta audio fingerprint — the waveform-level analogue of
    the Chromaprint/Shazam family's sign-of-delta bits, restricted to
    what is INTEGER-EXACT and therefore hash-checkable: split the PCM
    stream into ``frames+1`` floor-division frames
    (``fb = sidx·(frames+1) // n``, the X212 grid mapping), take the
    integer energy sum Σx² per frame, one bit per adjacent frame pair
    via the exact cross-multiplication ``E_f·c_{f+1} > E_{f+1}·c_f``
    (mean-energy rising ⇒ 1), pack the ``frames`` bits into one
    sign-safe word (bit index ≤ 31 for the default 32).

    A pitch/level-insensitive duplicate screen: scaling the signal by
    a constant scales every frame energy by its square, preserving all
    comparisons — so re-leveled copies collide, which is the point of
    a perceptual dup key. Clips shorter than ``frames+1`` samples are
    dropped (no grid exists). Map-only Arrow pass; the pair join in
    ``audio_fingerprint_pairs`` touches only fingerprints.

    Bounds: |x| ≤ 32767 ⇒ x² < 2^31; frame sums and the
    cross-products stay far inside BIGINT for any clip below ~2^33
    samples per frame — beyond any real audio segment."""
    if not 1 <= frames <= 32:
        raise ValueError("frames must be in [1, 32] (sign-safe word)")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                raw = bytes(b)
                x = np.frombuffer(
                    raw[: (len(raw) // 2) * 2], dtype="<i2"
                ).astype(np.int64)
                n = int(x.size)
                if n < frames + 1:
                    continue
                fb = (np.arange(n) * (frames + 1)) // n
                e = np.zeros(frames + 1, dtype=np.int64)
                c = np.zeros(frames + 1, dtype=np.int64)
                np.add.at(e, fb, x * x)
                np.add.at(c, fb, 1)
                fp = 0
                for f in range(frames):
                    if int(e[f]) * int(c[f + 1]) > int(e[f + 1]) * int(c[f]):
                        fp |= 1 << f
                rows.append((mid, n, fp))
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "fp"])

    return df.select("media_id", "payload").mapInPandas(batches, AUDIO_FP_SCHEMA)


AUDIO_FP64_SCHEMA = "media_id long, n_samples int, w0 bigint, w1 bigint"


def audio_energy_fingerprint64(df: DataFrame, frames: int = 64) -> DataFrame:
    """The TWO-WORD energy-delta fingerprint (X214) — the corpus-size
    scale path of ``audio_energy_fingerprint``: same integer-exact
    construction (``frames+1`` floor-division frames, exact
    cross-multiplied energy comparisons) with up to 64 bits packed
    into two sign-safe 32-bit words ``(w0, w1)``, the X212 dHash word
    layout — so ``dhash_pairs``'s 4×16-bit pigeonhole banding (still
    complete for Hamming ≤ 3) is the pair generator.

    Why it exists: an LSH fingerprint must be sized to the corpus. At
    32 bits the hash space saturates around 10⁴–10⁵ clips — 8-bit
    band buckets then hold n/256 members and the candidate join goes
    quadratic on CHANCE collisions, not near-dups. 64 bits / 16-bit
    bands push that wall to ~10⁷ and cut chance Hamming-≤3 collisions
    by ~2³² — the dial a 100 TB corpus runs at (and what the decade-2
    slope gate measures for the audio family)."""
    if not 33 <= frames <= 64:
        raise ValueError(
            "frames must be in [33, 64] (two 32-bit words); use "
            "audio_energy_fingerprint for <= 32"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                raw = bytes(b)
                x = np.frombuffer(
                    raw[: (len(raw) // 2) * 2], dtype="<i2"
                ).astype(np.int64)
                n = int(x.size)
                if n < frames + 1:
                    continue
                fb = (np.arange(n) * (frames + 1)) // n
                e = np.zeros(frames + 1, dtype=np.int64)
                c = np.zeros(frames + 1, dtype=np.int64)
                np.add.at(e, fb, x * x)
                np.add.at(c, fb, 1)
                w0 = w1 = 0
                for f in range(frames):
                    if int(e[f]) * int(c[f + 1]) > int(e[f + 1]) * int(c[f]):
                        if f < 32:
                            w0 |= 1 << f
                        else:
                            w1 |= 1 << (f - 32)
                rows.append((mid, n, w0, w1))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "w0", "w1"]
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, AUDIO_FP64_SCHEMA
    )


def audio_fingerprint_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate audio pairs from energy fingerprints: 4 bands of
    8 bits (pigeonhole-COMPLETE for Hamming ≤ 3) generate candidates
    on a band-key equi-join; the exact Hamming verify is one
    xor + bit_count. Output: (id_a, id_b, hamming), id_a < id_b.

    100 TB shape: identical fingerprints (the all-zero word of silent
    clips is the canonical hot band) collapse to one group row before
    the band self-join — see ``_collapsed_banded_pairs``."""
    if not 0 <= max_hamming <= 3:
        raise ValueError("banding is complete only for max_hamming <= 3")
    h = fps.select("media_id", "fp")

    def band_keys(p):
        return [
            F.lit(i * 256) + F.shiftrightunsigned(f"{p}fp", 8 * i) % 256
            for i in range(4)
        ]

    def ham():
        return F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))

    return _collapsed_banded_pairs(h, ["fp"], band_keys, ham, max_hamming)

import hashlib

import pytest
from pyspark.sql import functions as F

from safedata_pipeline_spark.operators import multimodal as MM


def _media(spark):
    rows = [
        (1, b"\x00\x01\x02\x03" * 40),
        (2, b"\xff" * 10),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    return MM.to_media_table(df, "media_id", "payload", "image/fake")


def test_media_table_schema(spark):
    df = _media(spark)
    assert [f.name for f in df.schema.fields] == [
        "media_id", "payload", "mime", "width", "height", "duration_sec",
    ]


def test_media_meta_jvm_side(spark):
    got = {r.media_id: r for r in MM.media_meta(_media(spark)).collect()}
    assert got[1].n_bytes == 160
    assert got[2].sha256 == hashlib.sha256(b"\xff" * 10).hexdigest()
    assert got[3].n_bytes is None


def test_fake_decode_features(spark):
    got = {r.media_id: r for r in MM.extract_image_features(_media(spark)).collect()}
    assert got[2].mean_byte == 255.0
    assert got[1].feature_dim == 16
    assert got[3].feature_dim == 0 and got[3].sha256 is None
    assert got[1].sha256 == hashlib.sha256(b"\x00\x01\x02\x03" * 40).hexdigest()


def test_real_decode_is_stubbed(spark):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        MM.extract_image_features(_media(spark), decode="real").collect()


def test_sample_frames_chunking(spark):
    out = MM.sample_frames(_media(spark), every_n_bytes=64).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    assert len(by_id[1]) == 3  # 160 bytes / 64 → 3 chunks
    assert len(by_id[2]) == 1
    assert 3 not in by_id  # null payload dropped
    assert len(by_id[1][0].frame_bytes) == 64
    assert len(by_id[1][2].frame_bytes) == 32  # tail chunk

from safedata_pipeline_spark.sources import jsonl as JL


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "hello", 1.5), (2, 'quote " and\nnewline', None)],
        "id bigint, text string, score double",
    )
    path = str(tmp_path / "docs_jsonl")
    JL.write_jsonl(df, path)
    back = JL.read_jsonl(spark, path, schema="id bigint, text string, score double")
    assert sorted((r.id, r.text, r.score) for r in back.collect()) == sorted(
        (r.id, r.text, r.score) for r in df.collect()
    )


def test_jsonl_schema_skips_inference_and_captures_corrupt(spark, tmp_path):
    p = tmp_path / "raw.jsonl"
    p.write_text('{"id": 1, "text": "ok"}\nNOT-JSON\n{"id": 2, "text": "also ok"}\n')
    back = JL.read_jsonl(
        spark, str(p), schema="id bigint, text string, _corrupt_record string"
    )
    rows = back.collect()
    assert len(rows) == 3
    assert sum(r._corrupt_record is not None for r in rows) == 1

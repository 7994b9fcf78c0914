from safedata_pipeline_spark.sources.tables import load_table
from safedata_pipeline_spark.streaming import corpus as SC


def test_scored_stream_matches_batch(spark, sf_dir):
    batch = SC.scored_documents(load_table(spark, sf_dir, "documents"))
    expected = {r.doc_id: (r.n_ws_tokens, r.lang_guess, r.content_md5, r.quality)
                for r in batch.collect()}
    streamed = SC.run_scored_stream_once(
        spark, f"{sf_dir}/documents*.parquet", "t_scored_docs"
    )
    got = {r.doc_id: (r.n_ws_tokens, r.lang_guess, r.content_md5, r.quality)
           for r in streamed.collect()}
    assert got == expected and len(got) > 0


def test_scored_stream_threshold_filter(spark, sf_dir):
    streamed = SC.run_scored_stream_once(
        spark, f"{sf_dir}/documents*.parquet", "t_scored_docs_thr", min_quality=0.5
    )
    rows = streamed.collect()
    assert rows and all(r.quality >= 0.5 for r in rows)
    full = SC.run_scored_stream_once(
        spark, f"{sf_dir}/documents*.parquet", "t_scored_docs_full"
    )
    assert len(rows) < full.count()

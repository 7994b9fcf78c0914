from safedata_pipeline_spark.operators import compliance as C


def test_checklist_has_12_items(spark):
    assert C.default_checklist(spark).count() == 12


def test_checklist_schema_matches_reference_plus_regime(spark):
    # reference compliance.py:23 emits (key, description, status, notes)
    df = C.default_checklist(spark, notes={"pii_identified": "scanned 2026-08"})
    assert df.columns == ["key", "description", "regime", "status", "notes"]
    notes = {r.key: r.notes for r in df.collect()}
    assert notes["pii_identified"] == "scanned 2026-08"
    assert all(v == "" for k, v in notes.items() if k != "pii_identified")


def test_score_all_false(spark):
    row = C.checklist_score(C.default_checklist(spark)).collect()[0]
    assert (row.score, row.n_items, row.n_done) == (0.0, 12, 0)


def test_score_partial(spark):
    done = {"pii_identified", "privacy_techniques", "logging_enabled"}
    row = C.checklist_score(C.default_checklist(spark, done)).collect()[0]
    assert row.n_done == 3
    assert abs(row.score - 0.25) < 1e-9

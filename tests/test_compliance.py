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


def test_benford_screen_on_benford_and_uniform_data(spark):
    """2^n data follows Benford (small chi2); constant-leading-digit
    data does not (digit-1 row dominates)."""
    from safedata_pipeline_spark.operators.quality_rules import benford_screen

    benford = spark.createDataFrame([(float(2**n),) for n in range(1, 200)], "x double")
    rows = {r.digit: r for r in benford_screen(benford, "x").collect()}
    assert set(rows) == set(range(1, 10))
    assert sum(r.n for r in rows.values()) == 199
    assert sum(r.chi2_term for r in rows.values()) < 16.0  # 2^n is Benford-ish
    # frequencies sorted descending by digit 1..9 shape
    assert rows[1].observed_freq > rows[5].observed_freq > rows[9].observed_freq
    # zeros/negatives handled: -200 counts as digit 2, 0 dropped
    mixed = spark.createDataFrame([(0.0,), (-200.0,), (0.05,)], "x double")
    out = {r.digit: r.n for r in benford_screen(mixed, "x").collect()}
    assert out == {2: 1, 5: 1}

from safedata_pipeline_spark.operators import pii as PII


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "contact john.doe+x@example.co.uk or 555-123-4567 today"),
            (2, "ssn 123-45-6789 ip 10.0.0.1 card 4111111111111111"),
            (3, "clean document, nothing to see"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )


def test_pii_scan_counts(spark):
    got = {r.doc_id: r for r in PII.pii_scan(_docs(spark)).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1 and got[1].n_pii == 2
    assert got[2].n_ssn == 1 and got[2].n_ipv4 == 1 and got[2].n_card16 == 1
    assert got[2].n_pii == 3
    assert got[3].n_pii == 0 and got[4].n_pii == 0


def test_pii_redact_masks_all_types(spark):
    got = {r.doc_id: r.text for r in PII.pii_redact(_docs(spark)).collect()}
    assert got[1] == "contact [EMAIL] or [PHONE] today"
    assert "[SSN]" in got[2] and "[IPV4]" in got[2] and "[CARD16]" in got[2]
    assert "123-45-6789" not in got[2] and "4111111111111111" not in got[2]
    assert got[3] == "clean document, nothing to see"


def test_pii_redact_then_scan_is_clean(spark):
    redacted = PII.pii_redact(_docs(spark))
    again = {r.doc_id: r.n_pii for r in PII.pii_scan(redacted).collect()}
    assert all(v == 0 for v in again.values())

"""Temperature mixture flattening property + blocklist rule edges."""

from __future__ import annotations

from dataset_batch_processor_spark.operators import corpusstats, webquality


def test_temperature_flattens_the_mixture(spark, sf_dir):
    rows = corpusstats.QUERIES["corpus_temperature_mixture"](
        spark, sf_dir
    ).collect()
    raw = [r.token_ppm for r in rows]
    tmp = [r.temp_ppm for r in rows]
    assert max(tmp) - min(tmp) < max(raw) - min(raw)
    # shares normalize (integer floor leaves < n_sources ppm slack)
    assert 1_000_000 - len(rows) <= sum(tmp) <= 1_000_000
    # low-resource boost: the smallest source gains, the largest loses
    lo = min(rows, key=lambda r: r.token_ppm)
    hi = max(rows, key=lambda r: r.token_ppm)
    assert lo.boost_x1000 > 1000 > hi.boost_x1000


def test_blocklist_counts_and_flags(spark):
    df = spark.createDataFrame(
        [
            (1, "clean text only safe words"),
            (2, "one slow word"),
            (3, "slow big hash slow"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in webquality.blocklist_filter(df).collect()}
    assert rows[1].n_hits == 0 and not rows[1].flagged
    assert rows[2].n_hits == 1 and rows[2].flagged
    assert rows[3].n_hits == 4 and rows[3].flagged


def test_pii_column_audit_classifies_known_shapes(spark):
    from dataset_batch_processor_spark.operators import dataops

    df = spark.createDataFrame(
        [
            ("a@b.com", "12-345-678-9012", "order 1234567", "hello"),
            ("c@d.org", "98-765-432-1098", "ref 7654321", "world"),
        ],
        "em string, ph string, dg string, ok string",
    )
    rows = {
        r.column: r
        for r in dataops.pii_column_audit(
            df, ("em", "ph", "dg", "ok")
        ).collect()
    }
    assert rows["em"].pii_class == "email"
    assert rows["ph"].pii_class == "phone"
    assert rows["dg"].pii_class == "digits"
    assert rows["ok"].pii_class == "clean"
    assert all(r.n_rows == 2 for r in rows.values())
    # email addresses also contain no 5-digit runs; phone is not email
    assert rows["em"].phone_ppm == 0 and rows["ph"].email_ppm == 0


def test_pii_audit_priority_email_over_digits(spark):
    from dataset_batch_processor_spark.operators import dataops

    # values matching BOTH email and digit-run classify as email
    df = spark.createDataFrame(
        [("user12345@x.com",), ("abc98765@y.org",)], "v string"
    )
    r = dataops.pii_column_audit(df, ("v",)).collect()[0]
    assert r.email_ppm == 1_000_000 and r.digits_ppm == 1_000_000
    assert r.pii_class == "email"

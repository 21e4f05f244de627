"""PII scrub: match counts, redaction, class disjointness."""

from __future__ import annotations

from go_nonrat_annotation_pipeline_spark.operators import pii as P


def _scrub_one(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return P.pii_scrub(df).collect()[0]


def test_counts_and_redaction(spark):
    r = _scrub_one(
        spark,
        "mail bob.smith+x@corp-mail.example.org from 192.168.0.1 "
        "ssn 123-45-6789 call 555-867-5309 and 555-867-5310",
    )
    assert (r.n_email, r.n_ip, r.n_ssn, r.n_phone) == (1, 1, 1, 2)
    assert r.redacted == (
        "mail <EMAIL> from <IP> ssn <SSN> call <PHONE> and <PHONE>"
    )


def test_clean_text_untouched(spark):
    r = _scrub_one(spark, "the quick brown fox at noon")
    assert (r.n_email, r.n_ip, r.n_ssn, r.n_phone) == (0, 0, 0, 0)
    assert r.redacted == "the quick brown fox at noon"


def test_classes_are_format_disjoint(spark):
    # an SSN (3-2-4) must never count as a phone (3-3-4) and vice versa,
    # and dashed numbers must not trip the dotted-IP pattern
    r = _scrub_one(spark, "123-45-6789 555-123-4567")
    assert (r.n_ssn, r.n_phone, r.n_ip) == (1, 1, 0)
    assert r.redacted == "<SSN> <PHONE>"


def test_word_boundaries_guard_partial_numbers(spark):
    # embedded in longer digit runs → no \b boundary → no match
    r = _scrub_one(spark, "9123-45-67890 numbers 1555-123-45678")
    assert (r.n_ssn, r.n_phone) == (0, 0)


def test_flag_column(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("u@example.com",), ("no pii here",)], "text string"
    )
    rows = (
        P.pii_scrub(df)
        .select("text", P.pii_flag().alias("flag"))
        .orderBy(F.desc("flag"))
        .collect()
    )
    assert [r.flag for r in rows] == [1, 0]

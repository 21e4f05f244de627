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


def test_planted_pii_batch_matches_re_reference(spark):
    """200 pseudo-random docs with planted PII; Spark's counts must
    match an independent Python `re` count and the redacted text must
    contain no residual matches (one Spark pass, no per-example jobs)."""
    import re as _re

    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = []
    for i in range(200):
        toks = [words[(i * 7 + j) % len(words)] for j in range(i % 9 + 1)]
        if i % 3 == 0:
            toks.append(f"u{i}@host{i % 5}.net")
        if i % 4 == 1:
            toks.append(f"{i % 250}.{(i * 3) % 250}.7.{(i * 11) % 250}")
        if i % 5 == 2:
            toks.append(f"{100 + i % 900}-{10 + i % 90}-{1000 + i % 9000}")
        if i % 7 == 3:
            toks.append(f"{100 + i % 900}-{100 + i % 900}-{1000 + i % 9000}")
        rows.append((i, " ".join(toks)))

    df = spark.createDataFrame(rows, "i long, text string")
    got = {r.i: r for r in P.pii_scrub(df).collect()}
    pats = {n: _re.compile(p) for n, p, _ in P.DEFAULT_PATTERNS}
    for i, text in rows:
        r = got[i]
        # counts agree with the sequential-application reference: each
        # class counted on the text with earlier classes already redacted
        remaining = text
        for name, pat, repl in P.DEFAULT_PATTERNS:
            assert r[f"n_{name}"] == len(pats[name].findall(remaining)), (
                i,
                name,
                text,
            )
            remaining = pats[name].sub(repl, remaining)
        assert r.redacted == remaining, (i, text)
        for name, rx in pats.items():
            assert not rx.search(r.redacted), (i, name, r.redacted)

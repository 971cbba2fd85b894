"""PII detection/redaction (operators/pii.py): planted-corpus exactness,
DuckDB cross-engine pattern parity (the patterns are written in the
Java-regex ∩ RE2 subset precisely so both engines count identically),
Luhn precision, redaction completeness, and the zero-shuffle plan shape.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.pii import (
    PII_PATTERNS,
    detect_pii,
    luhn_valid_expr,
    pii_count_expr,
    redact_documents,
    redact_pii,
)

def _sql(pat: str) -> str:
    """DuckDB standard single-quoted literal: backslashes pass through
    verbatim (no escape processing), so the regex text is IDENTICAL to
    what Spark's F.lit ships — the whole point of the parity test."""
    return "'" + pat.replace("'", "''") + "'"


PLANTED = [
    (0, "contact jane.doe+spam@example.co.uk or bob@sub.domain.org today"),
    (1, "(555) 123-4567 and +1 555.987.6543 and 555-111-2222"),
    (2, "hosts 10.0.0.1 192.168.100.200 and 8.8.8.8"),
    (3, "ssn 123-45-6789 on file"),
    (4, "valid card 4532 0151 1283 0366; luhn-invalid 1234-5678-9012-3456"),
    (5, "clean text: number 42, date 2026-08-14, version 1.2"),
    (6, ""),
    (7, None),
]
# hand-derived truth: (n_card, n_ssn, n_phone, n_ipv4, n_email)
TRUTH = {
    0: (0, 0, 0, 0, 2),
    1: (0, 0, 3, 0, 0),
    2: (0, 0, 0, 3, 0),
    3: (0, 1, 0, 0, 0),
    4: (1, 0, 0, 0, 0),  # Luhn filters the fake; the regex saw both
    5: (0, 0, 0, 0, 0),
    6: (0, 0, 0, 0, 0),
    7: (0, 0, 0, 0, 0),
}


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(PLANTED, "doc_id long, text string")


def test_detect_pii_planted_exact(spark, planted):
    got = {
        r.doc_id: (r.n_card, r.n_ssn, r.n_phone, r.n_ipv4, r.n_email)
        for r in detect_pii(planted).collect()
    }
    assert got == TRUTH
    totals = {r.doc_id: r.n_pii_total for r in detect_pii(planted).collect()}
    assert totals == {d: sum(v) for d, v in TRUTH.items()}


def test_pattern_counts_match_duckdb(spark, planted):
    """Cross-engine parity on the raw REGEX counts (pre-Luhn): DuckDB's
    RE2 must extract the same leftmost non-overlapping matches as Spark's
    Java regex for every pattern — the property that lets the q55 gate
    columns hash-match."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, {'NULL' if t is None else repr(t)})" for i, t in PLANTED
        )
        + ") AS v(doc_id, text)"
    )
    for kind, pat in PII_PATTERNS.items():
        spark_counts = {
            r.doc_id: r.n
            for r in planted.select(
                "doc_id", pii_count_expr(F.col("text"), kind).alias("n")
            ).collect()
        }
        duck_counts = dict(
            con.execute(
                "SELECT doc_id, CASE WHEN text IS NULL THEN 0 ELSE "
                f"len(regexp_extract_all(text, {_sql(pat)})) END FROM docs"
            ).fetchall()
        )
        assert spark_counts == duck_counts, kind


def test_redaction_complete_and_minimal(spark, planted):
    """After redaction no pattern matches anywhere (completeness), and
    PII-free text is byte-identical (minimality)."""
    red = redact_documents(planted)
    residual = red.select(
        sum(
            pii_count_expr(F.col("text"), k) for k in PII_PATTERNS
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert residual == 0
    by_id = {r.doc_id: r.text for r in red.collect()}
    assert by_id[5] == PLANTED[5][1]
    assert by_id[6] == "" and by_id[7] is None
    # most-specific-first order: the SSN-shaped span inside doc 3 became
    # <SSN>, not a half-eaten <PHONE>
    assert by_id[3] == "ssn <SSN> on file"
    assert by_id[4].count("<CARD>") == 2  # redaction is the RECALL net


def test_redaction_matches_duckdb_chain(spark, planted):
    """The redacted STRINGS agree cross-engine when DuckDB applies the
    identical pattern chain in the identical order with the 'g' flag."""
    con = duckdb.connect()
    expr = "text"
    for kind, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, {_sql(pat)}, '<{kind.upper()}>', 'g')"
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, {'NULL' if t is None else repr(t)})" for i, t in PLANTED
        )
        + ") AS v(doc_id, text)"
    )
    duck = dict(con.execute(f"SELECT doc_id, {expr} FROM docs").fetchall())
    got = {
        r.doc_id: r.red
        for r in planted.select(
            "doc_id", redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert got == duck


@pytest.mark.parametrize(
    "number,ok",
    [
        ("4532015112830366", True),  # 16-digit Visa test number
        ("4532015112830367", False),  # last digit off
        ("79927398713", True),  # the canonical Luhn example
        ("79927398710", False),
        ("1234567890123456", False),
        ("42", True),  # 2+8=10: Luhn-valid (too short for the regex net anyway)
        ("4x32015112830366", False),  # non-digit -> guard, not ANSI error
        ("", False),
    ],
)
def test_luhn(spark, number, ok):
    got = (
        spark.createDataFrame([(number,)], "d string")
        .select(luhn_valid_expr(F.col("d")).alias("ok"))
        .collect()[0]
        .ok
    )
    assert got == ok


def test_detect_plan_is_narrow(spark, planted):
    """detect_pii and redact_documents are pure projections: no Exchange,
    no Python, no join — embarrassingly parallel at any corpus size."""
    for df in (detect_pii(planted), redact_documents(planted)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Join" not in plan


def test_redact_composes_with_dedup(spark):
    """Pipeline property: redaction before exact dedup still collapses
    docs that differed only in their PII values (the scrub makes MORE
    things duplicate, never fewer)."""
    from entangledb_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [
            (0, "call me at (555) 123-4567 thanks"),
            (1, "call me at (555) 999-8888 thanks"),
            (2, "entirely different text"),
        ],
        "doc_id long, text string",
    )
    survivors = exact_dedup(redact_documents(docs))
    assert survivors.count() == 2  # 0 and 1 collapsed post-redaction


def test_redaction_is_streaming_safe(spark, tmp_path, planted):
    """The scrub is a stateless narrow projection, so the SAME
    redact_documents/detect_pii calls run unchanged on a readStream —
    the property that lets a streaming ingest pipeline scrub before its
    dedup stage (streaming/corpus_dedup.py) with zero new code. One
    availableNow pass over a file source must produce byte-identical
    redactions and counts to the batch run."""
    src = str(tmp_path / "pii_src")
    out = str(tmp_path / "pii_out")
    ckpt = str(tmp_path / "pii_ckpt")
    planted.write.parquet(src)
    stream = spark.readStream.schema(planted.schema).parquet(src)
    scrubbed = redact_documents(stream)
    counts = detect_pii(stream).select("doc_id", "n_pii_total")
    q = (
        scrubbed.join(counts, "doc_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.doc_id: (r.text, r.n_pii_total) for r in spark.read.parquet(out).collect()}
    batch = {
        r.doc_id: (r.text, r.n_pii_total)
        for r in redact_documents(planted)
        .join(detect_pii(planted).select("doc_id", "n_pii_total"), "doc_id")
        .collect()
    }
    assert got == batch and len(got) == len(PLANTED)

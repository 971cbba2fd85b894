"""PII detection and redaction — the scrubbing stage every production
training-data pipeline runs between crawl and tokenizer (C4 strips
curse-listed lines; Dolma/RefinedWeb-class pipelines regex-scrub emails,
phone numbers, IP addresses and id/card numbers before release).

Spark shape: everything here is a NARROW per-row expression — regex
counts, regexp_replace chains, and a Luhn checksum as a digit-array fold.
Zero shuffles, zero Python, embarrassingly parallel at any corpus size;
the only aggregation is whatever rollup the caller adds.

Cross-engine discipline: every pattern is written in the Java-regex ∩
RE2 subset (character classes, bounded quantifiers, alternation,
non-capturing groups, ASCII \\d and \\b — NO lookaround, NO backrefs)
so the DuckDB oracle applies the IDENTICAL pattern text. Both engines
extract leftmost non-overlapping matches, so counts agree exactly
(q55 gate columns; planted-corpus equality in tests/test_pii.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered most-specific-first: redaction applies the chain in THIS order,
# so a card number is <CARD> before the phone pattern can eat 10 of its
# digits, and an SSN is <SSN> before the phone pattern sees xxx-xx-xxxx.
PII_PATTERNS: dict[str, str] = {
    # 13-16 digits with optional single space/dash separators (word-bounded;
    # Luhn validation is separate — the regex is the RECALL net, the
    # checksum the precision filter, see luhn_valid_expr)
    "card": r"\b(?:\d[ -]?){12,15}\d\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # +CC (XXX) XXX-XXXX and the usual separator variants; requires SOME
    # separator or prefix so a bare 10-digit integer is not a "phone"
    "phone": r"(?:\+\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


def pii_count_expr(text: Column, kind: str) -> Column:
    """Count of ``kind`` matches in ``text`` (leftmost non-overlapping),
    as a BIGINT; NULL text counts 0 on both engines (size(NULL) is -1 in
    Spark, hence the null-guard)."""
    n = F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), 0))
    return F.when(text.isNull(), F.lit(0)).otherwise(n).cast("long")


def redact_pii(text: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> Column:
    """Replace every match with ``<KIND>`` placeholders, most-specific
    pattern first (PII_PATTERNS order) — one regexp_replace per kind,
    fused by codegen into a single pass-shaped projection. Identical
    chain order is what the DuckDB mirror runs (regexp_replace ...,'g'),
    asserted on planted text in tests/test_pii.py."""
    out = text
    for kind in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def luhn_valid_expr(digits: Column) -> Column:
    """Luhn checksum over a digits-only string column — the standard
    card-number validity test, as a pure built-in fold: reverse the
    string, double every second digit (9-wrapping via n*2 - 9), sum,
    mod 10 == 0. False for empty/non-digit input."""
    ds = F.split(F.reverse(digits), "")
    total = F.aggregate(
        F.zip_with(
            ds,
            F.sequence(F.lit(1), F.greatest(F.size(ds), F.lit(1))),
            lambda d, i: F.when(
                i % 2 == 0,
                (d.cast("int") * 2) - F.when(d.cast("int") >= 5, 9).otherwise(0),
            ).otherwise(d.cast("int")),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    # when(), not `&`: under ANSI mode the digit casts would error on
    # non-digit input, and only a conditional guarantees they never run
    # for rows the rlike guard rejects
    return F.when(
        digits.rlike(r"^\d{2,}$"), F.pmod(total, F.lit(10)) == 0
    ).otherwise(F.lit(False))


def detect_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document typed PII counts:
    (id, n_card, n_ssn, n_phone, n_ipv4, n_email, n_pii_total) — one
    narrow projection, no shuffle. ``n_card`` counts LUHN-VALID card
    candidates only (the regex is the recall net; digits are stripped of
    separators and checksummed), so test numbers like 1234-5678-9012
    don't inflate the count."""
    cards = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(PII_PATTERNS["card"]), 0),
            lambda m: F.regexp_replace(m, r"[ -]", ""),
        ),
        luhn_valid_expr,
    )
    n_card = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(cards)
    ).cast("long")
    counts = {k: pii_count_expr(F.col(text_col), k) for k in ("ssn", "phone", "ipv4", "email")}
    out = docs.select(
        F.col(id_col),
        n_card.alias("n_card"),
        *[counts[k].alias(f"n_{k}") for k in ("ssn", "phone", "ipv4", "email")],
    )
    total = sum(
        [F.col("n_card")] + [F.col(f"n_{k}") for k in ("ssn", "phone", "ipv4", "email")],
        F.lit(0),
    )
    return out.withColumn("n_pii_total", total.cast("long"))


def redact_documents(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The pipeline-facing scrub: same schema, text replaced by its
    redacted form. Composes before the dedup/quality stages (placeholders
    hash stably, so a redacted near-duplicate still near-duplicates)."""
    return docs.withColumn(text_col, redact_pii(F.col(text_col)))

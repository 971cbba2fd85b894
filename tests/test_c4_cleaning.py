"""C4-style line-level cleaning (quality.clean_lines_c4): planted-line
behavior, full DuckDB mirror of the same heuristics, and the
empty-survivor document drop."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from entangledb_spark.operators.quality import clean_lines_c4

DOCS = [
    # doc 0: mix — two good lines survive, four junk lines drop
    (
        0,
        "This is a perfectly fine sentence that ends well.\n"
        "too short.\n"
        "this line has many words but no terminal punctuation at all\n"
        "Lorem Ipsum dolor sit amet, the classic filler text.\n"
        "Please accept our cookie policy to continue reading.\n"
        "Another good line stays in the document, naturally!",
    ),
    # doc 1: everything survives
    (1, 'First good line, clearly prose.\nSecond line asks a question?\nThird "quote line."'),
    # doc 2: nothing survives -> document dropped entirely
    (2, "short one.\nno terminal here words words words\nlorem ipsum again here."),
    # doc 3: single-line doc (the no-newline corpus case)
    (3, "A single line document that ends properly."),
]


def test_planted_lines(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r.doc_id: r for r in clean_lines_c4(df).collect()}
    assert set(out) == {0, 1, 3}  # doc 2 dropped: no surviving lines
    d0 = out[0]
    assert d0.clean_text == (
        "This is a perfectly fine sentence that ends well.\n"
        "Another good line stays in the document, naturally!"
    )
    assert (d0.n_lines, d0.n_lines_kept) == (6, 2)
    assert d0.n_chars_kept == len(d0.clean_text)
    assert out[1].n_lines_kept == 3 and out[1].clean_text == DOCS[1][1]
    assert out[3].n_lines_kept == 1


def test_duckdb_mirror(spark):
    """The same heuristics expressed in DuckDB list functions produce the
    identical (kept-lines, counts) relation — engine-independent spec."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.n_lines, r.n_lines_kept, r.n_chars, r.n_chars_kept, r.clean_text)
        for r in clean_lines_c4(df).collect()
    }
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    truth = set(
        con.execute(
            r"""
            WITH l AS (
              SELECT doc_id, text, string_split(text, chr(10)) AS lines
              FROM docs
            ),
            k AS (
              SELECT doc_id, text, lines,
                     list_filter(lines, ln ->
                       len(regexp_extract_all(trim(ln), '[^ \t\x0B\f\r]+')) >= 3
                       AND (ends_with(trim(ln), '.') OR ends_with(trim(ln), '!')
                            OR ends_with(trim(ln), '?') OR ends_with(trim(ln), '"')
                            OR ends_with(trim(ln), chr(39)))
                       AND NOT contains(lower(trim(ln)), 'lorem ipsum')
                       AND NOT contains(lower(trim(ln)), 'javascript')
                       AND NOT contains(lower(trim(ln)), 'cookie policy')
                       AND NOT contains(lower(trim(ln)), 'all rights reserved')
                     ) AS kept
              FROM l
            )
            SELECT doc_id,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(kept) AS BIGINT) AS n_lines_kept,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(array_to_string(list_transform(kept, x -> trim(x)),
                                               chr(10))) AS BIGINT) AS n_chars_kept,
                   array_to_string(list_transform(kept, x -> trim(x)), chr(10))
                     AS clean_text
            FROM k WHERE len(kept) > 0
            """
        ).fetchall()
    )
    assert got == truth


def test_options(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # terminal requirement off: the unpunctuated long line survives
    out = {r.doc_id: r for r in clean_lines_c4(df, require_terminal=False).collect()}
    assert out[0].n_lines_kept == 3
    # custom markers: nothing marked bad
    out2 = {r.doc_id: r for r in clean_lines_c4(df, bad_markers=[]).collect()}
    assert out2[0].n_lines_kept == 4  # lorem + cookie lines end with '.'


def test_no_exchange_in_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = clean_lines_c4(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan

"""Gopher-style repetition metrics + contamination detection, verified
against an independent pure-Python reference implementation — both on
hand-built pathological documents and on every document in the sf0.001
fixture (an exact, full-corpus oracle in the spirit of the DuckDB gate)."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.quality import contamination, repetition_metrics

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- reference


def _words(t: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", t.lower())


def _lines(t: str) -> list[str]:
    return [l.strip() for l in t.split("\n") if l.strip()]


def _grams(w: list[str], n: int) -> list[str]:
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]


def py_metrics(t: str) -> dict:
    L = _lines(t)
    lc = Counter(L)
    tot_lc = sum(c * len(l) for l, c in lc.items())
    w = _words(t)
    word_chars = sum(map(len, w))
    big = Counter(_grams(w, 2))
    if big:
        # mirror Spark's max(struct(cnt, glen)): ties on count break by length
        cnt, glen = max((c, len(g.replace(" ", ""))) for g, c in big.items())
        # a bigram occurring once is not repetition (see operator comment)
        top_bigram = cnt * glen / max(word_chars, 1) if cnt >= 2 else 0.0
    else:
        top_bigram = 0.0
    tri = Counter(_grams(w, 3))
    tot3 = sum(c * len(g.replace(" ", "")) for g, c in tri.items())
    dup3 = sum(c * len(g.replace(" ", "")) for g, c in tri.items() if c > 1)
    return {
        "n_lines": len(L),
        "dup_line_frac": 1 - len(set(L)) / len(L) if L else 0.0,
        "dup_line_char_frac": (
            sum(c * len(l) for l, c in lc.items() if c > 1) / max(tot_lc, 1)
        ),
        "top_bigram_char_frac": top_bigram,
        "dup_trigram_char_frac": dup3 / max(tot3, 1),
    }


FIELDS = [
    "dup_line_frac",
    "dup_line_char_frac",
    "top_bigram_char_frac",
    "dup_trigram_char_frac",
]


def _assert_matches(spark_rows, texts_by_id):
    assert set(spark_rows) == set(texts_by_id)
    for doc_id, row in spark_rows.items():
        exp = py_metrics(texts_by_id[doc_id])
        assert row["n_lines"] == exp["n_lines"], doc_id
        for f in FIELDS:
            assert row[f] == pytest.approx(exp[f], abs=1e-12), f"{doc_id}:{f}"


# ------------------------------------------------------------------- tests


def test_repetition_metrics_pathological_cases(spark):
    texts = {
        1: "spam spam spam spam spam spam",  # one dominating bigram
        2: "line one\nline two\nline one\nline one\n",  # duplicate lines
        3: "a perfectly normal sentence with no repetition at all",
        4: "",  # empty
        5: "word",  # too short for any n-gram
        6: "x y z x y z x y z w",  # repeated trigram, no dup lines
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_metrics(df).collect()}
    _assert_matches(rows, texts)
    assert rows[1]["repetition_flagged"] and rows[6]["repetition_flagged"]
    assert rows[2]["repetition_flagged"]  # 2/4 duplicate lines > 0.30
    assert not rows[3]["repetition_flagged"]
    assert not rows[4]["repetition_flagged"] and not rows[5]["repetition_flagged"]


def test_repetition_metrics_full_fixture_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    rows = {
        r["doc_id"]: r.asDict()
        for r in repetition_metrics(docs).collect()
    }
    _assert_matches(rows, texts)


def test_contamination_flags_exact_8gram_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally unrelated words that share nothing with the benchmark set"),
            (3, "tiny"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        # contains doc 1's 8-gram "beta gamma delta epsilon zeta eta theta iota"
        [("question: beta gamma delta epsilon zeta eta theta iota?",)],
        "text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in contamination(corpus, bench).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_contaminated_shingles"] == 1
    assert rows[1]["n_shingles"] == 3  # 10 words → three 8-grams
    assert not rows[2]["contaminated"] and rows[2]["n_contaminated_shingles"] == 0
    # a doc too short for any shingle is clean with zero shingles
    assert rows[3]["n_shingles"] == 0 and not rows[3]["contaminated"]


def test_contamination_fixture_self_overlap(spark):
    """Using a slice of the corpus itself as the 'benchmark' must flag
    exactly the documents long enough to have shingles in that slice."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 5).select("text")
    rows = contamination(docs, bench).collect()
    flagged = {r["doc_id"] for r in rows if r["contaminated"]}
    eligible = {
        r["doc_id"]
        for r in docs.select("doc_id", "text").collect()
        if r["doc_id"] < 5 and len(_words(r["text"])) >= 8
    }
    assert eligible <= flagged  # every eligible benchmark doc flags itself
    # and documents sharing no 8-gram with docs 0-4 stay clean
    assert len(flagged) < docs.count()


def test_contamination_plan_broadcasts_benchmark(spark):
    """The benchmark side must broadcast — the corpus is never shuffled
    for the join at 100 TB."""
    import io
    from contextlib import redirect_stdout

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    buf = io.StringIO()
    with redirect_stdout(buf):
        contamination(docs, bench).explain()
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_repetition_metrics_null_and_empty_text(spark):
    """NULL/empty text must survive to the output as an empty document
    (n_lines=0, all fractions 0, unflagged) — a tagged-explode
    formulation without the coalesce guard silently DROPS the row
    (explode(NULL) emits nothing), diverging from the q81 oracle."""
    from entangledb_spark.operators.quality import repetition_metrics

    docs = spark.createDataFrame(
        [(1, "real text here with words"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_metrics(docs).collect()}
    assert set(rows) == {1, 2, 3}
    for did in (2, 3):
        r = rows[did]
        assert r.n_lines == 0
        assert r.dup_line_frac == 0.0 and r.dup_line_char_frac == 0.0
        assert r.top_bigram_char_frac == 0.0 and r.dup_trigram_char_frac == 0.0
        assert r.repetition_flagged is False

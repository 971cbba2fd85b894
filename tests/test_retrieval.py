"""BM25 retrieval operator tests (operators/retrieval.py).

- A pure-Python reference BM25 (Counter-based, written independently of
  the Spark expressions but with the SAME association order — float
  addition isn't associative, so "same formula" alone wouldn't pin bits)
  must match the engine EXACTLY, not approximately: every op in the
  pipeline is a correctly-rounded IEEE double op on identical inputs.
- The q66 gate columns (r4 score + BIGINT tf) are checked against that
  reference, and the r4 FLIP boundary margin is measured at all three
  fixture densities. The flip boundary of floor(x·10⁴ + 0.5) is where
  x·10⁴ + 0.5 crosses an integer (x·10⁴ at half-integers) — distance to
  the nearest INTEGER of x·10⁴ would measure the safest point of the
  rounding cell, not the cliff.
- Plan shape: scoring is zero-Exchange/no-Python (the literal fold reads
  only the persisted narrow relation), top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.retrieval import (
    BM25_B,
    BM25_GATE_TERMS,
    BM25_K1,
    bm25_gate_summary,
    bm25_scores,
    bm25_topk,
)

SF = "/root/testdata/sf0.001"
ALL_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _ref_bm25(
    rows: list[tuple[int, str]],
    terms: tuple[str, ...],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> dict[int, float]:
    """Independent reference: dict/Counter bookkeeping, engine-matching
    association order in the float arithmetic."""
    toks = {d: re.findall("[a-z]+", t.lower()) for d, t in rows}
    dl = {d: len(v) for d, v in toks.items()}
    n = len(rows)
    avgdl = sum(dl.values()) / n
    cnt = {d: Counter(v) for d, v in toks.items()}
    df = {t: sum(1 for d in toks if cnt[d][t] > 0) for t in terms}
    k1p1 = k1 + 1.0
    c0 = k1 * (1.0 - b)
    c1 = (k1 * b) / avgdl
    out: dict[int, float] = {}
    for d in toks:
        score = None
        for t in terms:
            idf = math.log(1.0 + ((n - df[t]) + 0.5) / (df[t] + 0.5))
            tf = cnt[d][t]
            contrib = idf * ((tf * k1p1) / (tf + (c0 + c1 * dl[d])))
            score = contrib if score is None else score + contrib
        out[d] = score
    return out


def _fixture_rows(spark):
    return [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]


def test_bm25_scores_bit_exact_vs_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        r.doc_id: r.score
        for r in bm25_scores(docs, BM25_GATE_TERMS).collect()
    }
    ref = _ref_bm25(_fixture_rows(spark), BM25_GATE_TERMS)
    assert set(got) == set(ref)
    mism = {d: (got[d], ref[d]) for d in ref if got[d] != ref[d]}
    assert mism == {}, f"{len(mism)} docs not bit-identical, e.g. {next(iter(mism.items()))}"
    # sanity: the probe discriminates (not all-zero, not all-equal)
    vals = set(got.values())
    assert len(vals) > 10 and max(vals) > 0.0


def test_bm25_gate_summary_matches_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = _fixture_rows(spark)
    ref = _ref_bm25(rows, BM25_GATE_TERMS)
    cnt = {d: Counter(re.findall("[a-z]+", t.lower())) for d, t in rows}
    ref_tf = {d: sum(cnt[d][t] for t in BM25_GATE_TERMS) for d, _ in rows}
    got = {r.doc_id: (r.bm25_tf, r.bm25_q) for r in bm25_gate_summary(docs).collect()}
    for d, s in ref.items():
        want_q = math.floor(s * 10000 + 0.5) / 10000
        assert got[d] == (ref_tf[d], want_q), (d, got[d], (ref_tf[d], want_q))


def test_bm25_topk_matches_reference_ranking(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    k = 15
    got = [r.doc_id for r in bm25_topk(docs, BM25_GATE_TERMS, k=k).collect()]
    ref = _ref_bm25(_fixture_rows(spark), BM25_GATE_TERMS)
    want = [d for d, _ in sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]
    assert got == want


@pytest.mark.parametrize("sf", ALL_SFS)
def test_bm25_r4_flip_boundary_margin(spark, sf):
    """No gate score may sit near the floor(x·10⁴+0.5) FLIP boundary —
    x·10⁴+0.5 integral — at any density the gate can run at. Measured
    2026-08 (r7): see assertion; cross-engine noise is 0 (bit-identical
    pipelines), so this is pure insurance against fixture regeneration."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    scores = [r.score for r in bm25_scores(docs, BM25_GATE_TERMS).collect()]
    flips = [abs((s * 10000 + 0.5) - round(s * 10000 + 0.5)) for s in scores]
    m = min(flips)
    assert m > 1e-9, f"r4 flip margin collapsed to {m} at {sf}"


def test_bm25_scoring_plan_zero_exchange_no_python(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = bm25_scores(docs, BM25_GATE_TERMS)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


def test_bm25_topk_take_ordered(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t = bm25_topk(docs, BM25_GATE_TERMS, k=5)
    plan = t._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_tokenless_and_unknown_terms(spark):
    df = spark.createDataFrame(
        [(1, "hash join hash"), (2, ""), (3, "12345 !!!")],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in bm25_scores(df, ("hash", "zzzznotindocs")).collect()
    }
    assert rows[2].dl == 0 and rows[2].score == 0.0
    assert rows[3].dl == 0 and rows[3].score == 0.0
    assert rows[1].bm25_tf == 2 and rows[1].score > 0.0

"""NB quality classifier (operators/classifier.py): trained model ==
pure-Python recount, scores == DuckDB oracle retraining, the classifier
genuinely learns its weak label, zero-exchange plan, margin gates."""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.classifier import (
    CLS_TOKEN_RE,
    N_CLS_BUCKETS,
    nb_oracle_ctes,
    nb_quality_score,
    train_nb_quality,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, sf=SF):
    return spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text", "lang"
    )


def _bucket(tok: str, n_buckets: int = N_CLS_BUCKETS) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:7], 16) % n_buckets


def _py_model(rows, n_buckets: int = N_CLS_BUCKETS) -> dict:
    c = {True: {}, False: {}}
    n = {True: 0, False: 0}
    for text, y in rows:
        if y is None:
            continue
        n[y] += 1
        for tok in re.findall(CLS_TOKEN_RE, text.lower()):
            b = _bucket(tok, n_buckets)
            c[y][b] = c[y].get(b, 0) + 1
    t1, t0 = sum(c[True].values()), sum(c[False].values())
    logodds = [
        math.log((c[True].get(b, 0) + 1.0) / (t1 + n_buckets))
        - math.log((c[False].get(b, 0) + 1.0) / (t0 + n_buckets))
        for b in range(n_buckets)
    ]
    return {
        "n_buckets": n_buckets,
        "prior": math.log(n[True] / n[False]),
        "logodds": logodds,
    }


def _py_score(text: str, model: dict) -> float:
    acc = model["prior"]
    for tok in re.findall(CLS_TOKEN_RE, text.lower()):
        acc += model["logodds"][_bucket(tok, model["n_buckets"])]
    return acc


@pytest.fixture(scope="module")
def fixture(spark):
    df = _docs(spark)
    rows = [(r.text, r.lang == "en") for r in df.collect()]
    model = train_nb_quality(df, F.col("lang") == "en")
    return df, rows, model


def test_model_matches_python_recount(fixture):
    df, rows, model = fixture
    want = _py_model(rows)
    assert model["prior"] == want["prior"]
    assert model["logodds"] == want["logodds"]  # bit-exact: same int counts


def test_scores_match_python_fold(spark, fixture):
    df, rows, model = fixture
    got = {
        r.doc_id: (r.nb_score, r.nb_pred)
        for r in nb_quality_score(df, model).collect()
    }
    texts = {r.doc_id: r.text for r in df.collect()}
    for did, (s, p) in got.items():
        want = _py_score(texts[did], model)
        assert abs(s - want) < 1e-12, did
        assert p == (1 if want > 0 else 0)


def test_scores_match_duckdb_retraining(spark, fixture):
    """The oracle CTEs retrain the model from scratch in SQL (md5-bucket
    counts, smoothing, log-odds, prior) — per-doc scores must agree with
    Spark far inside the r4 grain."""
    df, _, model = fixture
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    sql = (
        "WITH "
        + nb_oracle_ctes("lang = 'en'").lstrip()
        + " SELECT doc_id, score FROM nbscore"
    )
    want = {int(d): float(s) for d, s in con.execute(sql).fetchall()}
    got = {
        r.doc_id: r.nb_score for r in nb_quality_score(df, model).collect()
    }
    assert set(got) == set(want)
    worst = max(abs(got[d] - want[d]) for d in got)
    assert worst < 1e-9, worst


def test_classifier_learns_a_separable_label(spark):
    """On a corpus where the label genuinely correlates with vocabulary
    (positives lean on vocab A, negatives on vocab B, heavy shared
    filler), the trained scorer must reach >= 0.95 held-out accuracy,
    far above the 0.5 baseline. (The parquet fixture is NOT used here
    on purpose: its per-language token-frequency deltas are ~±10%, an
    essentially unlearnable unigram signal — exact-token NB measures
    0.612 vs a 0.614 majority baseline on it. The fixture still hosts
    the determinism/margin gates below; learnability needs a corpus
    with signal.)"""
    import random

    rng = random.Random(7)
    good = ["careful", "structured", "cited", "reviewed", "precise"]
    bad = ["clickbait", "spammy", "keyword", "stuffed", "autogen"]
    shared = ["the", "data", "text", "page", "site", "read", "word"]

    def doc(pos: bool) -> str:
        lean = good if pos else bad
        toks = [
            rng.choice(lean) if rng.random() < 0.3 else rng.choice(shared)
            for _ in range(60)
        ]
        return " ".join(toks)

    rows = [(i, doc(i % 2 == 0), i % 2 == 0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    train = df.filter(F.col("doc_id") < 300)
    test = df.filter(F.col("doc_id") >= 300)
    model = train_nb_quality(train, F.col("y"))
    scored = nb_quality_score(test, model).select("y", "nb_pred").collect()
    acc = sum(1 for r in scored if r.y == (r.nb_pred == 1)) / len(scored)
    print(f"nb held-out accuracy {acc:.3f}")
    assert acc >= 0.95


def test_plan_zero_exchange_no_python(spark, fixture):
    df, _, model = fixture
    plan = (
        nb_quality_score(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_single_class_rejected(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="both classes"):
        train_nb_quality(df, F.lit(True))


ALL_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_nb_gate_margins(spark, sf):
    """q91's nb_pred/nbq_q gate columns: (a) no document's |score| may
    sit near the sign boundary (prediction flip), (b) no score·1e4 near
    a half-integer (r4 flip) — both measured at every density, since the
    two engines sum per-token contributions in different orders
    (~1e-13 noise on hundred-token docs)."""
    df = _docs(spark, sf)
    model = train_nb_quality(df, F.col("lang") == "en")
    scores = [
        r.nb_score for r in nb_quality_score(df, model).collect()
    ]
    sign_margin = min(abs(s) for s in scores)
    assert sign_margin > 1e-6, f"nb_pred sign margin collapsed to {sign_margin} at {sf}"
    flip = min(
        abs((s * 10000 + 0.5) - round(s * 10000 + 0.5)) for s in scores
    )
    assert flip > 1e-6, f"nbq_q r4 flip margin collapsed to {flip} at {sf}"


def test_null_text_scores_the_prior(spark):
    """A NULL-text document must score exactly the prior on BOTH
    engines — Spark's aggregate would otherwise propagate NULL while
    the oracle's LEFT JOIN path coalesces to the prior (round-7 review
    finding: one NULL row would hash-split the q91 gate)."""
    train = spark.createDataFrame(
        [(0, "careful precise text", True), (1, "spam spam spam", False)],
        "doc_id long, text string, y boolean",
    )
    model = train_nb_quality(train, F.col("y"))
    scored = nb_quality_score(
        spark.createDataFrame(
            [(10, None), (11, "")], "doc_id long, text string"
        ),
        model,
    ).collect()
    for r in scored:
        assert r.nb_score == model["prior"], r
        assert r.nb_pred == (1 if model["prior"] > 0 else 0)

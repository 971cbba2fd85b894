"""Trained document-quality classifier — Naive Bayes over hashed token
features (the fastText-style weak-label scorer curation pipelines run
to separate wanted from unwanted text at corpus scale).

The quality.py metrics are fixed heuristics; langid.py is a trained
multi-class NB over char n-grams. This module completes the trained
family with the BINARY bag-of-hashed-tokens classifier: labels come
from any boolean weak-label rule (a trusted source flag, a heuristic
quality cut, a language tag), features are the hashing trick —
token → md5-derived bucket in [0, n_buckets) — so the feature space is
FIXED-SIZE regardless of vocabulary (Weinberger et al. 2009, "Feature
Hashing for Large Scale Multitask Learning"; fastText's bag-of-words
mode is the same shape with a trained linear layer).

Spark shape (the langid asymmetry):

- **Training** is ONE corpus aggregation: explode hashed buckets, count
  per (label, bucket) with map-side combine — the key space is
  2 x n_buckets, so the reduce input is bounded and skew-free by
  construction — plus a per-label doc/token tally. The model collects
  to 2 + n_buckets doubles (a few hundred bytes).
- **Scoring** folds the model into ONE literal array expression:
  score(doc) = prior + Σ_tokens logodds[bucket(token)] — an O(1)
  element_at per token, zero shuffles, zero joins, no Python; the model
  rides inside the plan (the langid literal route, but a DENSE array —
  hashing already bounded the index space, so no crc32 bucket-of-maps
  indirection is needed).

The hash is the md5 twin primitive (conv(substr(md5(token),1,7),16,10)
% n_buckets — 28 bits, BIGINT-safe) rather than xxhash64/crc32: Spark
computes it executor-side, DuckDB re-derives the identical value with
('0x' || substr(md5(token),1,7))::BIGINT, so the ENTIRE trained model —
counts, smoothing, log-odds, priors — is re-derivable in oracle SQL and
the classifier sits on the q91 hash gate end-to-end (nb_pred + r4
score; cross-engine float margins measured in
tests/test_classifier.py::test_nb_gate_margins).

Smoothing: add-one over the n_buckets feature space —
p(b|y) = (c_yb + 1) / (T_y + n_buckets), logodds[b] = ln p(b|1) −
ln p(b|0), prior = ln(n1 / n0) (doc-count odds; callers with a known
target prevalence can override). A document with no tokens scores
exactly the prior.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_CLS_BUCKETS = 64

# Same token class as BM25/tfidf — the lexical operators must agree on
# what a term is.
CLS_TOKEN_RE = r"[a-z]+"


def token_bucket_expr(text_col: Column, n_buckets: int = N_CLS_BUCKETS) -> Column:
    """Array of hashed-token feature buckets (repeats preserved — NB
    counts token occurrences). md5-derived so DuckDB re-computes the
    identical bucket (the twin-primitive recipe)."""
    toks = F.regexp_extract_all(F.lower(text_col), F.lit(CLS_TOKEN_RE), 0)
    return F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long")
        % n_buckets,
    )


def bucket_sql(token_expr: str, n_buckets: int = N_CLS_BUCKETS) -> str:
    """DuckDB fragment computing exactly token_bucket_expr's bucket for
    one token string expression."""
    return f"('0x' || substr(md5({token_expr}), 1, 7))::BIGINT % {n_buckets}"


def train_nb_quality(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    n_buckets: int = N_CLS_BUCKETS,
) -> dict:
    """Train on ``label`` (a BOOLEAN Column — the weak-label rule; NULL
    labels train nothing). Returns {"n_buckets", "prior",
    "logodds": [n_buckets]} — a bounded driver-side model.

    One corpus scan: the (label, bucket) count key space is 2·n_buckets,
    so map-side combine reduces every task to ≤ 2·n_buckets rows — no
    Zipf hazard at any corpus size (hot tokens only make bucket counts
    LARGER, never more numerous)."""
    base = docs.filter(label.isNotNull()).select(
        label.cast("boolean").alias("_y"),
        token_bucket_expr(F.col(text_col), n_buckets).alias("_b"),
    )
    counts = (
        base.select("_y", F.explode("_b").alias("_bk"))
        .groupBy("_y", "_bk")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    ndocs = {
        bool(r._y): int(r.n)
        for r in base.groupBy("_y").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n1, n0 = ndocs.get(True, 0), ndocs.get(False, 0)
    if n1 == 0 or n0 == 0:
        raise ValueError(
            f"train_nb_quality needs both classes; got {n1} positive / "
            f"{n0} negative labeled docs"
        )
    c = {True: {}, False: {}}
    for r in counts:
        c[bool(r._y)][int(r._bk)] = int(r._c)
    t1 = sum(c[True].values())
    t0 = sum(c[False].values())
    logodds = [
        math.log((c[True].get(b, 0) + 1.0) / (t1 + n_buckets))
        - math.log((c[False].get(b, 0) + 1.0) / (t0 + n_buckets))
        for b in range(n_buckets)
    ]
    return {
        "n_buckets": n_buckets,
        "prior": math.log(n1 / n0),
        "logodds": logodds,
    }


def nb_score_expr(text_col: Column, model: dict) -> Column:
    """The zero-exchange scoring fold: prior + Σ logodds[bucket(token)],
    accumulated left-to-right in token order (float addition is
    order-sensitive; the oracle mirrors the same per-token relation and
    the residual cross-engine noise is measured against the r4 grain).

    A NULL text scores exactly the prior, like an empty one — the
    bucket array is coalesced to empty, because aggregate(NULL, ...)
    would otherwise propagate NULL while the oracle's LEFT JOIN +
    coalesce path scores the prior (round-7 review finding: one
    NULL-text row would hash-split the q91 gate)."""
    arr = (
        "array("
        + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in model["logodds"])
        + ")"
    )
    buckets = F.coalesce(
        token_bucket_expr(text_col, model["n_buckets"]),
        F.expr("CAST(array() AS ARRAY<BIGINT>)"),
    )
    return F.aggregate(
        buckets,
        F.lit(float(model["prior"])).cast("double"),
        lambda acc, b: acc
        + F.element_at(F.expr(arr), (b + 1).cast("int")),
    )


def nb_quality_score(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    score_col: str = "nb_score",
    pred_col: str = "nb_pred",
) -> DataFrame:
    """Attach the log-odds score and the hard prediction (score > 0).
    All input columns preserved; embarrassingly parallel."""
    s = nb_score_expr(F.col(text_col), model)
    return docs.withColumn(score_col, s).withColumn(
        pred_col, (F.col(score_col) > 0).cast("long")
    )


def nb_oracle_ctes(
    label_sql: str,
    n_buckets: int = N_CLS_BUCKETS,
    docs_rel: str = "documents",
) -> str:
    """DuckDB CTEs re-deriving the ENTIRE trained classifier from
    scratch: hashed-bucket counts per class, add-one smoothing,
    log-odds, doc-count prior, and the per-document score — the same
    training-in-SQL recipe as the q92 langid oracle. ``label_sql`` is
    the weak-label boolean expression over ``docs_rel``'s columns.

    Yields CTEs ``nbmodel(bk, lo)``, ``nbprior(prior)`` and
    ``nbscore(doc_id, score)`` (score includes the prior; token-less
    docs score exactly the prior)."""
    return f"""
    nbtok AS (
      SELECT doc_id, ({label_sql}) AS y,
             unnest(regexp_extract_all(lower(text), '{CLS_TOKEN_RE}')) AS tok
      FROM {docs_rel}
    ),
    nbb AS (
      SELECT doc_id, y, {bucket_sql("tok", n_buckets)} AS bk FROM nbtok
    ),
    nbc AS (
      SELECT y, bk, count(*) AS c FROM nbb WHERE y IS NOT NULL GROUP BY y, bk
    ),
    nbt AS (
      SELECT coalesce(sum(CASE WHEN y THEN c END), 0) AS t1,
             coalesce(sum(CASE WHEN NOT y THEN c END), 0) AS t0
      FROM nbc
    ),
    nbn AS (
      SELECT count(*) FILTER (WHERE ({label_sql})) AS n1,
             count(*) FILTER (WHERE NOT ({label_sql})) AS n0
      FROM {docs_rel} WHERE ({label_sql}) IS NOT NULL
    ),
    nbmodel AS (
      SELECT b.bk,
             ln((coalesce(c1.c, 0) + 1.0) / (t.t1 + {n_buckets}))
             - ln((coalesce(c0.c, 0) + 1.0) / (t.t0 + {n_buckets})) AS lo
      FROM (SELECT unnest(range({n_buckets})) AS bk) b
           CROSS JOIN nbt t
           LEFT JOIN nbc c1 ON c1.bk = b.bk AND c1.y
           LEFT JOIN nbc c0 ON c0.bk = b.bk AND NOT c0.y
    ),
    nbprior AS (SELECT ln(CAST(n1 AS DOUBLE) / n0) AS prior FROM nbn),
    nbscore AS (
      SELECT d.doc_id, p.prior + coalesce(s.acc, 0.0) AS score
      FROM {docs_rel} d CROSS JOIN nbprior p
           LEFT JOIN (
             SELECT nbb.doc_id, sum(m.lo) AS acc
             FROM nbb JOIN nbmodel m ON m.bk = nbb.bk
             GROUP BY nbb.doc_id
           ) s ON s.doc_id = d.doc_id
    )"""

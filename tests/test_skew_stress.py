"""Skew stress tests for the three documented hazards (round-4 ask #1):

(a) span dedup under a mega-hot boilerplate span (one 10-token chunk in
    half of all documents) — the window variant must complete, and the opt-in
    ``hot_span_cap`` groupBy/broadcast route must produce IDENTICAL
    survivors while keeping the hot hash out of any window partition;
(b) ngram_lm_score on a Zipf corpus where the head/tail split-join
    actually matters ("the" carries ~half the token mass) — output must
    match the DuckDB mirror AND be invariant to where the head/tail
    boundary lands;
(c) the q61 DOC_FREQ_CAP boundary — a token at exactly cap×|docs|
    documents is KEPT (strict >), one document more is DROPPED, verified
    through the resulting Jaccard scores.

These corpora are synthesized to be adversarial: they would straggle or
silently mis-score the naive plans the operators document defending
against.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from entangledb_spark.operators.dedup import near_dup_jaccard_pairs
from entangledb_spark.operators.packing import dedup_spans
from entangledb_spark.operators.quality import ngram_lm_score
from tests.oracle import canonical

BOILER = "all rights reserved click accept to continue using this site"  # 10 tokens


def _hot_span_corpus(spark, n_docs=200):
    """Half the documents share one 10-token boilerplate span; every doc
    also carries unique content spans."""
    rows = []
    for i in range(n_docs):
        unique = " ".join(f"w{i}x{j}" for j in range(10))  # one unique span
        if i % 2 == 0:
            rows.append((i, BOILER + " " + unique))
        else:
            rows.append((i, unique + " " + " ".join(f"y{i}z{j}" for j in range(10))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_dedup_mega_hot_span_completes_and_cap_preserves_survivors(spark):
    docs = _hot_span_corpus(spark)
    base = {r["doc_id"]: r for r in dedup_spans(docs).collect()}
    # the window variant completed; keep-first semantics on the hot span
    assert len(base) == 200
    assert BOILER in base[0]["cleaned_text"]  # global first occurrence kept
    hot_docs = [i for i in range(200) if i % 2 == 0 and i > 0]
    assert all(BOILER not in base[i]["cleaned_text"] for i in hot_docs[:5])
    assert all(base[i]["n_removed"] == 1 for i in hot_docs[:5])
    # opt-in cap (hot hash resolved via map-side-combined groupBy +
    # broadcast, never entering a window partition): survivors IDENTICAL
    capped = {r["doc_id"]: r for r in dedup_spans(docs, hot_span_cap=10).collect()}
    assert set(capped) == set(base)
    for i in base:
        assert tuple(capped[i]) == tuple(base[i]), i
    # cap low enough to catch nothing-hot corpora too: a cap ABOVE the hot
    # count must also reproduce the base output exactly (pure window path)
    high = {r["doc_id"]: r for r in dedup_spans(docs, hot_span_cap=10**6).collect()}
    for i in base:
        assert tuple(high[i]) == tuple(base[i]), i


LM_ORACLE = """
WITH words AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents
),
bigrams AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i
        FROM words WHERE len(ws) >= 2)
),
uni AS (
  SELECT w1, count(*) AS c1 FROM (SELECT unnest(ws) AS w1 FROM words) GROUP BY 1
),
v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
bgc AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(CAST(avg(ln((c12 + 0.5) / (c1 + 0.5 * v))) AS DOUBLE) * 10000 + 0.5)
         / 10000 AS avg_logprob,
       floor(CAST(exp(-avg(ln((c12 + 0.5) / (c1 + 0.5 * v)))) AS DOUBLE) * 10000 + 0.5)
         / 10000 AS ppl
FROM bigrams b JOIN bgc USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v
GROUP BY b.doc_id
"""


def test_lm_score_zipf_head_tail_split(spark):
    """Zipf corpus: 'the' is every other token (~50% of unigram mass — the
    catastrophic C(w1) hot key the split-join defends against), the tail
    is near-unique. The scored output must (a) match the DuckDB mirror
    and (b) be bit-identical whether the hot head holds just the hot word
    (hot_head=1: every 'the'-prefixed bigram rides the broadcast, the
    tail shuffles) or everything (hot_head=10**6: the whole C(w1) join is
    broadcast) — proving score correctness does not depend on where the
    head/tail boundary lands."""
    rows = [
        (i, " ".join(f"the t{i}a{j}" for j in range(20)) + " the")
        for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    split = ngram_lm_score(docs, hot_head=1)
    srows = [tuple(r) for r in split.collect()]
    con = duckdb.connect()
    con.register("documents", pdf)
    res = con.execute(LM_ORACLE)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows) == 100
    assert canonical(srows, split.columns) == canonical(drows, dcols)
    # boundary invariance: all-broadcast and tiny-head runs agree exactly
    allb = sorted(tuple(r) for r in ngram_lm_score(docs, hot_head=10**6).collect())
    assert sorted(srows) == allb


def test_doc_freq_cap_boundary(spark):
    """Strict-> boundary of the hot-token guard: with 4 docs and cap=0.5
    the threshold is 2.0 — a token in exactly 2 docs ('atcap') is KEPT,
    a token in 3 docs ('overcap') is DROPPED. The (0,1) pair score
    discriminates all three behaviors:
      overcap dropped + atcap kept  -> shared {alpha,beta,atcap}: 3/4 = 0.75
      neither dropped               -> 4/5 = 0.8
      both dropped                  -> 2/3 = 0.6667
    """
    docs = spark.createDataFrame(
        [
            (0, "en", "alpha beta atcap overcap"),
            (1, "en", "alpha beta atcap overcap gamma"),
            (2, "en", "overcap zeta yota xi omega"),
            (3, "en", "delta epsilon kappa lam mu"),
        ],
        "doc_id long, lang string, text string",
    )
    out = near_dup_jaccard_pairs(docs, doc_freq_cap=0.5, sample_mod=1).collect()
    scores = {(r["id_a"], r["id_b"]): r["score"] for r in out}
    assert scores == {(0, 1): 0.75}, scores

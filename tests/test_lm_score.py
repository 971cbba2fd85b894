"""ngram_lm_score (operators/quality.py): DuckDB-mirror oracle on the
documents fixture plus sanity properties (repetitive text scores higher
probability than shuffled gibberish under the corpus LM)."""

from __future__ import annotations

from entangledb_spark.operators.quality import ngram_lm_score
from entangledb_spark.registry import table
from tests.oracle import canonical, duck_connect

SF = "/root/testdata/sf0.001"

ORACLE = """
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


def test_lm_score_oracle(spark):
    sdf = ngram_lm_score(table(spark, SF, "documents"))
    srows = [tuple(r) for r in sdf.collect()]
    con = duck_connect(SF)
    res = con.execute(ORACLE)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows)
    assert canonical(srows, sdf.columns) == canonical(drows, dcols)


def test_lm_score_orders_quality(spark):
    """A document dominated by one very frequent transition must score a
    far higher avg_logprob than word salad whose every transition is a
    hapax. (Note: under add-k smoothing a RARE-prefix bigram is not a
    reliable low-probability signal — P(w2|w1) for a hapax prefix with one
    continuation is high — so the discriminative case is repeated mass on
    one transition, not fluent-vs-reversed text.)"""
    docs = table(spark, SF, "documents")
    repeated = " ".join(["alpha beta"] * 300)  # c12 ~ c1 ~ 600
    fluent = " ".join(
        r.text for r in docs.select("text").limit(3).collect()
    )
    salad = " ".join(w[::-1] for w in fluent.split()[:200])  # unique transitions
    aug = spark.createDataFrame(
        [(10_000, repeated), (10_001, salad)], "doc_id long, text string"
    ).unionByName(docs.select("doc_id", "text"))
    out = {
        r.doc_id: r
        for r in ngram_lm_score(aug).collect()
        if r.doc_id >= 10_000
    }
    assert out[10_000].avg_logprob > out[10_001].avg_logprob + 1.0
    assert out[10_000].ppl < out[10_001].ppl

"""BM25 full-text ranking — the retrieval surface of the pipeline.

A training-data pipeline needs lexical retrieval for two jobs the existing
operators don't cover: retrieval-based decontamination (rank the corpus
against benchmark queries and audit/drop the top hits — stronger than the
n-gram containment check in quality.benchmark_contamination because it
finds paraphrased overlap that exact n-grams miss) and corpus search
(find the documents most relevant to a probe query, e.g. for targeted
quality audits). Both reduce to Okapi BM25 over the corpus
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
BM25 and Beyond"; the idf variant is Lucene's BM25Similarity
``ln(1 + (N - df + 0.5)/(df + 0.5))``, which keeps idf positive for
df > N/2 — the classic Robertson idf goes negative there).

Scale shape (the whole point):

- ONE corpus scan. The per-doc relation (doc_id, dl, tf per query term)
  is a narrow codegen'd map — ``size(filter(tokens, t))`` per literal
  term — persisted once; BOTH the corpus-stats aggregate and the scoring
  pass read the persisted ints (2+|terms| longs per doc), never the text
  twice.
- Corpus stats (N, avgdl, df per term) reduce to 2+|terms| SCALARS — a
  bounded collect regardless of corpus size (the DSIR-totals class, not
  a driver-collapse hazard).
- Scoring is a ZERO-EXCHANGE literal fold: idf and the length-
  normalization constants are computed in PYTHON on the collected stats
  and folded into one narrow expression (the dsir/langid literal route)
  — per-term idf·(tf·(k1+1))/(tf + k1(1−b) + (k1·b/avgdl)·dl), summed
  left-to-right in query-term order. No shuffle, no UDF, no join.
- Top-k is orderBy+limit → TakeOrderedAndProject (per-partition heaps,
  no global sort).

Cross-engine determinism (how the q66 gate columns stay hash-exact):
every float op is IEEE-identical on both engines. N/df/dl/tf are exact
integers; avgdl is one correctly-rounded double division (Python
``sum_dl / n`` ≡ DuckDB ``CAST(sum(dl) AS DOUBLE)/count(*)``); idf is
libm ``log`` on bit-identical inputs (Python math.log ≡ DuckDB ln —
same libm in-process); constants are interpolated via ``repr()`` whose
round-trip guarantee makes DuckDB's strtod reproduce the exact Python
double; and the per-term contributions are summed in the SAME explicit
left-assoc order in both engines (float addition isn't associative —
an unordered SQL SUM() would not be gate-safe). The r4 grain (1e-4) then
sits ~12 orders of magnitude above any residual ulp;
tests/test_retrieval.py measures the actual boundary margin at all
three fixture densities.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from entangledb_spark.functions.numeric import r4

# Okapi defaults (Robertson et al.; also Lucene's defaults).
BM25_K1 = 1.2
BM25_B = 0.75

# Same token class as tfidf_keywords — the two lexical-relevance operators
# must agree on what a term is.
BM25_TOKEN_RE = r"[a-z]+"

# Fixed probe query for the q66 gate columns: mid-frequency fixture terms
# so tf, df and dl all vary across docs (a query of only-ubiquitous terms
# would make idf ≈ 0 everywhere and the gate would test little).
BM25_GATE_TERMS = ("hash", "join", "stream", "vector")


def _tokens(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(BM25_TOKEN_RE), 0)


def normalize_terms(terms: tuple[str, ...], token_re: str = BM25_TOKEN_RE) -> tuple[str, ...]:
    """Normalize probe terms through the SAME lens the build side applies
    to document text: lowercase, then require each term to be a single
    token of ``token_re``. Corpus tokens are lower()'d at build time, so
    an un-normalized probe ('Hash') would silently score zero everywhere
    — and on the partitioned index it would read the WRONG bucket
    directory (crc32('Hash') ≠ crc32('hash')). A term that cannot
    tokenize at all (whitespace, punctuation, multiple words) can never
    match any posting, so it raises instead of silently returning zeros;
    free-text queries belong on bm25_topk_bulk, which tokenizes them."""
    import re

    out = []
    for t in terms:
        low = t.lower()
        if re.fullmatch(token_re, low) is None:
            raise ValueError(
                f"probe term {t!r} is not a single {token_re!r} token — "
                "pass free text through bm25_topk_bulk, which tokenizes it"
            )
        out.append(low)
    return tuple(out)


def bm25_doc_terms(
    docs: DataFrame,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Narrow per-doc relation (id, dl, tf1..tfk) for a fixed term list.

    One codegen'd map over the text — ``size(filter(tokens, = term))``
    per literal term — no explode, no shuffle. This is the ONLY relation
    the rest of BM25 touches; persist it and the corpus text is scanned
    exactly once end-to-end.
    """
    terms = normalize_terms(terms)
    toks = _tokens(F.col(text_col))
    cols = [F.col(id_col), F.size(toks).alias("dl")]

    # closure factory, NOT a `t=t` default arg: a two-parameter lambda
    # makes F.filter use its (element, index) form and the second arg
    # becomes the array index, silently shadowing the term
    def _eq(term: str):
        lit_t = F.lit(term)
        return lambda x: x == lit_t

    for i, t in enumerate(terms, start=1):
        cols.append(F.size(F.filter(toks, _eq(t))).alias(f"tf{i}"))
    return docs.select(*cols)


def bm25_stats(doc_terms: DataFrame, n_terms: int) -> dict:
    """Corpus statistics as 2+|terms| scalars: N, avgdl, df per term.

    A bounded collect at any corpus size — the aggregate reduces the
    narrow relation to one row. avgdl is computed driver-side as
    ``sum_dl / n`` (int/int true division) so it is the identical
    correctly-rounded double DuckDB's ``CAST(sum(dl) AS DOUBLE)/count(*)``
    produces.
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("sum_dl"),
    ]
    for i in range(1, n_terms + 1):
        aggs.append(F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}"))
    row = doc_terms.agg(*aggs).collect()[0]
    n = int(row["n"])
    sum_dl = int(row["sum_dl"] or 0)
    return {
        "n_docs": n,
        "avgdl": (sum_dl / n) if n else 0.0,
        "df": [int(row[f"df{i}"]) for i in range(1, n_terms + 1)],
    }


def bm25_idf(n_docs: int, df: int) -> float:
    """Lucene-variant idf: ln(1 + (N − df + 0.5)/(df + 0.5)), always > 0.

    The op sequence (int subtract, +0.5, divide, 1.0+, log) is spelled
    identically in the oracle SQL so both engines run the same IEEE ops.
    """
    return math.log(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))


def _score_expr(
    terms: tuple[str, ...],
    stats: dict,
    k1: float,
    b: float,
) -> Column:
    """The zero-exchange scoring fold (see module doc for determinism)."""
    k1p1 = k1 + 1.0
    c0 = k1 * (1.0 - b)
    avgdl = stats["avgdl"]
    c1 = (k1 * b) / avgdl if avgdl else 0.0
    contribs = []
    for i in range(1, len(terms) + 1):
        idf = bm25_idf(stats["n_docs"], stats["df"][i - 1])
        tf = F.col(f"tf{i}")
        contribs.append(
            F.lit(idf)
            * ((tf * F.lit(k1p1)) / (tf + (F.lit(c0) + F.lit(c1) * F.col("dl"))))
        )
    expr = contribs[0]
    for c in contribs[1:]:
        expr = expr + c
    return expr


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...],
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25 score for a fixed query — (id, dl, bm25_tf, score).

    ``bm25_tf`` (total query-term occurrences) rides along because the
    decontamination caller wants it: score ranks, tf explains. A token-less
    document scores 0.0 (every contribution has tf = 0; the denominator's
    k1(1−b) term keeps it finite).
    """
    rel = bm25_doc_terms(docs, terms, text_col=text_col, id_col=id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stats = bm25_stats(rel, len(terms))
    tf_total = F.col("tf1")
    for i in range(2, len(terms) + 1):
        tf_total = tf_total + F.col(f"tf{i}")
    return rel.select(
        F.col(id_col),
        F.col("dl").cast("long").alias("dl"),
        tf_total.cast("long").alias("bm25_tf"),
        _score_expr(terms, stats, k1, b).alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k most relevant documents — the retrieval/decontamination probe.

    orderBy(score desc, id) + limit compiles to TakeOrderedAndProject:
    each partition keeps a k-row heap and only k rows ever cross the wire
    — no global sort at any corpus size. Ties break on id so the result
    is deterministic.
    """
    s = bm25_scores(docs, terms, k1=k1, b=b, text_col=text_col, id_col=id_col)
    return s.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bm25_gate_summary(docs: DataFrame) -> DataFrame:
    """Per-doc gate columns for q66: (doc_id, bm25_tf BIGINT, bm25_q r4).

    Runs the REAL bm25_scores path (narrow map → bounded stats collect →
    literal-folded scoring) for the fixed probe BM25_GATE_TERMS; the q66
    oracle re-derives N/avgdl/df/tf and the identical fold in SQL, so a
    hash match certifies the whole scoring pipeline, not a twin.
    """
    s = bm25_scores(docs, BM25_GATE_TERMS)
    return s.select("doc_id", "bm25_tf", r4(F.col("score")).alias("bm25_q"))


def bm25_gate_oracle_ctes() -> str:
    """DuckDB CTEs re-deriving the q66 bm25 columns from scratch.

    Interpolates the k1/b-derived constants via repr() — strtod's
    round-trip guarantee reproduces the exact Python doubles — and spells
    the idf/score expression with the same association order as
    _score_expr. The final SELECT's per-term sum is an explicit
    left-assoc ``+`` chain for the same reason _score_expr folds a list:
    float addition is order-sensitive and SUM() has no order contract.
    """
    k1, b = BM25_K1, BM25_B
    k1p1, c0, kb = repr(k1 + 1.0), repr(k1 * (1.0 - b)), repr(k1 * b)
    tf_cols = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(BM25_GATE_TERMS, start=1)
    )
    dfs = ",\n             ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(1, len(BM25_GATE_TERMS) + 1)
    )
    contribs = " + ".join(
        f"(ln(1.0 + ((n - df{i}) + 0.5) / (df{i} + 0.5))"
        f" * ((tf{i} * {k1p1}) / (tf{i} + ({c0} + ({kb} / avgdl) * dl))))"
        for i in range(1, len(BM25_GATE_TERMS) + 1)
    )
    tf_sum = " + ".join(f"tf{i}" for i in range(1, len(BM25_GATE_TERMS) + 1))
    return f"""
    bmdoc AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_cols}
      FROM (SELECT doc_id,
                   regexp_extract_all(lower(text), '{BM25_TOKEN_RE}') AS toks
            FROM documents)
    ),
    bmstat AS (
      SELECT count(*) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
             {dfs}
      FROM bmdoc
    ),
    bm AS (
      SELECT doc_id,
             CAST({tf_sum} AS BIGINT) AS bm25_tf,
             r4({contribs}) AS bm25_q
      FROM bmdoc CROSS JOIN bmstat
    )"""

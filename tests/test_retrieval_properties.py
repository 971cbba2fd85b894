"""Property tests (hypothesis) for the retrieval / sampling primitives:

- knuth_key is a bijection on [0, HASH_M) and matches its SQL fragment
  (pure-Python model) for arbitrary nonnegative BIGINTs;
- BM25 reference properties on synthetic corpora driven through the
  REAL Spark operator: permutation invariance (scores don't depend on
  row order), monotonicity in tf (adding one more occurrence of a query
  term — holding dl fixed by swapping out a filler token — never lowers
  the score), and zero scores exactly for term-free documents.

Spark calls stay small (each example is a handful of rows) but go
through bm25_scores itself, not a model of it.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from entangledb_spark.operators.text import HASH_M, SAMPLE_K, knuth_key_sql

_EXAMPLES = int(os.environ.get("ENTANGLE_FUZZ_EXAMPLES", "25"))


def _py_knuth_key(i: int) -> int:
    return ((i % HASH_M) * (SAMPLE_K % HASH_M)) % HASH_M


@given(st.integers(min_value=0, max_value=2**62))
@settings(max_examples=200, deadline=None)
def test_knuth_key_matches_sql_model(i):
    """The Python model == the SQL fragment's arithmetic, evaluated
    symbolically: the fragment is pure BIGINT ops, so evaluating its
    expression in Python integers IS the DuckDB result (no floats, no
    overflow below 2^62 by construction)."""
    expr = knuth_key_sql(str(i))
    # the fragment uses only % * and CAST(... AS BIGINT); strip casts and
    # evaluate as Python ints
    cleaned = expr.replace("CAST(", "(").replace("AS BIGINT", "")
    assert eval(cleaned) == _py_knuth_key(i)  # noqa: S307 - test-local arith


def test_knuth_key_is_bijective_on_prefix():
    """Multiplication by a unit mod the Mersenne prime permutes the
    residues: no collisions over a contiguous id range."""
    keys = {_py_knuth_key(i) for i in range(20_000)}
    assert len(keys) == 20_000


@st.composite
def corpora(draw):
    vocab = ["hash", "join", "stream", "filler", "pad", "noise"]
    n_docs = draw(st.integers(min_value=2, max_value=6))
    docs = []
    for i in range(n_docs):
        words = draw(
            st.lists(st.sampled_from(vocab), min_size=0, max_size=12)
        )
        docs.append((i, " ".join(words)))
    return docs


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpora(), st.permutations(range(6)))
def test_bm25_scores_are_row_order_invariant(spark, docs, perm):
    from entangledb_spark.operators.retrieval import bm25_scores

    terms = ("hash", "join")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = {r.doc_id: r.score for r in bm25_scores(df, terms).collect()}
    shuffled = [docs[p] for p in perm if p < len(docs)]
    df2 = spark.createDataFrame(shuffled, "doc_id long, text string")
    again = {r.doc_id: r.score for r in bm25_scores(df2, terms).collect()}
    assert base == again


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpora())
def test_bm25_zero_iff_term_free(spark, docs):
    from entangledb_spark.operators.retrieval import bm25_scores

    terms = ("hash", "join")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in bm25_scores(df, terms).collect()}
    for did, text in docs:
        has_term = any(t in text.split() for t in terms)
        if has_term:
            assert got[did].score > 0.0, (did, text)
        else:
            assert got[did].score == 0.0, (did, text)


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(corpora(), st.integers(min_value=0, max_value=5))
def test_bm25_swapping_filler_for_term_raises_score(spark, docs, which):
    """Replace one 'filler' token with 'hash' in one document (dl fixed,
    tf+1): that document's score must strictly increase. df('hash') may
    also rise, which lowers idf for everyone — so only the edited
    document's score is compared, and only when it already contained
    'hash' or the corpus df is unchanged... simplest sound property:
    tf monotonicity at FIXED corpus stats, checked by editing a doc that
    already contains 'hash' (df unchanged)."""
    from entangledb_spark.operators.retrieval import bm25_scores

    terms = ("hash",)
    target = None
    for did, text in docs:
        words = text.split()
        if "hash" in words and "filler" in words:
            target = (did, words)
            break
    if target is None:
        return  # example doesn't exercise the property
    did, words = target
    edited = list(words)
    edited[edited.index("filler")] = "hash"
    docs2 = [(d, " ".join(edited) if d == did else t) for d, t in docs]
    df1 = spark.createDataFrame(docs, "doc_id long, text string")
    df2 = spark.createDataFrame(docs2, "doc_id long, text string")
    s1 = {r.doc_id: r.score for r in bm25_scores(df1, terms).collect()}
    s2 = {r.doc_id: r.score for r in bm25_scores(df2, terms).collect()}
    assert s2[did] > s1[did]

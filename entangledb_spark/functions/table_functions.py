"""Table-valued function library for the SQL dialect (extension — the
reference's FROM accepts only table names, planner.rs:260-280).

These bridge the dialect to the persistent-index operators so a SQL
session can run retrieval end-to-end without leaving the engine:

    SELECT doc_id, score FROM bm25_topk('/path/to/index', 'query terms', 10);
    SELECT d.doc_id FROM docs d
      JOIN bm25_topk('/idx', 'benchmark item text', 10) h ON d.doc_id = h.doc_id;

Arguments are LITERAL constants (parser-enforced): a FROM-clause function
materializes before the query's frame exists, so column references could
never resolve. Each entry is name → (min_arity, max_arity, builder over
(spark, *literal_values)); builders raise ValueError on bad argument
types/values, which the compiler surfaces as CompileError — the dialect's
analysis-error class.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


def _bm25_topk(spark: SparkSession, index_dir, query, k=10) -> DataFrame:
    """Top-k BM25 against a prebuilt text index (text_index.build_text_index
    / bm25_topk_indexed — the identical scoring path the DataFrame surface
    uses, so SQL and DataFrame results cannot diverge). Columns:
    (doc_id, bm25_tf, score)."""
    from entangledb_spark.operators.text_index import bm25_topk_indexed

    if not isinstance(index_dir, str):
        raise ValueError("bm25_topk: index path must be a string literal")
    if not isinstance(query, str):
        raise ValueError("bm25_topk: query must be a string literal")
    if isinstance(k, bool) or not isinstance(k, int) or k < 1:
        raise ValueError("bm25_topk: k must be a positive integer literal")
    return bm25_topk_indexed(spark, index_dir, tuple(query.split()), k=k)


TABLE_FUNCS: dict[
    str, tuple[int, Optional[int], Callable[..., DataFrame]]
] = {
    "bm25_topk": (2, 3, _bm25_topk),
}

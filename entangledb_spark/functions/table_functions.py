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


def _ann_topk(spark: SparkSession, index_dir, vec, k=5) -> DataFrame:
    """Top-k ANN against a prebuilt persistent vector index (LSH, IVF, or
    IVF-PQ — dispatched on the index meta's kind, so one SQL spelling
    serves all three). ``vec`` is the query vector as a whitespace- or
    comma-separated numeric string literal ('0.12 -0.4 ...'); a single
    probe always takes the literal (zero-join) route. Columns:
    (neighbor_id, cos_sim, rk) for lsh/ivf; (neighbor_id, adc_dist, rk)
    for ivfpq — ADC is a DISTANCE (ascending), cosine a similarity."""
    import json
    import os

    from entangledb_spark.operators import ann_index
    from entangledb_spark.operators.index_commit import META_FILE

    if not isinstance(index_dir, str):
        raise ValueError("ann_topk: index path must be a string literal")
    if not isinstance(vec, str):
        raise ValueError(
            "ann_topk: query vector must be a numeric string literal "
            "('0.1 -0.4 ...')"
        )
    if isinstance(k, bool) or not isinstance(k, int) or k < 1:
        raise ValueError("ann_topk: k must be a positive integer literal")
    try:
        floats = [float(x) for x in vec.replace(",", " ").split()]
    except ValueError:
        raise ValueError(f"ann_topk: non-numeric component in vector {vec!r}")
    if not floats:
        raise ValueError("ann_topk: empty query vector")
    meta_path = os.path.join(index_dir, META_FILE)
    try:
        with open(meta_path) as f:
            kind = json.load(f).get("kind")
    except OSError:
        raise ValueError(f"ann_topk: no index meta at {meta_path}")
    probe = spark.createDataFrame(
        [(-1, floats)], "vec_id long, embedding array<float>"
    )
    if kind == "lsh":
        out = ann_index.probe_lsh_index(
            spark, index_dir, probe, k=k, exclude_self=False
        )
    elif kind == "ivf":
        out = ann_index.probe_ivf_index(
            spark, index_dir, probe, k=k, exclude_self=False
        ).drop("cell")
    elif kind == "ivfpq":
        return ann_index.probe_ivfpq_index(
            spark, index_dir, probe, k=k, exclude_self=False, route="literal"
        ).select("neighbor_id", "adc_dist", "rk")
    else:
        raise ValueError(f"ann_topk: unsupported index kind {kind!r}")
    return out.select("neighbor_id", "cos_sim", "rk")


TABLE_FUNCS: dict[
    str, tuple[int, Optional[int], Callable[..., DataFrame]]
] = {
    "bm25_topk": (2, 3, _bm25_topk),
    "ann_topk": (2, 3, _ann_topk),
}

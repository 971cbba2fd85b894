"""Mergeable sketches for corpus-scale statistics (beyond parity — the
reference has no approximate aggregates at all; its only aggregates are
COUNT/MIN/MAX/SUM/AVG, src/sql/execution/aggregation.rs).

The pattern that matters at 100 TB: compute a compact SKETCH per shard /
dataset / partition ONCE (one pass over the data), persist the sketches
(kilobytes), then answer cross-shard questions by MERGING sketches —
never by re-scanning the corpus. Spark 3.5+ ships Apache DataSketches
HLL built-ins (JVM-side, whole-stage codegen), so both phases are plain
aggregates:

- distinct_sketch:  groupBy(keys).agg(hll_sketch_agg(col)) → binary state
- merge_distinct:   groupBy(fewer keys).agg(hll_union_agg(state))
- estimate:         hll_sketch_estimate(state) → bigint

Typical uses in a training-data pipeline: per-source vocabulary /
document-id cardinality (union across crawls without rescanning),
dedup-rate estimation between dataset versions (|A| + |B| vs |A ∪ B|),
and per-language token diversity — all O(sketch bytes) after the first
pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lgConfigK=12 → 4 KiB sketches, ~1.6% relative standard error — the
# DataSketches default; raise for tighter error at 2× size per +1.
LG_K = 12


def distinct_sketch(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """One HLL sketch per group: a single map-side-combined aggregation
    pass; output is (group_cols..., sketch binary). The sketch column is
    mergeable state — persist it and never rescan this shard."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(LG_K)).alias("sketch")
    )


def merge_distinct(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Combine per-shard sketches to coarser groups (or pass group_cols=[]
    for a global union). Input rows are sketches, not data — this shuffles
    kilobytes regardless of corpus size."""
    agg = F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("sketch")
    if not group_cols:
        return sketches.agg(agg)
    return sketches.groupBy(*group_cols).agg(agg)


def estimate(sketch: Column | str) -> Column:
    """Distinct-count estimate from sketch state (bigint)."""
    col = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(col)


def overlap_estimate(
    df_a: DataFrame, df_b: DataFrame, value_col: str
) -> DataFrame:
    """Estimated overlap between two datasets by inclusion–exclusion:
    |A ∩ B| ≈ |A| + |B| − |A ∪ B|, all three from sketches — the cheap
    first-pass answer to "how much of B is already in A?" before running
    exact/LSH dedup. One pass over each side, then constant-size math."""
    sa = df_a.agg(F.hll_sketch_agg(F.col(value_col), F.lit(LG_K)).alias("s"))
    sb = df_b.agg(F.hll_sketch_agg(F.col(value_col), F.lit(LG_K)).alias("s"))
    both = sa.unionAll(sb).agg(F.hll_union_agg(F.col("s"), F.lit(True)).alias("s"))
    a = sa.select(F.hll_sketch_estimate("s").alias("n_a"))
    b = sb.select(F.hll_sketch_estimate("s").alias("n_b"))
    u = both.select(F.hll_sketch_estimate("s").alias("n_union"))
    return (
        a.crossJoin(b)
        .crossJoin(u)
        .select(
            "n_a",
            "n_b",
            "n_union",
            F.greatest(F.col("n_a") + F.col("n_b") - F.col("n_union"), F.lit(0)).alias(
                "n_overlap_est"
            ),
        )
    )


def heavy_hitters_sketch(
    df: DataFrame, value_col: str, eps: float = 0.001, confidence: float = 0.99
) -> DataFrame:
    """Count–min sketch of a column's value frequencies: mergeable state
    for approximate heavy-hitter queries (which tokens/domains dominate a
    shard) without a full groupBy. Returns one binary sketch row; combine
    shards by re-aggregating raw data or keep per-shard sketches and probe
    with the DataSketches library off-line."""
    return df.agg(
        F.count_min_sketch(
            F.col(value_col), F.lit(eps), F.lit(confidence), F.lit(42)
        ).alias("cms")
    )

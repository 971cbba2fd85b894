"""Skew- and shuffle-management utilities for 100 TB joins.

Three tools, complementing AQE (which is ON in the engine session and
handles moderate skew automatically via skew-join splitting):

- `salted_join`: explicit key salting for pathological hot keys — the left
  (large, skewed) side scatters each key across `n_salts` sub-keys; the
  right side is replicated once per salt. Turns one executor-killing
  partition into n evenly-sized ones at the cost of an n× blow-up of the
  (small) right side.
- `write_bucketed` / `bucketed_join_ready`: bucket both sides of a
  recurring join key at write time so the join is co-located — zero
  Exchange in the physical plan, the single biggest win for repeated
  fact-fact joins at scale.
- `key_histogram`: cheap skew diagnosis (top-k key frequencies) to decide
  between AQE, salting, and bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Top-k heaviest keys with their share of rows — run this before
    choosing a skew strategy. One map-side-combined aggregation."""
    total = df.count()
    return (
        df.groupBy(key)
        .count()
        .withColumn("share", F.col("count") / F.lit(total))
        .orderBy(F.col("count").desc())
        .limit(top)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for a skewed LEFT side.

    left rows get salt = hash(key-bytes) spread via a uniform per-row draw;
    right rows are replicated across all salts (explode of a small
    literal array — the right side should be the smaller input). Result
    equals the plain join exactly; only the partitioning changes.
    """
    salt = F.floor(F.rand(seed=42) * n_salts).cast("int")
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l_s.join(
        r_s,
        (l_s[left_key] == r_s[right_key]) & (l_s["__salt"] == r_s["__salt"]),
        how,
    )
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16
) -> None:
    """Persist a table bucketed (and sorted) by its join key. Joins between
    two tables bucketed the same way need no shuffle at all."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join_ready(spark: SparkSession, a: str, b: str, a_key: str, b_key: str) -> DataFrame:
    """Join two pre-bucketed tables; with matching bucketing Spark plans a
    SortMergeJoin with NO Exchange on either side."""
    return spark.table(a).join(
        spark.table(b), F.col(a_key) == F.col(b_key), "inner"
    )

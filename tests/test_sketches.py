"""Mergeable HLL / count-min sketches: per-shard partials must merge to
the same answer as a single global sketch, and estimates must sit within
the configured error of exact counts at fixture scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entangledb_spark.functions.sketches import (
    distinct_sketch,
    estimate,
    heavy_hitters_sketch,
    merge_distinct,
    overlap_estimate,
)
from entangledb_spark.registry import table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF, "documents")


def test_estimate_close_to_exact(spark, docs):
    exact = docs.select("doc_id").distinct().count()
    est = (
        merge_distinct(distinct_sketch(docs, ["lang"], "doc_id"), [])
        .select(estimate("sketch").alias("n"))
        .first()["n"]
    )
    assert abs(est - exact) / exact < 0.05


def test_shard_merge_equals_global(spark, docs):
    # sketch per lang shard, then union-merge == one global sketch
    per_shard = distinct_sketch(docs, ["lang"], "doc_id")
    merged = (
        merge_distinct(per_shard, [])
        .select(estimate("sketch").alias("n"))
        .first()["n"]
    )
    direct = (
        docs.agg(F.hll_sketch_agg("doc_id", F.lit(12)).alias("sketch"))
        .select(estimate("sketch").alias("n"))
        .first()["n"]
    )
    # union of shard sketches ≈ single global sketch (not bit-identical:
    # the union path may flip sparse→dense mode at different points)
    assert abs(merged - direct) / direct < 0.02


def test_overlap_inclusion_exclusion(spark, docs):
    # A = docs 0..N/2, B = docs N/4..N — known overlap N/4
    n = docs.count()
    a = docs.filter(F.col("doc_id") < n // 2)
    b = docs.filter(F.col("doc_id") >= n // 4)
    r = overlap_estimate(a, b, "doc_id").first()
    true_overlap = n // 2 - n // 4
    assert abs(r["n_overlap_est"] - true_overlap) / max(true_overlap, 1) < 0.15
    assert r["n_union"] >= max(r["n_a"], r["n_b"])


def test_heavy_hitters_sketch_binary(spark, docs):
    row = heavy_hitters_sketch(docs, "lang").first()
    assert row["cms"] is not None and len(bytes(row["cms"])) > 0

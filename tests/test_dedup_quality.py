"""Quantitative quality gate for the rows-only dedup queries: the
MinHash+LSH banded candidates (q62) must achieve high recall against the
exact SHINGLE-set Jaccard ground truth (unsampled, full self-join) at
fixture scale — this is the correctness argument for the seeded-hash
pipeline the DuckDB oracle can't express.

Ground truth uses word-shingle sets (SHINGLE_N, same unit the MinHash
signature hashes): that is the quantity MinHash estimates and LSH banding
must recover. Token-set Jaccard would be the wrong yardstick here — on a
synthetic corpus drawn from a small vocabulary, almost every document
pair shares most distinct WORDS (≈91k of 125k pairs exceed 0.5) while
only genuinely near-duplicate pairs share word SEQUENCES (28 pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entangledb_spark.operators.dedup import SHINGLE_N, word_tokens
from entangledb_spark.registry import QUERIES, load_all, table

load_all()

SF = "/root/testdata/sf0.001"
JACCARD_THRESHOLD = 0.5
MIN_RECALL = 0.9


def exact_shingle_jaccard_pairs(spark, sf_dir: str) -> set[tuple[int, int]]:
    """All (a, b) doc pairs with shingle-set Jaccard >= threshold — full
    self-join, no sampling, no banding: the ground truth."""
    d = table(spark, sf_dir, "documents")
    toks = word_tokens(F.col("text"))
    shingles = (
        d.withColumn("_t", toks)
        .withColumn(
            "sh",
            F.when(
                F.size("_t") >= SHINGLE_N,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size("_t") - SHINGLE_N),
                        lambda i: F.concat_ws(" ", F.slice("_t", i + 1, SHINGLE_N)),
                    )
                ),
            ).otherwise(F.array(F.concat_ws(" ", "_t"))),
        )
        .select("doc_id", F.explode("sh").alias("w"))
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    pairs = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("shared"))
    out = (
        pairs.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("da"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("db"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("da", "db")
        .collect()
    )
    return {(r.da, r.db) for r in out}


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    truth = exact_shingle_jaccard_pairs(spark, SF)
    assert truth, "fixture should contain planted near-duplicates"
    cands = {
        (r.doc_a, r.doc_b) for r in QUERIES["q62_dedup_minhash_lsh"](spark, SF).collect()
    }
    recall = len(truth & cands) / len(truth)
    assert recall >= MIN_RECALL, (
        f"LSH banding recall {recall:.2f} < {MIN_RECALL} ({len(truth)} true pairs)"
    )

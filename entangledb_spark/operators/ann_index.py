"""Persistent ANN index: build once, probe many.

The inline LSH path (similarity.ann_lsh_bucketed) recomputes every
vector's bucket codes per query run — right for a one-shot batch job,
wrong for a serving/repeated-probe workload over a 100 TB corpus. This
module splits the pipeline the way a production vector store does:

- **build_lsh_index**: one distributed pass computes each vector's
  sign-LSH bucket per hash table and writes the index as parquet
  PARTITIONED BY (tbl, bucket) — the bucket id is encoded in the
  directory layout, so probes touch only their buckets' files (partition
  pruning at the source, before any I/O).
- **probe_lsh_index**: computes bucket codes for the (small) probe set
  only, equi-joins against the index on the partition columns, and
  exact-cosine re-ranks the candidates to top-k. Probe cost is
  O(|probes| · bucket_size), independent of corpus size.

Incremental maintenance is append-only: new corpus vectors bucket into
the same deterministic (seeded-hash) codes and land as new files in
existing partitions — no global rebuild, no RNG state to version.

The IVF variant (build_ivf_index / probe_ivf_index) persists BOTH the
centroid table and the cell-partitioned assignments; probes route through
the saved centroids so cell boundaries never shift under appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from entangledb_spark.functions.numeric import r4
from entangledb_spark.operators.similarity import (
    N_HYPERPLANES,
    N_LSH_TABLES,
    cosine_sim,
    srp_bucket,
)


def _with_buckets(
    df: DataFrame, n_tables: int, n_planes: int
) -> DataFrame:
    """(vec_id, embedding) → one row per (vec_id, tbl, bucket)."""
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                srp_bucket(F.col("embedding"), n_planes=n_planes, table_seed=t).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    return df.select("vec_id", "embedding", F.explode(buckets).alias("tb")).select(
        "vec_id", "embedding", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket")
    )


def build_lsh_index(
    embeddings: DataFrame,
    index_dir: str,
    n_tables: int = N_LSH_TABLES,
    n_planes: int = N_HYPERPLANES,
    mode: str = "overwrite",
) -> None:
    """One distributed pass: codegen'd bucket computation (no shuffle for
    the codes — the only exchange is the partitioned write's file routing),
    then parquet partitioned by (tbl, bucket). Pass mode='append' to add
    new vectors incrementally — deterministic seeds keep codes stable."""
    _with_buckets(embeddings, n_tables, n_planes).write.mode(mode).partitionBy(
        "tbl", "bucket"
    ).parquet(index_dir)


def probe_lsh_index(
    spark: SparkSession,
    index_dir: str,
    probes: DataFrame,
    k: int = 5,
    n_tables: int = N_LSH_TABLES,
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Top-k ANN for each probe against a prebuilt index.

    Probe-side codes are recomputed (tiny); the join on the index's
    PARTITION columns (tbl, bucket) lets the source prune to the touched
    buckets. Candidates sharing a bucket in ANY table are deduped, then
    exact cosine re-ranks — identical semantics (and results) to the
    inline ann_lsh_bucketed, at probe-proportional cost."""
    idx = spark.read.parquet(index_dir).alias("n")
    q = _with_buckets(probes, n_tables, n_planes).alias("q")
    cands = (
        q.join(
            idx,
            (F.col("q.tbl") == F.col("n.tbl"))
            & (F.col("q.bucket") == F.col("n.bucket"))
            & (F.col("q.vec_id") != F.col("n.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("n.vec_id").alias("neighbor_id"),
            F.col("q.embedding").alias("q_emb"),
            F.col("n.embedding").alias("n_emb"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("cos_sim", r4(cosine_sim(F.col("q_emb"), F.col("n_emb"))))
        .drop("q_emb", "n_emb")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def _ivf_centroids(e: DataFrame, n_cells: int) -> DataFrame:
    """Deterministic medoid centroids, identical to similarity.ann_ivf:
    per cell (xxhash64(vec_id) mod n_cells), the lowest-vec_id member."""
    cell_of = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_cells))
    w = Window.partitionBy("cell").orderBy("vec_id")
    return (
        e.withColumn("cell", cell_of)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("cell", F.col("embedding").alias("centroid"))
    )


def _assign_cells(df: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment via a broadcast of the tiny centroid
    table — one narrow pass, no corpus shuffle."""
    w = Window.partitionBy("vec_id").orderBy(F.col("dist"), F.col("cell"))
    return (
        df.crossJoin(F.broadcast(centroids))
        .withColumn("dist", -cosine_sim(F.col("embedding"), F.col("centroid")))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "embedding", "cell")
    )


def build_ivf_index(
    embeddings: DataFrame, index_dir: str, n_cells: int = 16
) -> None:
    """IVF index build: centroids persisted under <dir>/centroids, cell
    assignments under <dir>/cells PARTITIONED BY cell — probes read one
    cell's files, pruned at the source. (Unlike LSH, IVF appends must
    reuse the SAVED centroids or cell boundaries shift — probe-side code
    reads them back for exactly that reason.)"""
    cents = _ivf_centroids(embeddings, n_cells)
    cents.coalesce(1).write.mode("overwrite").parquet(f"{index_dir}/centroids")
    spark = embeddings.sparkSession
    saved = spark.read.parquet(f"{index_dir}/centroids")
    _assign_cells(embeddings, saved).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{index_dir}/cells")


def probe_ivf_index(
    spark: SparkSession, index_dir: str, probes: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k ANN against a prebuilt IVF index: probes route through the
    SAVED centroids (broadcast), candidates equi-join on the cell
    partition column, exact cosine re-ranks. Identical semantics to the
    inline similarity.ann_ivf."""
    cents = spark.read.parquet(f"{index_dir}/centroids")
    q = _assign_cells(probes, cents).alias("q")
    n = spark.read.parquet(f"{index_dir}/cells").alias("n")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        q.join(
            n,
            (F.col("q.cell") == F.col("n.cell"))
            & (F.col("q.vec_id") != F.col("n.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("n.vec_id").alias("neighbor_id"),
            F.col("q.cell").alias("cell"),
            r4(cosine_sim(F.col("q.embedding"), F.col("n.embedding"))).alias(
                "cos_sim"
            ),
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )

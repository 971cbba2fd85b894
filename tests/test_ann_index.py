"""Persistent LSH index (operators/ann_index.py): probe results must be
IDENTICAL to the inline ann_lsh_bucketed pipeline; the on-disk layout must
be partitioned by (tbl, bucket); incremental append must extend candidate
sets without a rebuild."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from entangledb_spark.operators.ann_index import build_lsh_index, probe_lsh_index
from entangledb_spark.operators.similarity import ann_lsh_bucketed
from entangledb_spark.registry import table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return table(spark, SF, "embeddings").select("vec_id", "embedding")


def test_probe_matches_inline_pipeline(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    build_lsh_index(_emb(spark), idx)
    probes = _emb(spark).filter(F.col("vec_id") < 20)
    got = sorted(
        tuple(r) for r in probe_lsh_index(spark, idx, probes).collect()
    )
    want = sorted(tuple(r) for r in ann_lsh_bucketed(spark, SF).collect())
    assert got == want and len(got) > 0


def test_q71_lsh_branch_routes_through_index(spark):
    """q71's 'lsh' branch must run via the persistent index (round-4 ask:
    the index machinery gains driver-gate evidence) AND stay row-identical
    to the inline path AT THE SAME PRIMITIVE — since round 10 the gate
    runs the md5 twin hyperplanes (DuckDB-oracle lineage), so the inline
    comparison pins sign='md5' on both sides."""
    from entangledb_spark.operators.similarity import (
        _LSH_INDEX_CACHE,
        ann_lsh_indexed,
        q71_ann_scalable,
    )

    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rk"])
        for r in q71_ann_scalable(spark, SF).filter(F.col("method") == "lsh").collect()
    )
    want = sorted(tuple(r) for r in ann_lsh_bucketed(spark, SF, sign="md5").collect())
    assert got == want and len(got) > 0
    # the route actually went through a built index dir
    assert (SF, "md5") in _LSH_INDEX_CACHE
    assert os.path.exists(
        os.path.join(_LSH_INDEX_CACHE[(SF, "md5")], "_index_meta.json")
    )
    # and the cached index is reused, not rebuilt (same dir on second call)
    first_dir = _LSH_INDEX_CACHE[(SF, "md5")]
    ann_lsh_indexed(spark, SF, sign="md5").count()
    assert _LSH_INDEX_CACHE[(SF, "md5")] == first_dir


def test_probe_external_id_space_exclude_self_flag(spark, tmp_path):
    """exclude_self (default True) assumes probe and index share one id
    space. For an EXTERNAL probe set, a coincidental id collision must
    not drop the true nearest neighbor: probing with vec_id=0 carrying
    corpus-vector-0's own embedding, exclude_self=False must return
    neighbor 0 at cos≈1.0 rank 1, while the default excludes it."""
    idx = str(tmp_path / "lsh_index")
    build_lsh_index(_emb(spark), idx)
    v0 = _emb(spark).filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    probe = spark.createDataFrame([(0, v0)], "vec_id long, embedding array<double>")
    incl = probe_lsh_index(spark, idx, probe, exclude_self=False).collect()
    top = [r for r in incl if r["rk"] == 1][0]
    assert top["neighbor_id"] == 0 and top["cos_sim"] >= 0.9999
    excl = probe_lsh_index(spark, idx, probe).collect()
    assert all(r["neighbor_id"] != 0 for r in excl)


def test_index_layout_is_partition_pruned(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    build_lsh_index(_emb(spark), idx)
    bdir = os.path.join(idx, "buckets")
    tbl_dirs = [d for d in os.listdir(bdir) if d.startswith("tbl=")]
    assert len(tbl_dirs) > 1
    buckets = [
        d for d in os.listdir(os.path.join(bdir, tbl_dirs[0])) if d.startswith("bucket=")
    ]
    assert len(buckets) > 1
    # a single-bucket probe plan reads only that bucket's partition
    one = spark.read.parquet(bdir).filter((F.col("tbl") == 0) & (F.col("bucket") == int(buckets[0].split("=")[1])))
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_probe_join_dynamic_partition_pruning(spark, tmp_path):
    """The probe join itself must prune index partitions at the source:
    the tiny probe side broadcasts, and Spark injects a
    dynamicpruningexpression on the index scan's (tbl, bucket) partition
    columns — probes read only the files of buckets they actually touch,
    the property that makes probe cost corpus-size-independent. A
    regression to a full index scan would still return correct rows, so
    only this plan assertion catches it."""
    idx = str(tmp_path / "lsh_index")
    build_lsh_index(_emb(spark), idx)
    probes = _emb(spark).filter(F.col("vec_id") < 20)
    plan = (
        probe_lsh_index(spark, idx, probes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # IVF probes get the same treatment on their cell partition column
    from entangledb_spark.operators.ann_index import build_ivf_index, probe_ivf_index
    from entangledb_spark.operators.similarity import N_IVF_CELLS

    ividx = str(tmp_path / "ivf_index")
    build_ivf_index(_emb(spark), ividx, n_cells=N_IVF_CELLS)
    iplan = (
        probe_ivf_index(spark, ividx, probes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in iplan, iplan


def test_incremental_append(spark, tmp_path):
    idx = str(tmp_path / "lsh_index")
    e = _emb(spark)
    first = e.filter(F.col("vec_id") % 2 == 0)
    rest = e.filter(F.col("vec_id") % 2 == 1)
    build_lsh_index(first, idx)
    probes = e.filter(F.col("vec_id") < 20)
    n_before = probe_lsh_index(spark, idx, probes).count()
    build_lsh_index(rest, idx, mode="append")
    after = sorted(tuple(r) for r in probe_lsh_index(spark, idx, probes).collect())
    want = sorted(tuple(r) for r in ann_lsh_bucketed(spark, SF).collect())
    # full index after append == single-shot build == inline pipeline
    assert after == want
    assert len(after) >= n_before


def test_ivf_probe_matches_inline_pipeline(spark, tmp_path):
    from entangledb_spark.operators.ann_index import build_ivf_index, probe_ivf_index
    from entangledb_spark.operators.similarity import N_IVF_CELLS, ann_ivf

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(_emb(spark), idx, n_cells=N_IVF_CELLS)
    probes = _emb(spark).filter(F.col("vec_id") < 20)
    got = sorted(tuple(r) for r in probe_ivf_index(spark, idx, probes).collect())
    want = sorted(tuple(r) for r in ann_ivf(spark, SF).collect())
    assert got == want and len(got) > 0
    # cell-partitioned layout on disk
    cells = [d for d in os.listdir(os.path.join(idx, "cells")) if d.startswith("cell=")]
    assert len(cells) > 1


def test_index_params_are_persisted_and_enforced(spark, tmp_path):
    import pytest

    from entangledb_spark.operators.ann_index import build_ivf_index, probe_ivf_index

    idx = str(tmp_path / "lsh_small")
    e = _emb(spark).filter(F.col("vec_id") < 60)
    build_lsh_index(e, idx, n_tables=2, n_planes=3)
    probes = e.filter(F.col("vec_id") < 5)
    # probe uses the SAVED params — no way to pass mismatched ones
    assert probe_lsh_index(spark, idx, probes).count() >= 0
    # append with a different hash family is refused outright
    with pytest.raises(ValueError, match="n_planes=4"):
        build_lsh_index(e, idx, n_tables=2, n_planes=4, mode="append")
    # probing an LSH dir as IVF (or a non-index dir) fails loudly
    with pytest.raises(ValueError, match="kind"):
        probe_ivf_index(spark, idx, probes)
    with pytest.raises(ValueError, match="not a built index"):
        probe_lsh_index(spark, str(tmp_path / "nope"), probes)


def test_lsh_and_ivf_probes_are_already_bulk_capable(spark, tmp_path):
    """probe_lsh_index and probe_ivf_index never collect the probe set —
    probe codes/cells are computed as column expressions and joined, so
    their plan size is independent of the probe count (only the IVF-PQ
    probe needed a dedicated bulk route; these two ARE their own).
    Pinned here so a future change can't quietly introduce a per-probe
    driver compile."""
    from entangledb_spark.operators.ann_index import build_ivf_index, probe_ivf_index

    e = _emb(spark)
    lsh = str(tmp_path / "lsh_bulk")
    ivf = str(tmp_path / "ivf_bulk")
    build_lsh_index(e, lsh)
    build_ivf_index(e, ivf, n_cells=8)

    def plan_len(fn, idx, n):
        df = fn(spark, idx, e.filter(F.col("vec_id") < n), k=3)
        return len(df._jdf.queryExecution().executedPlan().toString())

    for fn, idx in ((probe_lsh_index, lsh), (probe_ivf_index, ivf)):
        p4, p400 = plan_len(fn, idx, 4), plan_len(fn, idx, 400)
        assert p400 < p4 + 500, (fn.__name__, p4, p400)


def test_prepared_probe_rows_match_spark_route(spark, tmp_path):
    """The round-12 prepared-probe path (probe_ivfpq_index(probe_rows=...))
    must be BIT-identical to the Spark-evaluated probe route: same unit
    vectors (unit_vec_local vs _unit_embedding_expr, asserted with ==, no
    tolerance), same cell routing (ivf_assign_local vs the literal fold),
    and therefore the same literal plan text and result rows. IEEE doubles
    make +, *, / and sqrt correctly rounded in both runtimes, so equality
    is the contract, not an approximation."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )
    from entangledb_spark.operators.similarity import (
        _unit_embedding_expr,
        _unit_probe_rows_local,
        ivf_assign,
        ivf_assign_local,
        unit_vec_local,
    )

    e = _emb(spark)

    def _unit(df):
        return df.select("vec_id", _unit_embedding_expr().alias("embedding"))

    # 1. unit normalization: local twin == Spark expression, bit for bit
    spark_units = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in _unit(e.filter(F.col("vec_id") < 20)).collect()
    }
    local_units = dict(_unit_probe_rows_local(SF))
    assert spark_units == local_units

    # 2. cell routing: local twin == the literal-route assignment
    idx = str(tmp_path / "ivfpq_prepared")
    build_ivfpq_index(_unit(e), idx, n_cells=8, m=4, ksub=16, pq_refine=1)
    cents = spark.read.parquet(f"{idx}/centroids").collect()
    probes_df = _unit(e.filter(F.col("vec_id") < 20))
    want_cells = {
        (int(r.vec_id), int(r.cell))
        for r in ivf_assign(probes_df, cents, nprobe=2).collect()
    }
    got_cells = {
        (pid, c)
        for pid, _, pcells in ivf_assign_local(
            sorted(local_units.items()), cents, nprobe=2
        )
        for c in pcells
    }
    assert got_cells == want_cells

    # 3. end to end: identical result rows, prepared vs collect route
    kw = dict(k=5, nprobe=2, rerank_with=_unit(e), shortlist=1_000_000)
    a = probe_ivfpq_index(spark, idx, probes_df, n_probes=20, **kw)
    b = probe_ivfpq_index(
        spark, idx, None, probe_rows=sorted(local_units.items()), **kw
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    # 4. guardrails: bulk route and over-ceiling prepared sets are rejected
    import pytest

    with pytest.raises(ValueError, match="bulk"):
        probe_ivfpq_index(
            spark, idx, None, probe_rows=[(1, [0.5, 0.5])], route="bulk"
        )
    with pytest.raises(ValueError, match="PROBE_LITERAL_MAX"):
        probe_ivfpq_index(
            spark, idx, None, probe_rows=[(i, [0.5, 0.5]) for i in range(40)]
        )

    # 5. zero-norm probe rows force the caller fallback (unit_vec_local
    # refuses rather than replicate Spark's division-by-zero semantics)
    assert unit_vec_local([0.0, 0.0]) is None

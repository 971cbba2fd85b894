"""Product quantization (operators/pq.py): encode == pure-Python
reference, Lloyd refinement reduces quantization error, ADC == exact
distance to the reconstructed vector, recall floors vs brute-force
cosine, literal/arrow route equivalence, plan shapes."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.pq import (
    pq_adc_rerank_topk,
    pq_adc_topk,
    pq_encode,
    pq_train,
)

SF = "/root/testdata/sf0.001"


def _emb(spark, sf=SF):
    return spark.read.parquet(f"{sf}/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )


@pytest.fixture(scope="module")
def fixture(spark):
    df = _emb(spark)
    x = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    model = pq_train(df, m=4, ksub=16, refine=2)
    return df, x, model


def _ref_codes(x: np.ndarray, model: dict) -> list[int]:
    """Pure-Python encode: per subspace, (dist, code)-min over the
    codebook — the tie order both Spark routes implement."""
    m, dsub = model["m"], model["dsub"]
    out = []
    for j in range(m):
        xj = x[j * dsub : (j + 1) * dsub]
        best = min(
            (float(np.sum((xj - np.array(cent)) ** 2)), code)
            for code, cent in model["codebooks"][j]
        )
        out.append(best[1])
    return out


def _reconstruct(codes: list[int], model: dict) -> np.ndarray:
    cents = []
    for j, c in enumerate(codes):
        cents.append(np.array(dict(model["codebooks"][j])[c]))
    return np.concatenate(cents)


def test_encode_matches_reference(spark, fixture):
    df, x, model = fixture
    got = {r.vec_id: list(r.pq_code) for r in pq_encode(df, model).collect()}
    for vid, vec in x.items():
        assert got[vid] == _ref_codes(vec, model), vid


def test_encode_routes_agree_and_preserve_columns(spark, fixture):
    df, _, model = fixture
    wide = df.withColumn("payload", F.col("vec_id") * 10)
    lit = {r.vec_id: (list(r.pq_code), r.payload) for r in
           pq_encode(wide, model, route="literal").collect()}
    arw = {r.vec_id: (list(r.pq_code), r.payload) for r in
           pq_encode(wide, model, route="arrow").collect()}
    assert lit == arw
    assert all(p == vid * 10 for vid, (_, p) in lit.items())


def test_refinement_reduces_quantization_error(spark):
    """Lloyd rounds must not increase the mean squared reconstruction
    error (k-means' monotonicity, up to the r6 grid's 1e-6 snap)."""
    df = _emb(spark)
    x = {r.vec_id: np.array(r.embedding) for r in df.collect()}

    def mse(model):
        got = {r.vec_id: list(r.pq_code) for r in pq_encode(df, model).collect()}
        return float(
            np.mean(
                [np.sum((x[v] - _reconstruct(c, model)) ** 2) for v, c in got.items()]
            )
        )

    m0 = mse(pq_train(df, m=4, ksub=16, refine=0))
    m1 = mse(pq_train(df, m=4, ksub=16, refine=1))
    m2 = mse(pq_train(df, m=4, ksub=16, refine=2))
    assert m1 <= m0 + 1e-6
    assert m2 <= m1 + 1e-6
    assert m2 < m0  # and the training genuinely moves


def test_adc_equals_exact_distance_to_reconstruction(spark, fixture):
    df, x, model = fixture
    coded = pq_encode(df, model)
    probe_rows = df.filter(F.col("vec_id") < 3)
    got = pq_adc_topk(coded, model, probe_rows, k=5).collect()
    assert {r.probe_id for r in got} == {0, 1, 2}
    codes = {r.vec_id: list(r.pq_code) for r in coded.collect()}
    for r in got:
        want = float(np.sum((x[r.probe_id] - _reconstruct(codes[r.vec_id], model)) ** 2))
        assert abs(r.adc_dist - want) < 1e-9, (r.probe_id, r.vec_id)


def test_adc_topk_is_true_topk_and_deterministic(spark, fixture):
    df, x, model = fixture
    coded = pq_encode(df, model)
    codes = {r.vec_id: list(r.pq_code) for r in coded.collect()}
    got = pq_adc_topk(coded, model, df.filter(F.col("vec_id") == 1), k=8).collect()
    assert [r.rk for r in sorted(got, key=lambda r: r.rk)] == list(range(1, 9))
    # reference ranking: (adc, vec_id) over the whole corpus
    ref = sorted(
        (float(np.sum((x[1] - _reconstruct(c, model)) ** 2)), v)
        for v, c in codes.items()
    )[:8]
    assert [r.vec_id for r in sorted(got, key=lambda r: r.rk)] == [v for _, v in ref]


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_pq_recall_floor_vs_bruteforce(spark, sf):
    """Recall@10 floors vs exact L2 on unit-normalized embeddings, at
    both stages: raw ADC >= 0.3 (this synthetic fixture is near-random
    64-d — quantization error genuinely swamps neighbor margins, so raw
    ADC recall is structurally low here; measured 0.38/0.44) and the
    two-stage ADC-shortlist + exact-rerank >= 0.7 (measured 0.82/0.88
    at shortlist=100 — rerank recall IS shortlist coverage, the
    production operating point)."""
    df = _emb(spark, sf)
    unit = df.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x
            / F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda y: y * y),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
            ),
        ).alias("embedding"),
    )
    model = pq_train(unit, m=4, ksub=16, refine=2)
    coded = pq_encode(unit, model)
    probes = unit.filter(F.col("vec_id") < 5)
    x = {r.vec_id: np.array(r.embedding) for r in unit.collect()}
    want = {
        pid: {
            vid
            for _, vid in sorted(
                (float(np.sum((x[pid] - v) ** 2)), vid) for vid, v in x.items()
            )[:10]
        }
        for pid in range(5)
    }

    def mean_recall(result_df):
        byp = {
            pid: {r.vec_id for r in rows}
            for pid, rows in _group(result_df.collect(), "probe_id").items()
        }
        return sum(len(byp[p] & want[p]) / 10 for p in range(5)) / 5

    raw = mean_recall(pq_adc_topk(coded, model, probes, k=10))
    rr = mean_recall(
        pq_adc_rerank_topk(coded, model, probes, k=10, shortlist=100)
    )
    print(f"pq recall@10 {sf}: raw={raw:.2f} rerank={rr:.2f}")
    assert raw >= 0.3, raw
    assert rr >= 0.7, rr
    assert rr >= raw  # rerank can only help


def test_rerank_with_full_shortlist_is_exact(spark, fixture):
    """shortlist = corpus size makes the two-stage search EXACT — the
    rerank stage degenerates to brute force, pinning its math."""
    df, x, model = fixture
    coded = pq_encode(df, model)
    n = df.count()
    got = pq_adc_rerank_topk(
        coded, model, df.filter(F.col("vec_id") == 2), k=6, shortlist=n
    ).collect()
    ref = sorted(
        (float(np.sum((x[2] - v) ** 2)), vid) for vid, v in x.items()
    )[:6]
    assert [r.vec_id for r in sorted(got, key=lambda r: r.rk)] == [v for _, v in ref]
    for r in got:
        want = float(np.sum((x[2] - x[r.vec_id]) ** 2))
        assert abs(r.exact_dist - want) < 1e-9


def _group(rows, key):
    out: dict = {}
    for r in rows:
        out.setdefault(getattr(r, key), []).append(r)
    return out


def test_encode_plan_zero_exchange_no_python(spark, fixture):
    df, _, model = fixture
    plan = (
        pq_encode(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan


def test_adc_plan_single_window_no_join(spark, fixture):
    df, _, model = fixture
    coded = pq_encode(df, model)
    plan = (
        pq_adc_topk(coded, model, df.filter(F.col("vec_id") < 3), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan  # LUTs are literals, not a join
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_dim_not_divisible_raises(spark):
    df = _emb(spark)
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, m=5, ksub=8)


def test_output_column_collision_raises(spark, fixture):
    """pq_encode appends out_col and ivf_assign appends 'cell'; an input
    already carrying that name must error loudly instead of silently
    yielding a duplicate column that breaks downstream selections."""
    from entangledb_spark.operators.similarity import ivf_assign, ivf_centroids

    df, _, model = fixture
    coded = pq_encode(df, model)
    with pytest.raises(ValueError, match="already has"):
        pq_encode(coded, model)  # default out_col='pq_code' twice
    cents = ivf_centroids(df, 4).collect()
    assigned = ivf_assign(df, cents)
    with pytest.raises(ValueError, match="already has"):
        ivf_assign(assigned, cents)


ALL_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_pq_gate_margins(spark, sf):
    """q73's pq_code0/pq_code_sum/pq_adc_q columns hash-gate the PQ twin
    (knuth-medoid codebooks, ksub=8, m=4). Two cross-engine float
    hazards, measured at every density the gate can run at:

    (a) the per-(vector, subspace) encode argmin — the gap between the
        best and second-best sub-centroid distance must dwarf the
        ~1e-16 noise between Spark's zip_with fold and DuckDB's
        list_dot_product;
    (b) the ADC value's r4 FLIP boundary — no adc·1e4 may sit near a
        half-integer, where the two engines' term summations could
        round apart."""
    from entangledb_spark.operators.text import knuth_bucket

    df = spark.read.parquet(f"{sf}/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )
    model = pq_train(
        df, m=4, ksub=8, refine=0,
        bucket_expr=knuth_bucket(F.col("vec_id"), 8),
    )
    m, dsub = model["m"], model["dsub"]
    x = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    # (a) argmin gap per (vector, subspace), the pq_encode expression
    gap = float("inf")
    for vec in x.values():
        for j in range(m):
            xj = vec[j * dsub : (j + 1) * dsub]
            dists = sorted(
                float(np.dot(c, c) / 2 - np.dot(xj, c))
                for _, cent in model["codebooks"][j]
                for c in [np.array(cent)]
            )
            gap = min(gap, dists[1] - dists[0])
    assert gap > 1e-9, f"pq encode argmin gap collapsed to {gap} at {sf}"
    # (b) adc r4 flip margin for every vector vs the min-id probe
    probe = x[min(x)]
    codes = {
        r.vec_id: list(r.pq_code)
        for r in pq_encode(df, model).collect()
    }
    cb = [dict(c) for c in model["codebooks"]]
    flip = float("inf")
    for vid, cs in codes.items():
        adc = 0.0
        for j, c in enumerate(cs):
            pj = probe[j * dsub : (j + 1) * dsub]
            adc += float(np.sum((pj - np.array(cb[j][c])) ** 2))
        flip = min(flip, abs((adc * 10000 + 0.5) - round(adc * 10000 + 0.5)))
    assert flip > 1e-6, f"pq_adc_q r4 flip margin collapsed to {flip} at {sf}"


# ---------------------------------------------------------------- IVF-PQ


def test_ivfpq_probe_matches_reference(spark, tmp_path):
    """probe_ivfpq_index == pure-Python reference: route each probe to
    its nprobe nearest saved centroids, ADC-price every code in those
    cells with the saved codebooks, top-k by (adc, id). Pins routing,
    pruning, the guarded branch scoring, and the tie order at once."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    d = str(tmp_path / "ivfpq")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16, pq_refine=1)
    meta_model = __import__("json").load(
        open(f"{d}/_index_meta.json")
    )["pq_model"]
    cents = {
        int(r.cell): np.array([float(x) for x in r.centroid])
        for r in spark.read.parquet(f"{d}/centroids").collect()
    }
    unit = {
        c: v / (np.linalg.norm(v) or 1.0) for c, v in cents.items()
    }
    codes = {
        (int(r.cell), r.vec_id): list(r.pq_code)
        for r in spark.read.parquet(f"{d}/codes").collect()
    }
    x = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    nprobe, k = 2, 5
    got = probe_ivfpq_index(
        spark, d, df.filter(F.col("vec_id") < 4), k=k, nprobe=nprobe
    ).collect()
    byq = {}
    for r in got:
        byq.setdefault(r.query_id, []).append(r)
    cb = [dict(c) for c in meta_model["codebooks"]]
    dsub = meta_model["dsub"]

    def adc(pvec, code):
        return sum(
            float(
                np.sum(
                    (pvec[j * dsub : (j + 1) * dsub] - np.array(cb[j][c])) ** 2
                )
            )
            for j, c in enumerate(code)
        )

    for pid in range(4):
        pv = x[pid]
        probed = sorted(
            ((-float(pv @ u), c) for c, u in unit.items())
        )[:nprobe]
        pcells = {c for _, c in probed}
        ref = sorted(
            (adc(pv, code), vid)
            for (cell, vid), code in codes.items()
            if cell in pcells and vid != pid
        )[:k]
        mine = sorted(byq[pid], key=lambda r: r.rk)
        assert [r.neighbor_id for r in mine] == [v for _, v in ref], pid
        for r, (want, _) in zip(mine, ref):
            assert abs(r.adc_dist - want) < 1e-9


def test_ivfpq_probe_prunes_partitions(spark, tmp_path):
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    d = str(tmp_path / "ivfpq_prune")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=8)
    probe = probe_ivfpq_index(spark, d, df.filter(F.col("vec_id") == 1), k=3)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scans, plan
    assert not any("PartitionFilters: []" in l for l in scans), plan
    assert "BatchEvalPython" not in plan


def test_ivfpq_append_and_rerank(spark, tmp_path):
    """Append encodes with the SAVED model (codes for old vectors never
    shift), and the reranked probe equals exact L2 over the ADC
    shortlist — recall == shortlist coverage."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    half_a = df.filter(F.col("vec_id") % 2 == 0)
    half_b = df.filter(F.col("vec_id") % 2 == 1)
    d = str(tmp_path / "ivfpq_app")
    build_ivfpq_index(half_a, d, n_cells=8, m=4, ksub=16, pq_refine=1)
    codes_before = {
        r.vec_id: list(r.pq_code)
        for r in spark.read.parquet(f"{d}/codes").collect()
    }
    build_ivfpq_index(half_b, d, mode="append")
    codes_after = {
        r.vec_id: list(r.pq_code)
        for r in spark.read.parquet(f"{d}/codes").collect()
    }
    assert all(codes_after[v] == c for v, c in codes_before.items())
    assert len(codes_after) == df.count()
    # rerank: exact_dist must equal true L2 and be sorted per probe
    x = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    got = probe_ivfpq_index(
        spark, d, df.filter(F.col("vec_id") == 3), k=5,
        rerank_with=df, shortlist=60,
    ).collect()
    assert len(got) == 5
    dists = [r.exact_dist for r in sorted(got, key=lambda r: r.rk)]
    assert dists == sorted(dists)
    for r in got:
        want = float(np.sum((x[3] - x[r.neighbor_id]) ** 2))
        assert abs(r.exact_dist - want) < 1e-9


def _rows_r4(df, cols):
    return sorted(
        tuple(
            round(float(v) * 1e4) if isinstance(v, float) else v
            for v in (r[c] for c in cols)
        )
        for r in df.collect()
    )


def test_ivfpq_bulk_route_equivalent(spark, tmp_path):
    """probe_ivfpq_bulk (distributed broadcast-LUT join) must equal the
    literal per-probe route at the r4 grain — same neighbors, same ranks,
    same ADC/exact distances — on the plain index (with and without
    rerank) and on the by_residual variant (per-(probe, cell) LUTs)."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_bulk,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    probes = df.filter(F.col("vec_id") < 40)
    d = str(tmp_path / "ivfpq_bulk")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16, pq_refine=1)
    lit = probe_ivfpq_index(spark, d, probes, k=5, route="literal")
    blk = probe_ivfpq_bulk(spark, d, probes, k=5)
    cols = ["query_id", "neighbor_id", "adc_dist", "rk"]
    assert _rows_r4(lit, cols) == _rows_r4(blk, cols)
    assert lit.columns == blk.columns
    lit_r = probe_ivfpq_index(
        spark, d, probes, k=5, route="literal", rerank_with=df, shortlist=40
    )
    blk_r = probe_ivfpq_bulk(spark, d, probes, k=5, rerank_with=df, shortlist=40)
    cols_r = ["query_id", "neighbor_id", "adc_dist", "exact_dist", "rk"]
    assert _rows_r4(lit_r, cols_r) == _rows_r4(blk_r, cols_r)
    assert lit_r.columns == blk_r.columns
    dres = str(tmp_path / "ivfpq_bulk_res")
    build_ivfpq_index(
        df, dres, n_cells=8, m=4, ksub=16, refine=1, pq_refine=1, by_residual=True
    )
    lit2 = probe_ivfpq_index(spark, dres, probes, k=5, route="literal")
    blk2 = probe_ivfpq_bulk(spark, dres, probes, k=5)
    assert _rows_r4(lit2, cols) == _rows_r4(blk2, cols)


def test_route_hint_skips_the_count_job_and_stays_correct(spark, tmp_path):
    """``n_probes`` is the serving-path escape hatch for auto routing:
    with the hint, route selection is arithmetic — NO take() Spark job
    before the probe itself (job-count asserted via job groups) — and a
    WRONG hint still returns correct results (the hint picks the plan,
    never the semantics)."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    probes = df.filter(F.col("vec_id") < 3)
    d = str(tmp_path / "ivfpq_hint")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16)
    sc = spark.sparkContext

    def jobs_for(group, fn):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    # warm once so the round-11 schema cache (parquet_io._SCHEMA_CACHE:
    # the first read of the codes dir pays a one-off schema-inference job,
    # later reads don't) can't skew the per-route job accounting below
    probe_ivfpq_index(spark, d, probes, k=3, n_probes=3).collect()
    n_hint = jobs_for(
        "hint-route",
        lambda: probe_ivfpq_index(spark, d, probes, k=3, n_probes=3).collect(),
    )
    n_auto = jobs_for(
        "auto-route",
        lambda: probe_ivfpq_index(spark, d, probes, k=3).collect(),
    )
    # auto pays exactly the one extra bounded take() job the hint saves
    assert n_auto == n_hint + 1, (n_auto, n_hint)

    cols = ["query_id", "neighbor_id", "adc_dist", "rk"]
    want = _rows_r4(probe_ivfpq_index(spark, d, probes, k=3, route="literal"), cols)
    # a WRONG hint (claims bulk-sized) lands on the bulk plan — results
    # identical at the r4 grain
    wrong = probe_ivfpq_index(spark, d, probes, k=3, n_probes=10_000)
    assert _rows_r4(wrong, cols) == want
    assert _rows_r4(probe_ivfpq_index(spark, d, probes, k=3, n_probes=3), cols) == want
    with pytest.raises(ValueError, match="n_probes"):
        probe_ivfpq_index(spark, d, probes, k=3, n_probes=-1)


def test_ivfpq_bulk_plan_independent_of_probe_count_and_pruned(spark, tmp_path):
    """The bulk route's contract: probes are DATA, not plan — the plan
    text must not grow with the probe count (the literal route's does,
    which is why PROBE_LITERAL_MAX guards it), no per-probe literal LUT
    (no 1e308 gap constants in the plan), and the codes scan keeps its
    static partition filter (pruning identical to the literal route)."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_bulk,
    )

    df = _emb(spark)
    d = str(tmp_path / "ivfpq_psize")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16)

    def plan(n):
        p = probe_ivfpq_bulk(spark, d, df.filter(F.col("vec_id") < n), k=3)
        # normalize exprIds out of the text: their DIGIT WIDTH grows with
        # session age (#9999 → #10000 adds one char to every attribute
        # reference, ~2.7 KB across this plan), so a raw length compare
        # flakes whenever the two builds straddle a width rollover —
        # observed under `-k` subsetting at the 10k boundary.
        text = p._jdf.queryExecution().executedPlan().toString()
        return re.sub(r"#\d+", "#", text)

    p4, p200 = plan(4), plan(200)
    # identical up to cell-filter literals (bounded by n_cells, not probes)
    assert len(p200) < len(p4) + 500, (len(p4), len(p200))
    assert "BroadcastHashJoin" in p200
    assert "1e308" not in p200 and "1E308" not in p200
    # the CODES scan keeps its static cell filter (the probe-side scan is
    # an unpartitioned fixture file — its empty PartitionFilters is fine)
    code_scans = [
        l
        for l in p200.splitlines()
        if "PartitionFilters" in l and "pq_code" in l
    ]
    assert code_scans, p200
    assert not any("PartitionFilters: []" in l for l in code_scans), p200
    assert "BatchEvalPython" not in p200


def test_ivfpq_auto_route_picks_by_probe_count(spark, tmp_path):
    """route='auto' must compile the literal plan for a bounded probe set
    (no join — serving latency) and switch to the bulk join plan above
    PROBE_LITERAL_MAX, so a decontamination-scale probe DataFrame can
    never silently compile a multi-MB literal plan."""
    from entangledb_spark.operators.ann_index import (
        PROBE_LITERAL_MAX,
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    d = str(tmp_path / "ivfpq_auto")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16)
    few = probe_ivfpq_index(spark, d, df.filter(F.col("vec_id") < 4), k=3)
    assert "BroadcastHashJoin" not in (
        few._jdf.queryExecution().executedPlan().toString()
    )
    assert df.filter(F.col("vec_id") < 200).count() > PROBE_LITERAL_MAX
    many = probe_ivfpq_index(spark, d, df.filter(F.col("vec_id") < 200), k=3)
    assert "BroadcastHashJoin" in (
        many._jdf.queryExecution().executedPlan().toString()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="auto|literal|bulk"):
        probe_ivfpq_index(spark, d, df, k=3, route="nope")


def test_ivfpq_bulk_arrow_lut_route_equivalent(spark, tmp_path, monkeypatch):
    """Above PQ_FOLD_MAX the bulk route computes probe LUTs via the Arrow
    matmul (adc_lut_arrow) instead of the literal codebook fold — results
    must agree with the literal-LUT bulk plan at the r4 grain (numpy
    pairwise vs SQL left-fold summation differs at ~1e-16)."""
    from entangledb_spark.operators import pq as pq_mod
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_bulk,
    )

    df = _emb(spark)
    probes = df.filter(F.col("vec_id") < 40)
    d = str(tmp_path / "ivfpq_arrowlut")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16, pq_refine=1)
    cols = ["query_id", "neighbor_id", "adc_dist", "rk"]
    lit = _rows_r4(probe_ivfpq_bulk(spark, d, probes, k=5), cols)
    monkeypatch.setattr(pq_mod, "PQ_FOLD_MAX", 0)
    arw = probe_ivfpq_bulk(spark, d, probes, k=5)
    assert "BatchEvalPython" not in (
        arw._jdf.queryExecution().executedPlan().toString()
    )  # Arrow LUT is mapInPandas (ArrowEvalPython), never row-at-a-time
    assert _rows_r4(arw, cols) == lit


def test_ivfpq_bulk_empty_probe_set(spark, tmp_path):
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_bulk,
    )

    df = _emb(spark)
    d = str(tmp_path / "ivfpq_empty")
    build_ivfpq_index(df, d, n_cells=4, m=4, ksub=8)
    none = df.filter(F.col("vec_id") < 0)
    out = probe_ivfpq_bulk(spark, d, none, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "adc_dist", "rk"]
    out_r = probe_ivfpq_bulk(spark, d, none, k=3, rerank_with=df)
    assert out_r.count() == 0
    assert out_r.columns == [
        "query_id", "neighbor_id", "adc_dist", "exact_dist", "rk",
    ]


def test_ivfpq_stream_writer_exactly_once_and_compaction(spark, tmp_path):
    """Stream half the corpus into an index built on the other half:
    probes equal a reference over all codes; a checkpoint restart
    replays nothing; compaction folds batches behind an atomic meta
    pointer swap; a post-compaction replay of a folded batch is skipped
    (the text_index exactly-once contract, vector edition)."""
    import json
    import os

    from entangledb_spark.operators.ann_index import (
        _codes_path,
        build_ivfpq_index,
        compact_ivfpq_index,
        probe_ivfpq_index,
        stream_ivfpq_writer,
    )

    df = _emb(spark)
    half_a = df.filter(F.col("vec_id") % 2 == 0)
    half_b = df.filter(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "src")
    half_b.repartition(3).write.parquet(src)
    d = str(tmp_path / "ivfpq_stream")
    ckpt = str(tmp_path / "ckpt")
    build_ivfpq_index(half_a, d, n_cells=8, m=4, ksub=16, pq_refine=1)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    w = stream_ivfpq_writer(d, stream, "s1", ckpt)
    w.trigger(availableNow=True).start().awaitTermination()

    def meta():
        return json.load(open(os.path.join(d, "_index_meta.json")))

    assert sum(meta()["batches"].values()) == df.count()
    n_rows = spark.read.parquet(_codes_path(d, meta())).count()
    assert n_rows == df.count()
    probes = probe_ivfpq_index(spark, d, df.filter(F.col("vec_id") < 3), k=5).collect()
    # restart on the same checkpoint: nothing replays
    w2 = stream_ivfpq_writer(d, stream, "s1", ckpt)
    w2.trigger(availableNow=True).start().awaitTermination()
    assert spark.read.parquet(_codes_path(d, meta())).count() == n_rows
    # compaction: identical probes, pointer swapped, old dir reclaimed
    compact_ivfpq_index(spark, d)
    m2 = meta()
    assert m2["codes_dir"] == "codes_v1"
    assert not os.path.exists(os.path.join(d, "codes"))
    assert m2["batches"] == {"base": df.count()}
    assert m2["folded"]  # the stream batches are ledgered
    after = probe_ivfpq_index(spark, d, df.filter(F.col("vec_id") < 3), k=5).collect()
    assert [(r.query_id, r.neighbor_id) for r in after] == [
        (r.query_id, r.neighbor_id) for r in probes
    ]
    for a, b in zip(after, probes):
        assert abs(a.adc_dist - b.adc_dist) < 1e-12
    # post-compaction replay of a folded batch: skipped outright
    folded_name = m2["folded"][0]
    batch_id = int(folded_name.split("-")[-1])
    replay_docs = half_b  # superset of any single micro-batch — still a no-op
    build_ivfpq_index(replay_docs, d, mode="append", batch=folded_name)
    m3 = meta()
    assert sum(m3["batches"].values()) == df.count()
    assert spark.read.parquet(_codes_path(d, m3)).count() == n_rows
    assert batch_id >= 0


def test_ivfpq_append_param_mismatch_rejected(spark, tmp_path):
    from entangledb_spark.operators.ann_index import build_ivfpq_index

    df = _emb(spark)
    d = str(tmp_path / "ivfpq_params")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16)
    with pytest.raises(ValueError, match="saved model"):
        build_ivfpq_index(df, d, mode="append", m=8)
    # omitted params (None) and matching values both pass
    build_ivfpq_index(df.limit(5), d, mode="append", batch="ok1")
    build_ivfpq_index(
        df.limit(5), d, mode="append", batch="ok2", n_cells=8, m=4, ksub=16
    )


def test_ivfpq_rebuild_commits_versioned_dirs(spark, tmp_path):
    """A rebuild over a live index lands in fresh versioned dirs and
    commits via the meta swap — old centroids/codes stay mutually
    consistent until the commit, then are reclaimed. Probes after the
    rebuild reflect the new corpus."""
    import json
    import os

    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    half = df.filter(F.col("vec_id") < 250)
    d = str(tmp_path / "ivfpq_rebuild")
    build_ivfpq_index(half, d, n_cells=8, m=4, ksub=16)
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=16)  # rebuild, full corpus
    meta = json.load(open(os.path.join(d, "_index_meta.json")))
    assert meta["codes_dir"] == "codes_v1"
    assert meta["cents_dir"] == "centroids_v1"
    assert meta["batches"] == {"base": df.count()}
    assert not os.path.exists(os.path.join(d, "codes"))
    assert not os.path.exists(os.path.join(d, "centroids"))
    got = probe_ivfpq_index(spark, d, df.filter(F.col("vec_id") == 400), k=3)
    assert got.count() == 3  # vec 400 only exists in the rebuilt corpus


def test_ivfpq_empty_probe_set(spark, tmp_path):
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    d = str(tmp_path / "ivfpq_empty")
    build_ivfpq_index(df, d, n_cells=8, m=4, ksub=8, pq_refine=0)
    none = df.filter(F.col("vec_id") < 0)
    assert probe_ivfpq_index(spark, d, none, k=3).count() == 0
    assert probe_ivfpq_index(spark, d, none, k=3, rerank_with=df).count() == 0
    model = pq_train(df, m=4, ksub=8)
    coded = pq_encode(df, model)
    assert pq_adc_topk(coded, model, none, k=3).count() == 0
    assert pq_adc_rerank_topk(coded, model, none, k=3).count() == 0


def test_ivfpq_residual_probe_matches_reference(spark, tmp_path):
    """by_residual=True: codes quantize x − centroid(cell), probes price
    with per-(probe, cell) LUTs — checked against a pure-Python mirror
    of the whole route (assign → residual → saved-model ADC)."""
    import json

    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    d = str(tmp_path / "ivfpq_res")
    build_ivfpq_index(
        df, d, n_cells=8, refine=1, m=4, ksub=16, pq_refine=1, by_residual=True
    )
    meta = json.load(open(f"{d}/_index_meta.json"))
    assert meta["by_residual"] is True
    model = meta["pq_model"]
    dsub = model["dsub"]
    cb = [dict(c) for c in model["codebooks"]]
    cents = {
        int(r.cell): np.array([float(x) for x in r.centroid])
        for r in spark.read.parquet(f"{d}/{meta['cents_dir']}").collect()
    }
    unit = {c: v / (np.linalg.norm(v) or 1.0) for c, v in cents.items()}
    codes = {
        (int(r.cell), r.vec_id): list(r.pq_code)
        for r in spark.read.parquet(f"{d}/{meta['codes_dir']}").collect()
    }
    x = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    nprobe, k = 2, 5

    def adc(pres, code):
        return sum(
            float(np.sum((pres[j * dsub : (j + 1) * dsub] - np.array(cb[j][c])) ** 2))
            for j, c in enumerate(code)
        )

    got = probe_ivfpq_index(
        spark, d, df.filter(F.col("vec_id") < 4), k=k, nprobe=nprobe
    ).collect()
    byq = {}
    for r in got:
        byq.setdefault(r.query_id, []).append(r)
    for pid in range(4):
        pv = x[pid]
        probed = sorted(((-float(pv @ u), c) for c, u in unit.items()))[:nprobe]
        ref = sorted(
            (adc(pv - cents[cell], code), vid)
            for (cell, vid), code in codes.items()
            if cell in {c for _, c in probed} and vid != pid
        )[:k]
        mine = sorted(byq[pid], key=lambda r: r.rk)
        assert [r.neighbor_id for r in mine] == [v for _, v in ref], pid
        for r, (want, _) in zip(mine, ref):
            assert abs(r.adc_dist - want) < 1e-9


def test_ivfpq_residual_vs_plain_measured(spark, tmp_path):
    """The by_residual trade, measured and pinned (everything is
    deterministic — medoid seeds, r6-grid refinement, no RNG): with
    refine=2 centroids the residual variant's raw-ADC recall@10 beats
    plain on the fixture; with refine=0 hash-medoid seeds it is WORSE
    (the docstring's honest guidance: pair by_residual with refine)."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )

    df = _emb(spark)
    unit = df.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: x
            / F.sqrt(
                F.aggregate(
                    F.transform("embedding", lambda y: y * y),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
            ),
        ).alias("embedding"),
    )
    x = {r.vec_id: np.array(r.embedding) for r in unit.collect()}
    truth = {
        p: {
            v
            for _, v in sorted(
                (float(np.sum((x[p] - vv) ** 2)), vid) for vid, vv in x.items()
            )[1:11]
        }
        for p in range(5)
    }

    def recall(by_res, refine, tag):
        d = str(tmp_path / f"idx_{tag}")
        build_ivfpq_index(
            unit, d, n_cells=8, refine=refine, m=4, ksub=16,
            pq_refine=2, by_residual=by_res,
        )
        got = probe_ivfpq_index(
            spark, d, unit.filter(F.col("vec_id") < 5), k=10, nprobe=2
        ).collect()
        byp = {}
        for r in got:
            byp.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(byp[p] & truth[p]) / 10 for p in range(5)) / 5

    res_refined = recall(True, 2, "res_r2")
    plain_refined = recall(False, 2, "plain_r2")
    res_seed = recall(True, 0, "res_r0")
    plain_seed = recall(False, 0, "plain_r0")
    print(
        f"ivfpq recall@10: refined res={res_refined} plain={plain_refined}; "
        f"seeded res={res_seed} plain={plain_seed}"
    )
    assert res_refined >= plain_refined  # residual wins WITH trained cells
    assert plain_seed > res_seed  # and loses on raw medoid seeds

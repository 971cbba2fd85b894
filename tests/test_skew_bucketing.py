"""Skew utilities: salted join equals plain join; bucketed join plans no
Exchange; key histogram surfaces hot keys."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from entangledb_spark.operators.skew import (
    bucketed_join_ready,
    key_histogram,
    salted_join,
    write_bucketed,
)
from entangledb_spark.registry import table


def physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(o, c, "o_custkey", "c_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    plain = c.join(o, c.c_custkey == o.o_custkey, "left").count()
    # left-outer with salting: unmatched rows appear once per... they must
    # NOT be duplicated — unmatched left rows carry one salt each, so the
    # left join result matches exactly.
    salted = salted_join(c, o, "c_custkey", "o_custkey", n_salts=4, how="left").count()
    assert plain == salted


def test_key_histogram(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    h = key_histogram(o, "o_custkey", top=5)
    rows = h.collect()
    assert len(rows) == 5
    assert rows[0]["count"] >= rows[-1]["count"]
    assert 0 < rows[0]["share"] <= 1


def test_bucketed_join_no_exchange(spark, sf_dir):
    # uses the default ./spark-warehouse (warehouse dir is a static conf);
    # tables are dropped (managed → data removed) at the end
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)  # stale dirs
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "l_okey"), "b_lineitem", "l_okey", n_buckets=8
    )
    # at fixture scale Spark would rightly broadcast instead (also shuffle-
    # free); disable auto-broadcast to demonstrate the at-scale bucketed
    # sort-merge path, which is what a fact-fact join would use.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join_ready(
            spark, "b_orders", "b_lineitem", "o_orderkey", "l_okey"
        )
        plan = physical_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        expected = o.join(l, o.o_orderkey == l.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _avg_recall(spark, approx_rows, sf="/root/testdata/sf0.001") -> float:
    """Average top-5 recall of an ANN result vs the exact q70 truth set."""
    from entangledb_spark.registry import QUERIES, load_all

    load_all()
    exact = QUERIES["q70_ann_bruteforce_topk"](spark, sf).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in approx_rows:
        if r.query_id in truth:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    return sum(recalls) / len(recalls)


import pytest as _pytest


@_pytest.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_lsh_recall_vs_bruteforce(spark, sf):
    """ANN quality gate, LSH branch: with one-bit multi-probe expansion
    (expand_multiprobe, default since round 4) the measured avg top-5
    recall is 0.96 at sf0.001 and 1.00 at sf0.01 AND sf0.1 (was 0.44
    single-probe) — all three densities now ASSERTED, so the floor is
    NOT an artifact of sparse buckets. Floor 0.8 stays ≥ 15 points
    below every measurement: tight enough that a real regression
    (broken bucketing, lost multi-probe, hash-family drift) fails,
    loose enough to absorb fixture regeneration."""
    from entangledb_spark.operators.similarity import ann_lsh_bucketed

    avg = _avg_recall(spark, ann_lsh_bucketed(spark, sf).collect(), sf)
    assert avg >= 0.8, f"LSH recall regressed at {sf}: {avg}"


@_pytest.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_ivf_recall_vs_bruteforce(spark, sf):
    """ANN quality gate, IVF branch: with nprobe=2 (default since round 4)
    the measured avg top-5 recall is 0.92 at sf0.001 and sf0.01 and
    1.00 at sf0.1's 2000 vectors — all three densities ASSERTED. Floor
    0.8 ≈ 12 points below measured — guards broken routing/medoids,
    which the LSH test can't catch and vice versa."""
    from entangledb_spark.operators.similarity import ann_ivf

    avg = _avg_recall(spark, ann_ivf(spark, sf).collect(), sf)
    assert avg >= 0.8, f"IVF recall regressed at {sf}: {avg}"


def test_ivf_lloyd_refinement_measured(spark):
    """Lloyd refinement (ivf_centroids refine=N), measured honestly: on
    this fixture's near-uniform embeddings ONE refinement round LOWERS
    single-probe recall (0.88 → 0.72 at calibration) — mean-centroids
    tighten cells, pushing boundary queries' true neighbors into adjacent
    cells. The knob exists for genuinely clustered corpora; this test
    pins (a) the machinery runs end-to-end and stays deterministic, and
    (b) refined recall at the default nprobe=2 stays above a collapse
    floor — it must NOT be mistaken for a quality gate on refinement."""
    from entangledb_spark.operators.similarity import ann_ivf

    sf = "/root/testdata/sf0.001"
    refined = ann_ivf(spark, sf, refine=1)
    avg = _avg_recall(spark, refined.collect())
    assert avg >= 0.6, f"refined-IVF recall collapsed: {avg} (measured 0.80 at sf0.001, 0.88 at sf0.01)"
    # determinism: the 6-decimal rounding of mean centroids makes re-runs
    # bit-identical despite distributed summation order
    a = sorted(tuple(r) for r in ann_ivf(spark, sf, refine=1).collect())
    b = sorted(tuple(r) for r in ann_ivf(spark, sf, refine=1).collect())
    assert a == b


def test_connected_components(spark):
    """Known graph: chain 1-2-3, pair 10-11, isolated 20."""
    from entangledb_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a long, b long")
    vertices = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20]], "id long")
    comp = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == 20


def test_connected_components_long_chain(spark):
    """20-hop chain (diameter 20 > the old fixed 8-round budget): labels
    propagate one hop per round, so the pre-r4 fixed-8-iteration version
    left the far end at label 12 — silently unconverged. The convergence-
    checked loop must collapse the whole chain to component 0; and an
    explicit max_iter=3 bound must demonstrably stop early (far end still
    unlabeled-0), proving the bound parameter still bounds."""
    from entangledb_spark.operators.dedup import connected_components

    n = 20
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "a long, b long")
    vertices = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    comp = {r.id: r.component for r in connected_components(vertices, edges).collect()}
    assert set(comp.values()) == {0}, comp
    bounded = {
        r.id: r.component
        for r in connected_components(vertices, edges, max_iter=3).collect()
    }
    assert bounded[n] == n - 3  # 3 rounds = 3 hops of propagation, no more


@_pytest.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_ivfpq_recall_vs_bruteforce(spark, sf):
    """ANN quality gate, IVF-PQ branch (q71's third strategy): measured
    avg top-5 recall 0.92 / 0.92 / 0.96 at sf0.001 / sf0.01 / sf0.1
    (nprobe=2, shortlist=100 — the residual misses are IVF routing, not
    the PQ shortlist: shortlist recall saturates by 100). Floor 0.75
    guards routing, code encoding, the guarded-branch ADC, and the
    rerank join at once."""
    from entangledb_spark.operators.similarity import ann_ivfpq_indexed

    avg = _avg_recall(spark, ann_ivfpq_indexed(spark, sf).collect(), sf)
    assert avg >= 0.75, f"IVF-PQ recall regressed at {sf}: {avg}"


import hashlib as _hashlib

import numpy as _np
import pytest as _pytest2


@_pytest2.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_q71_gate_cross_engine_margins(sf, spark):
    """The round-10 q71 gate (twin primitives: md5 hyperplanes, knuth
    medoid cells) hash-matches a DuckDB oracle that re-derives raw-float
    ORDERINGS in four places. Measure, don't argue, that every boundary
    gap dwarfs cross-engine summation noise (~1e-15), at every density
    the gate can run at:

    (a) IVF/IVF-PQ nearest-centroid argmin (top-1 corpus, top-2 probe);
    (b) the IVF-PQ rank-5 cut on raw exact squared L2 (exact ties are
        fine — both engines tie-break on neighbor_id);
    (c) the r4 rounding flip of every emitted cos_sim;
    (d) the md5-hyperplane sign of every (vector, table, plane) dot.

    The numpy reimplementation here is also a THIRD independent
    derivation of the twin's bucketing/routing (Spark, DuckDB, python)."""
    import math

    from entangledb_spark.operators.similarity import (
        N_HYPERPLANES,
        N_IVF_CELLS,
        N_LSH_TABLES,
    )
    from entangledb_spark.registry import table as _table

    HASH_M = (1 << 31) - 1
    K = 2654435761 % HASH_M
    rows = sorted(
        _table(spark, sf, "embeddings").select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    ids = _np.array([int(r.vec_id) for r in rows])
    v = _np.array([[float(x) for x in r.embedding] for r in rows])
    probe_mask = ids < 20
    cells = ((ids % HASH_M) * K) % HASH_M % N_IVF_CELLS

    def unit_rows(m):
        return m / _np.sqrt((m * m).sum(axis=1, keepdims=True))

    def medoid_units(mat):
        cs = sorted(set(cells.tolist()))
        return _np.array(cs), unit_rows(
            _np.stack([mat[_np.where(cells == c)[0].min()] for c in cs])
        )

    def r4_flip_margin(vals):
        y = _np.asarray(vals) * 10000.0 + 0.5
        return float(_np.abs(y - _np.rint(y)).min()) if len(vals) else 1.0

    def cos_mat(a, b):
        ua, ub = unit_rows(a), unit_rows(b)
        return ua @ ub.T

    flip_margins, assign_gaps = [], []
    # --- IVF branch (raw corpus) and IVF-PQ branch (unit corpus) ---
    for mat in (v, unit_rows(v)):
        cell_ids, u = medoid_units(mat)
        d = -(mat @ u.T)
        ds = _np.sort(d, axis=1)
        assign_gaps += [
            float((ds[:, 1] - ds[:, 0]).min()),
            float((ds[probe_mask, 2] - ds[probe_mask, 1]).min()),
        ]
    for g in assign_gaps:
        assert g > 1e-6, f"assignment margin collapsed to {g} at {sf}"

    # IVF-PQ rank-5 cut + cos flip margins (unit corpus)
    uvec = unit_rows(v)
    cell_ids, up = medoid_units(uvec)
    dp = -(uvec @ up.T)
    order = _np.argsort(dp, axis=1, kind="stable")
    top1 = cell_ids[order[:, 0]]
    for qi in _np.where(probe_mask)[0]:
        probed = set(cell_ids[order[qi, :2]].tolist())
        cand = [j for j in range(len(ids)) if top1[j] in probed and j != qi]
        dists = _np.sort(((uvec[cand] - uvec[qi]) ** 2).sum(axis=1))
        if len(dists) > 5:
            gap = float(dists[5] - dists[4])
            assert gap == 0.0 or gap > 1e-9, f"rank-5 gap {gap} at {sf} q{ids[qi]}"
        flip_margins.append(r4_flip_margin(1.0 - dists[: min(5, len(dists))] / 2.0))

    # IVF branch cos flips (candidates = probed-cell members, raw cosine)
    di = -(v @ medoid_units(v)[1].T)
    oi = _np.argsort(di, axis=1, kind="stable")
    ci = medoid_units(v)[0]
    t1 = ci[oi[:, 0]]
    for qi in _np.where(probe_mask)[0]:
        probed = set(ci[oi[qi, :2]].tolist())
        cand = [j for j in range(len(ids)) if t1[j] in probed and j != qi]
        if cand:
            flip_margins.append(
                r4_flip_margin(cos_mat(v[[qi]], v[cand]).ravel())
            )

    # --- LSH branch: md5 plane signs + bucket replication ---
    dims = v.shape[1]
    sign_margin = _np.inf
    codes = _np.zeros((len(ids), N_LSH_TABLES), dtype=_np.int64)
    for t in range(N_LSH_TABLES):
        planes = _np.array(
            [
                [
                    1.0
                    if int(
                        _hashlib.md5(f"{t},{h},{i}".encode()).hexdigest()[:8], 16
                    )
                    % 2
                    == 0
                    else -1.0
                    for i in range(dims)
                ]
                for h in range(N_HYPERPLANES)
            ]
        )
        dots = v @ planes.T  # (n, planes)
        sign_margin = min(sign_margin, float(_np.abs(dots).min()))
        bits = (dots > 0).astype(_np.int64)
        for h in range(N_HYPERPLANES):
            codes[:, t] = codes[:, t] * 2 + bits[:, h]
    assert sign_margin > 1e-6, f"hyperplane sign margin {sign_margin} at {sf}"
    masks = [0] + [1 << b for b in range(N_HYPERPLANES)]
    for qi in _np.where(probe_mask)[0]:
        cand = set()
        for t in range(N_LSH_TABLES):
            pb = {int(codes[qi, t]) ^ m for m in masks}
            cand |= {
                j
                for j in range(len(ids))
                if j != qi and int(codes[j, t]) in pb
            }
        if cand:
            flip_margins.append(
                r4_flip_margin(cos_mat(v[[qi]], v[sorted(cand)]).ravel())
            )
    m = min(flip_margins)
    assert m > 1e-6, f"r4 flip margin collapsed to {m} at {sf}"

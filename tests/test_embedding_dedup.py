"""Embedding-cosine near-dup: LSH-bucketed candidate pairs + exact cosine
filter, validated two ways:

1. PLANTED fixture: clusters of noisy copies of base vectors plus isolated
   singletons — ground-truth pairs computed by brute-force numpy cosine.
   Precision must be exact (the operator ends in an exact-cosine filter);
   recall is the LSH collision rate and must be perfect on this fixture
   (near-dup noise is far inside the hyperplane margins).
2. REAL embeddings table at sf0.001 vs a brute-force DuckDB oracle at the
   same threshold — recall floor asserted against an independent engine.
"""

from __future__ import annotations

import numpy as np
import pytest

from entangledb_spark.operators.similarity import (
    embedding_near_dup_pairs,
    embedding_near_dup_survivors,
)
from tests.oracle import duck_connect

DIM = 16
THRESH = 0.95


def _planted(spark):
    """6 clusters x 4 near-copies + 20 singletons, deterministic."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(6):
        base = rng.normal(size=DIM)
        base /= np.linalg.norm(base)
        for _ in range(4):
            v = base + rng.normal(scale=0.02, size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(20):
        v = rng.normal(size=DIM)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _truth_pairs(rows, thresh=THRESH):
    out = set()
    for i, (ida, va) in enumerate(rows):
        a = np.array(va)
        for idb, vb in rows[i + 1 :]:
            b = np.array(vb)
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if round(cos, 4) >= thresh:
                out.add((min(ida, idb), max(ida, idb)))
    return out


def test_planted_pairs_exact(spark):
    rows, df = _planted(spark)
    truth = _truth_pairs(rows)
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(df, threshold=THRESH).collect()
    }
    assert truth, "fixture must plant at least one near-dup pair"
    # precision exact by construction; recall perfect on this margin
    assert got == truth


def test_planted_survivors(spark):
    rows, df = _planted(spark)
    truth = _truth_pairs(rows)
    # union-find over the truth pairs -> keep the min id of each component
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in truth:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for i, _ in rows:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    expected = {comp_min[find(i)] for i, _ in rows}
    surv = {r.vec_id for r in embedding_near_dup_survivors(df, threshold=THRESH).collect()}
    assert surv == expected
    # schema preserved
    assert embedding_near_dup_survivors(df, threshold=THRESH).columns == df.columns


def test_real_embeddings_vs_duckdb_bruteforce(spark, sf_dir):
    thresh = 0.5
    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
                "vec_id", "embedding"
            ),
            threshold=thresh,
            n_flips=2,
        ).collect()
    }
    con = duck_connect(sf_dir)
    truth = {
        (a, b)
        for a, b in con.execute(
            f"""
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                       FROM embeddings)
            SELECT a.vec_id, b.vec_id
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE floor(CAST(list_dot_product(a.emb, b.emb)
                  / (sqrt(list_dot_product(a.emb, a.emb))
                     * sqrt(list_dot_product(b.emb, b.emb))) AS DOUBLE)
                  * 10000 + 0.5) / 10000 >= {thresh}
            """
        ).fetchall()
    }
    # precision: every emitted pair is a true >= thresh pair (exact filter)
    assert got <= truth
    if truth:
        recall = len(got & truth) / len(truth)
        assert recall >= 0.8, f"recall {recall:.2f} over {len(truth)} true pairs"


# --- SemDeDup: cluster-bounded semantic dedup -------------------------------


def _semdedup_reference(rows, cents, threshold, n_cells):
    """Independent recomputation of everything DOWNSTREAM of the centroid
    pick (the medoid derivation itself is covered by the IVF tests):
    nearest-unit-centroid assignment with the exact (dist, cell)
    tie-ordering, in-order fold dot products (Spark's aggregate() rounds
    identically to a sequential Python loop), pairwise dominance."""
    import math

    unit = {}
    for r in cents:
        n = math.sqrt(sum(float(x) * float(x) for x in r.centroid)) or 1.0
        unit[int(r.cell)] = [float(x) / n for x in r.centroid]

    def dot_seq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    assign, cent_sim = {}, {}
    for vid, v in rows:
        best = min((( -dot_seq(v, u), c) for c, u in unit.items()))
        c = best[1]
        assign[vid] = c
        cent_sim[vid] = dot_seq(v, unit[c]) / math.sqrt(dot_seq(v, v))
    pairs = set()
    losers = set()
    for i, (ida, va) in enumerate(rows):
        for idb, vb in rows[i + 1 :]:
            if assign[ida] != assign[idb]:
                continue
            cos = dot_seq(va, vb) / (
                math.sqrt(dot_seq(va, va)) * math.sqrt(dot_seq(vb, vb))
            )
            if cos >= threshold:
                pairs.add((ida, idb))
                # higher (cent_sim, id) loses — the diversity-keeping rule
                losers.add(
                    max((ida, idb), key=lambda v: (cent_sim[v], v))
                )
    return pairs, losers


def test_semdedup_planted_matches_reference(spark):
    from entangledb_spark.operators.similarity import (
        ivf_centroids,
        semantic_dedup_pairs,
        semantic_dedup_survivors,
    )

    rows, df = _planted(spark)
    n_cells, refine = 4, 1
    cents = ivf_centroids(df, n_cells, refine=refine).collect()
    want_pairs, want_losers = _semdedup_reference(rows, cents, THRESH, n_cells)
    got = semantic_dedup_pairs(df, threshold=THRESH, n_cells=n_cells, refine=refine)
    got_pairs = {(r.vec_a, r.vec_b) for r in got.collect()}
    assert got_pairs == want_pairs
    surv = semantic_dedup_survivors(
        df, threshold=THRESH, n_cells=n_cells, refine=refine
    )
    assert surv.columns == df.columns
    got_surv = {r.vec_id for r in surv.collect()}
    assert got_surv == {vid for vid, _ in rows} - want_losers
    # native-regime recall: TRUE near-dups (cos ~0.999 noisy copies)
    # co-locate in their cell, so cluster bounding misses nothing —
    # measured 1.0 at n_cells=4 (36/36 true pairs; 0.889 at n_cells=8)
    assert got_pairs == _truth_pairs(rows)


def test_semdedup_real_embeddings_recall_and_precision(spark, sf_dir):
    """Real embeddings at sf0.001 — the WORST regime for cluster
    bounding, stated honestly: this fixture holds no true semantic dups
    (max pairwise cos 0.479), so a 0.4 threshold selects weakly-similar
    pairs that legitimately straddle cell boundaries. In-cell exactness
    is asserted against the independent reference; recall vs the
    brute-force all-pairs truth is the cross-cell miss rate — measured
    0.50 at n_cells=4 (0.394 at 8, 0.318 at 16), floored at 0.4. The
    planted test above measures the operator's NATIVE near-dup regime,
    where recall is 1.0."""
    from entangledb_spark.operators.similarity import (
        ivf_centroids,
        semantic_dedup_pairs,
    )

    df = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr("vec_id", "CAST(embedding AS array<double>) AS embedding")
    )
    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in df.collect()]
    thresh, n_cells = 0.4, 4
    cents = ivf_centroids(df, n_cells, refine=1).collect()
    want_pairs, _ = _semdedup_reference(rows, cents, thresh, n_cells)
    got = {
        (r.vec_a, r.vec_b)
        for r in semantic_dedup_pairs(df, threshold=thresh, n_cells=n_cells).collect()
    }
    assert got == want_pairs  # in-cell exactness on the real table
    truth = _truth_pairs(rows, thresh)
    assert got <= truth  # precision exact by construction
    recall = len(got & truth) / len(truth) if truth else 1.0
    assert recall >= 0.4, f"cross-cell miss rate collapsed: recall={recall}"


def test_semdedup_plan_shape(spark):
    """Cluster-bounded means NO cartesian product: the pair join is an
    equi-join on the cell id, assignment is zero-Exchange narrow math,
    and nothing falls back to Python."""
    _, df = _planted(spark)
    from entangledb_spark.operators.similarity import semantic_dedup_pairs

    plan = (
        semantic_dedup_pairs(df, threshold=THRESH, n_cells=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_ivf_assign_routes_identical(spark):
    """The literal-folded argmin and the Arrow matmul route (used above
    IVF_FOLD_MAX_CELLS, where 50k-cell SemDeDup lives) must produce
    identical (vec_id, cell) assignments — incl. multi-probe, where the
    stable argsort must reproduce the literal route's (dist, cell) tie
    order. Floats differ in summation order (BLAS vs SQL fold), so this
    holds because assignment margins are measured >> 1e-12."""
    from entangledb_spark.operators.similarity import ivf_assign, ivf_centroids

    _, df = _planted(spark)
    cents = ivf_centroids(df, 4).collect()
    for nprobe in (1, 2):
        lit = sorted(
            (r.vec_id, r.cell)
            for r in ivf_assign(df, cents, nprobe=nprobe, route="literal").collect()
        )
        arw = sorted(
            (r.vec_id, r.cell)
            for r in ivf_assign(df, cents, nprobe=nprobe, route="arrow").collect()
        )
        assert lit == arw, f"routes diverged at nprobe={nprobe}"
    # the arrow route preserves the input's embedding values
    arw_emb = {r.vec_id: list(r.embedding) for r in ivf_assign(df, cents, route="arrow").collect()}
    src = {r.vec_id: list(r.embedding) for r in df.collect()}
    assert arw_emb == src


def test_semantic_dedup_above_ceiling_route(spark, monkeypatch):
    """Forcing n_cells above the literal-folding ceiling (monkeypatched to
    0) must swap in the Arrow assignment + broadcast-join cent_sim and
    produce the SAME pairs, cent_sims (to float-route tolerance), and
    survivor set as the literal route."""
    import entangledb_spark.operators.similarity as sim

    _, df = _planted(spark)

    def snapshot():
        pairs = {
            (r.vec_a, r.vec_b): (r.cos_sim, r.cent_sim_a, r.cent_sim_b)
            for r in sim.semantic_dedup_pairs(df, threshold=THRESH, n_cells=4).collect()
        }
        surv = {
            r.vec_id
            for r in sim.semantic_dedup_survivors(df, threshold=THRESH, n_cells=4).collect()
        }
        return pairs, surv

    lit_pairs, lit_surv = snapshot()
    monkeypatch.setattr(sim, "IVF_FOLD_MAX_CELLS", 0)
    arw_pairs, arw_surv = snapshot()
    assert set(lit_pairs) == set(arw_pairs) and lit_pairs  # same candidate pairs
    for k, (cos_l, ca_l, cb_l) in lit_pairs.items():
        cos_a, ca_a, cb_a = arw_pairs[k]
        assert abs(cos_l - cos_a) < 1e-9
        assert abs(ca_l - ca_a) < 1e-9 and abs(cb_l - cb_a) < 1e-9
    assert lit_surv == arw_surv


ALL_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _gate_embeddings(spark, sf):
    return spark.read.parquet(f"{sf}/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_semdedup_gate_assignment_margin(spark, sf):
    """q73's semantic columns hash-gate a cross-engine argmin (nearest
    unit centroid by (-dot, cell)): measure, don't argue, that the
    corpus-minimum gap between best and second-best centroid distance
    dwarfs summation-order float noise (~1e-15). Parametrized over every
    density the gate can run at (advisor r6: pinning sf0.01 alone left
    regenerated/denser fixtures unguarded). Measured 2026-08 (r7):
    1.9e-4 / 7.8e-4 / 8.3e-5 at sf0.001/0.01/0.1."""
    import math

    from entangledb_spark.operators.similarity import ivf_centroids
    from entangledb_spark.operators.text import knuth_bucket
    from pyspark.sql import functions as F

    df = _gate_embeddings(spark, sf)
    cents = ivf_centroids(
        df, 8, refine=0, cell_expr=knuth_bucket(F.col("vec_id"), 8)
    ).collect()
    unit = {}
    for r in cents:
        n = math.sqrt(sum(float(x) * float(x) for x in r.centroid)) or 1.0
        unit[int(r.cell)] = np.array([float(x) / n for x in r.centroid])
    cells = sorted(unit)
    u = np.stack([unit[c] for c in cells])  # (n_cells, d)
    v = np.array([row.embedding for row in df.collect()])  # (n, d)
    d = -(v @ u.T)  # distance = -dot against unit centroids
    d.sort(axis=1)
    min_gap = float((d[:, 1] - d[:, 0]).min())
    assert min_gap > 1e-6, f"assignment margin collapsed to {min_gap} at {sf}"


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_kmeans_gate_margins(spark, sf):
    """q73's km_cell_r1 column (round 7) hash-gates one Lloyd refinement
    round. Two cross-engine float hazards, both measured at every density
    the gate can run at:

    (a) each refined centroid component is an r6-rounded MEAN whose raw
        value Spark and DuckDB sum in different orders (~1e-16 relative
        noise) — no raw mean may sit near the floor(x·1e6 + 0.5) FLIP
        boundary (x·1e6 at half-integers);
    (b) the refreshed argmin — minimum gap between best and second-best
        refined-centroid distance must dwarf summation noise.

    Measured 2026-08 (r7): see assertions."""
    import math

    from entangledb_spark.operators.similarity import ivf_assign, ivf_centroids
    from entangledb_spark.operators.text import knuth_bucket
    from pyspark.sql import functions as F

    df = _gate_embeddings(spark, sf)
    cents0 = ivf_centroids(
        df, 8, refine=0, cell_expr=knuth_bucket(F.col("vec_id"), 8)
    )
    # (a) raw (un-rounded) per-cell component means, flip distance at 1e6
    raw = (
        ivf_assign(df, cents0)
        .select("cell", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    flip = min(
        abs((r.m * 1000000 + 0.5) - round(r.m * 1000000 + 0.5)) for r in raw
    )
    assert flip > 1e-6, f"r6 flip margin of refined means collapsed to {flip} at {sf}"
    # (b) argmin gap against the r6-rounded refined centroids
    cents1 = ivf_centroids(
        df, 8, refine=1, cell_expr=knuth_bucket(F.col("vec_id"), 8)
    ).collect()
    unit = {}
    for r in cents1:
        n = math.sqrt(sum(float(x) * float(x) for x in r.centroid)) or 1.0
        unit[int(r.cell)] = np.array([float(x) / n for x in r.centroid])
    u = np.stack([unit[c] for c in sorted(unit)])
    v = np.array([row.embedding for row in df.collect()])
    d = -(v @ u.T)
    d.sort(axis=1)
    min_gap = float((d[:, 1] - d[:, 0]).min())
    assert min_gap > 1e-6, f"refined argmin margin collapsed to {min_gap} at {sf}"


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_semdedup_gate_loser_margin(spark, sf):
    """q73's is_sem_loser column (round 7) hash-gates the survivor policy's
    cent_sim_a vs cent_sim_b comparison across engines. Two safe regimes:
    bit-identical embeddings give bit-identical cent_sims inside EACH
    engine (tie falls to vec_id deterministically on both), and distinct
    embeddings must differ by far more than cross-engine summation-order
    noise (~1e-15). Asserts the minimum NONZERO |cent_sim_a - cent_sim_b|
    over the exact gate pair set at every density the gate can run at.
    Measured 2026-08 (r7): 6.1e-3 / 8.5e-3 / 1.3e-3 at sf0.001/0.01/0.1
    (18 / 19 / 249 gate pairs)."""
    from entangledb_spark.functions.numeric import r4
    from entangledb_spark.operators.similarity import semantic_dedup_pairs
    from entangledb_spark.operators.text import knuth_bucket
    from pyspark.sql import functions as F

    pairs = semantic_dedup_pairs(
        _gate_embeddings(spark, sf),
        threshold=-1.0,
        n_cells=8,
        refine=0,
        cell_expr=knuth_bucket(F.col("vec_id"), 8),
    ).filter(r4(F.col("cos_sim")) >= 0.4)
    gaps = pairs.select(
        F.abs(F.col("cent_sim_a") - F.col("cent_sim_b")).alias("gap")
    )
    row = gaps.agg(
        F.min(F.when(F.col("gap") > 0, F.col("gap"))).alias("min_pos"),
        F.count(F.lit(1)).alias("n_pairs"),
    ).collect()[0]
    assert row.n_pairs > 0, f"gate pair set empty at {sf} — margin unmeasurable"
    if row.min_pos is not None:  # all-tie corpora are trivially safe
        assert row.min_pos > 1e-6, (
            f"loser margin collapsed to {row.min_pos} at {sf}; "
            "r4 the cent_sims on both engines before comparing"
        )


def test_lsh_md5_twin_matches_python_reference(spark):
    """The q73 gate's md5-plane sign-LSH twin (lsh_gate_summary)
    recomputed in pure Python: plane sign = parity of the first 8 md5
    hex chars of '"seed,h,i"', dot folded left-to-right, bucket = sign
    bits MSB-first — bit-deterministic across Spark, DuckDB, and this
    reference."""
    import hashlib

    from entangledb_spark.operators.similarity import (
        N_HYPERPLANES,
        N_LSH_TABLES,
        lsh_gate_summary,
    )

    rows, df = _planted(spark)
    got = {r.vec_id: r.lsh0 for r in lsh_gate_summary(
        df.selectExpr("vec_id", "CAST(embedding AS array<double>) AS embedding")
    ).collect()}

    def sign(t, h, i):
        p = int(hashlib.md5(f"{t},{h},{i}".encode()).hexdigest()[:8], 16) % 2
        return 1.0 if p == 0 else -1.0

    for vid, vec in rows[:10]:
        b = 0
        for h in range(N_HYPERPLANES):
            d = 0.0
            for i, x in enumerate(vec):
                d += float(x) * sign(0, h, i)
            b = b * 2 + (1 if d > 0 else 0)
        assert got[vid] == b, vid
    assert N_LSH_TABLES >= 2  # the partner count spans multiple tables

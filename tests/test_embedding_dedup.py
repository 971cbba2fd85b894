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

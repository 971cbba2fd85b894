"""End-to-end VECTOR pipeline over the embeddings fixture — the
embedding-side twin of tests/test_pipeline_end_to_end.py, composing the
operators the way an embedding-corpus preparation + serving job chains
them:

  unit normalize → PCA whiten (trained projection) → SemDeDup survivors
  (cluster-bounded semantic dedup) → diversity quota (cluster-balanced
  sampling) → IVF-PQ code index build (residual, trained centroids) →
  guarded-ADC probe + exact rerank → recall audited vs brute force over
  the SERVED corpus.

Each stage consumes the previous stage's DataFrame; the invariants are
the ones a pipeline owner monitors: monotone survivor counts, quota
compliance, index/corpus consistency, and end recall of the serving
path against exact search over what was actually indexed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_vector_pipeline_end_to_end(spark, tmp_path):
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        probe_ivfpq_index,
    )
    from entangledb_spark.operators.projection import embedding_whiten, pca_fit
    from entangledb_spark.operators.selection import cluster_balanced_sample
    from entangledb_spark.operators.similarity import (
        ivf_centroids,
        norm,
        semantic_dedup_survivors,
    )

    raw = spark.read.parquet(f"{SF}/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )
    n0 = raw.count()

    # 1. unit normalization — cosine geometry becomes dot products
    unit = raw.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x / norm(F.col("embedding"))
        ).alias("embedding"),
    )

    # 2. PCA whitening (trained projection state): keep 3/4 of the basis
    model = pca_fit(unit)
    d = len(model["mean"])
    white = embedding_whiten(unit, model, k=(d * 3) // 4)
    assert len(white.first().embedding) == (d * 3) // 4

    # 3. semantic dedup in the whitened space
    survivors = semantic_dedup_survivors(white, threshold=0.9, n_cells=8)
    n1 = survivors.count()
    assert 0 < n1 <= n0

    # 4. diversity quota per k-means cell
    cents = ivf_centroids(survivors, 8, refine=1)
    quota = 55
    sampled = cluster_balanced_sample(survivors, cents, quota)
    per_cell = sampled.groupBy("cell").count().collect()
    assert all(r["count"] <= quota for r in per_cell)
    served = sampled.select("vec_id", "embedding")
    n2 = served.count()
    assert 0 < n2 <= n1

    # 5. IVF-PQ index over the served corpus (residual + trained cells,
    # the documented pairing) and a two-stage probe with exact rerank
    idx = str(tmp_path / "vec_pipeline_idx")
    build_ivfpq_index(
        served, idx, n_cells=8, refine=1, m=4, ksub=16,
        pq_refine=1, by_residual=True,
    )
    probes = served.orderBy("vec_id").limit(5)
    hits = probe_ivfpq_index(
        spark, idx, probes, k=5, nprobe=2, rerank_with=served, shortlist=80
    ).collect()
    byp: dict[int, list] = {}
    for r in hits:
        byp.setdefault(r.query_id, []).append(r)
    assert all(len(v) == 5 for v in byp.values())

    # 6. recall audit vs brute force over what was actually served
    x = {r.vec_id: np.array(r.embedding) for r in served.collect()}
    pids = sorted(byp)
    recalls = []
    for pid in pids:
        exact = sorted(
            (float(np.sum((x[pid] - v) ** 2)), vid)
            for vid, v in x.items()
            if vid != pid
        )[:5]
        want = {vid for _, vid in exact}
        got = {r.neighbor_id for r in byp[pid]}
        recalls.append(len(got & want) / 5)
        # reranked distances are exact — spot-verify against numpy
        for r in byp[pid]:
            assert abs(
                r.exact_dist - float(np.sum((x[pid] - x[r.neighbor_id]) ** 2))
            ) < 1e-9
    mean = sum(recalls) / len(recalls)
    print(f"vector pipeline recall@5: {mean:.2f} over {n2} served vectors")
    assert mean >= 0.6, recalls

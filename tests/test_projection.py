"""PCA / whitening (operators/projection.py): fit == numpy exactly-ish,
projection == numpy matmul, whitening unit variances, sign-canonical
refits, zero-exchange projection plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.projection import (
    embedding_whiten,
    pca_fit,
    pca_project,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )


@pytest.fixture(scope="module")
def fixture(spark):
    df = _emb(spark)
    x = np.array([r.embedding for r in df.orderBy("vec_id").collect()])
    model = pca_fit(df)
    return df, x, model


def test_fit_matches_numpy(fixture):
    _, x, model = fixture
    n, d = x.shape
    assert model["n"] == n
    mean = x.mean(axis=0)
    assert np.allclose(model["mean"], mean, atol=1e-12)
    cov = (x.T @ x) / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    assert np.allclose(model["eigvals"], w[order], atol=1e-10)
    # components match up to the canonical sign: |cos| == 1 per component
    comps = np.array(model["components"])
    ref = v[:, order].T
    dots = np.abs((comps * ref).sum(axis=1))
    assert np.allclose(dots, 1.0, atol=1e-10)
    # eigenvalues descending
    assert all(
        a >= b - 1e-12 for a, b in zip(model["eigvals"], model["eigvals"][1:])
    )


def test_project_matches_numpy(spark, fixture):
    df, x, model = fixture
    k = 4
    got = {
        r.vec_id: np.array(r.pca)
        for r in pca_project(df, model, k=k).collect()
    }
    comps = np.array(model["components"][:k])
    mean = np.array(model["mean"])
    want = (x - mean) @ comps.T
    ids = sorted(got)
    assert np.allclose(np.array([got[i] for i in ids]), want, atol=1e-9)


def test_whiten_unit_variances(spark, fixture):
    df, _, model = fixture
    k = 4
    w = embedding_whiten(df, model, k=k)
    assert w.columns == ["vec_id", "embedding"]
    y = np.array([r.embedding for r in w.collect()])
    assert y.shape[1] == k
    # population variance of each whitened component ~ 1
    var = y.var(axis=0)
    assert np.allclose(var, 1.0, atol=1e-6)
    # components are decorrelated after whitening
    c = np.cov(y, rowvar=False, bias=True)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-6


def test_refit_is_sign_canonical(spark, fixture):
    df, _, model = fixture
    again = pca_fit(df)
    assert np.allclose(model["components"], again["components"], atol=1e-12)
    assert np.allclose(model["mean"], again["mean"], atol=1e-15)


def test_projection_plan_zero_exchange_no_python(spark, fixture):
    df, _, model = fixture
    plan = (
        pca_project(df, model, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_variance_explained_improves_reconstruction(spark, fixture):
    """Reconstruction error from top-k components must decrease with k —
    the basic PCA contract, checked through the Spark projection."""
    df, x, model = fixture
    mean = np.array(model["mean"])
    errs = []
    for k in (1, 4, 8, x.shape[1]):
        comps = np.array(model["components"][:k])
        p = {
            r.vec_id: np.array(r.pca) for r in pca_project(df, model, k=k).collect()
        }
        ids = sorted(p)
        recon = np.array([p[i] for i in ids]) @ comps + mean
        errs.append(float(((x - recon) ** 2).sum()))
    assert all(a >= b - 1e-9 for a, b in zip(errs, errs[1:]))
    assert errs[-1] < 1e-12  # full basis reconstructs exactly


def test_whiten_feeds_ann_pipeline(spark, fixture, tmp_path):
    """Composition: embedding_whiten output drives the persistent ANN
    index end-to-end (schema-compatible, deterministic), and the probe's
    top-1 neighbors agree with numpy brute-force cosine over the SAME
    whitened vectors."""
    from entangledb_spark.operators.ann_index import (
        build_lsh_index,
        probe_lsh_index,
    )

    df, _, model = fixture
    w = embedding_whiten(df, model, k=8)
    d = str(tmp_path / "ann_white")
    build_lsh_index(w, d)
    probes = w.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.rk): r.neighbor_id
        for r in probe_lsh_index(spark, d, probes, k=3).collect()
    }
    y = {r.vec_id: np.array(r.embedding) for r in w.collect()}
    for q in range(5):
        qv = y[q]
        sims = sorted(
            (
                (float(qv @ v) / (np.linalg.norm(qv) * np.linalg.norm(v)), i)
                for i, v in y.items()
                if i != q
            ),
            key=lambda t: (-t[0], t[1]),
        )
        # LSH is approximate: assert the exact top-1 is retrieved at rk 1
        # (whitened sf0.001 corpus: measured recall 1.0 for top-1)
        assert got.get((q, 1)) == sims[0][1], q


def test_whiten_degenerate_eigvals_no_crash(spark):
    """A fit with n < d has exact-zero variance directions, and the
    moments-form covariance routinely reports them as slightly NEGATIVE
    eigenvalues — whitening with the default k must clamp instead of
    calling sqrt on a negative (the round-7 review finding)."""
    df = _emb(spark).limit(4)  # n=4 rows, d=64 dims → >= 60 null directions
    model = pca_fit(df)
    assert min(model["eigvals"]) < 1e-8  # the degenerate tail is real
    out = embedding_whiten(df, model)  # default k = full basis
    rows = out.collect()
    assert len(rows) == 4
    for r in rows:
        assert all(np.isfinite(v) for v in r.embedding)

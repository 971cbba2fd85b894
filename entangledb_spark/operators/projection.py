"""PCA / whitening for embedding corpora — the compression step before
ANN and clustering (project to the leading k components; whitening
equalizes component variances so cosine/L2 geometry stops being
dominated by the top direction).

Scale shape:

- **pca_fit** is ONE corpus pass: an Arrow-batched mapInPandas computes
  per-task partial moments (count, Σx, Σ flattened xxᵀ) — each task
  emits ONE row of 1 + d + d² doubles, so the reduce input is
  O(tasks · d²) regardless of corpus size — and the driver assembles
  mean/covariance and runs the d×d eigendecomposition locally (d is the
  embedding width, hundreds at most; the eigh is microseconds). This is
  the same deliberate Arrow exception as the above-ceiling IVF
  assignment: an element-wise d²-array SUM has no built-in aggregate,
  and the posexplode alternative would shuffle d² rows per vector.
- **pca_project / whiten** are ZERO-exchange narrow maps: the k
  component vectors (and the per-component -mean·comp offsets) fold
  into one SQL expression assembled as a single string (the ivf_assign
  driver-cost lesson), so projection is embarrassingly parallel
  codegen'd array math — no Python, no shuffle, no join.

Determinism: the fit's floating-point reduce is summation-order
dependent (~1e-15 relative) and eigenvectors are sign-ambiguous — the
model is therefore treated like trained state (persist it, don't
re-derive it per job), the ann_index centroid contract. Components are
sign-CANONICALIZED (largest-|component| coordinate made positive) so
re-fits on the same data produce the same orientation.

Reference: standard PCA/whitening (e.g. Jégou & Chum 2012, "Negative
evidences and co-occurrences in image retrieval: the benefit of PCA and
whitening", ECCV) — public method, no reference-repo counterpart.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pca_fit(emb: DataFrame, k: int | None = None, emb_col: str = "embedding") -> dict:
    """Fit PCA on an embedding column in one distributed pass.

    Returns {"mean": [d], "components": [k][d] (rows = components,
    descending eigenvalue), "eigvals": [k], "n": count}. ``k`` defaults
    to d (full basis)."""
    import numpy as np
    import pandas as pd

    from entangledb_spark.deploy import ensure_shipped

    spark = emb.sparkSession
    ensure_shipped(spark)

    def partial_moments(batches):
        count = 0
        s = None
        ss = None
        for pdf in batches:
            m = np.array(list(pdf["e"]), dtype=np.float64)
            if m.size == 0:
                continue
            count += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            g = m.T @ m
            ss = g if ss is None else ss + g
        if count:
            yield pd.DataFrame(
                {
                    "n": [count],
                    "s": [s.tolist()],
                    "ss": [ss.reshape(-1).tolist()],
                }
            )

    parts = emb.select(
        F.transform(F.col(emb_col), lambda x: x.cast("double")).alias("e")
    ).mapInPandas(
        partial_moments, "n long, s array<double>, ss array<double>"
    ).collect()
    if not parts:
        raise ValueError("pca_fit on an empty corpus")
    n = sum(int(r.n) for r in parts)
    d = len(parts[0].s)
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in parts:
        s += np.array(r.s)
        ss += np.array(r.ss).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = eigvals[order]
    comps = eigvecs[:, order].T  # rows = components
    # canonical sign: the largest-|coordinate| entry of each component
    # is made positive, so re-fits can't flip orientation
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    k = d if k is None else min(k, d)
    return {
        "mean": mean.tolist(),
        "components": comps[:k].tolist(),
        "eigvals": eigvals[:k].tolist(),
        "n": n,
    }


def _proj_sql(emb_col: str, comp: list[float], offset: float) -> str:
    """One component's projection as a single SQL string: dot(emb, comp)
    + offset, where offset = -dot(mean, comp) pre-computed driver-side
    (centering folds into a constant — the row never subtracts the mean
    vector)."""
    arr = "array(" + ",".join(f"CAST('{float(c)!r}' AS DOUBLE)" for c in comp) + ")"
    return (
        f"aggregate(zip_with({emb_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y), "
        f"CAST(0 AS DOUBLE), (a, v) -> a + v) + CAST('{float(offset)!r}' AS DOUBLE)"
    )


def pca_project(
    df: DataFrame,
    model: dict,
    k: int | None = None,
    emb_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project the embedding column onto the model's top-k components —
    a zero-exchange codegen'd map producing ``out_col`` array<double>.

    ``whiten=True`` scales each component by 1/sqrt(max(eigval, 0) + eps)
    so the projected space has unit per-component variance. The clamp
    matters: the moments-form covariance (Σxxᵀ/n − μμᵀ) routinely yields
    numerically NEGATIVE trailing eigenvalues (cancellation noise scales
    with ‖x‖², and any fit with n < d has exact-zero directions), which
    would otherwise hit sqrt of a negative number; such directions carry
    no variance, so whitening them by the eps floor is the right limit."""
    comps = model["components"]
    k = len(comps) if k is None else min(k, len(comps))
    mean = model["mean"]
    exprs = []
    for i in range(k):
        c = list(comps[i])
        if whiten:
            scale = 1.0 / math.sqrt(max(model["eigvals"][i], 0.0) + eps)
            c = [x * scale for x in c]
        offset = -sum(m * x for m, x in zip(mean, c))
        exprs.append(_proj_sql(emb_col, c, offset))
    return df.withColumn(out_col, F.expr("array(" + ",".join(exprs) + ")"))


def embedding_whiten(
    df: DataFrame,
    model: dict,
    k: int | None = None,
    emb_col: str = "embedding",
    out_col: str = "embedding",
) -> DataFrame:
    """PCA-whiten the embedding column in place (the pre-ANN transform):
    project to top-k with unit variances. Equivalent to
    pca_project(..., whiten=True) with the output replacing the input
    column."""
    out = pca_project(df, model, k=k, emb_col=emb_col, out_col="_pw", whiten=True)
    return out.drop(emb_col).withColumnRenamed("_pw", out_col)

"""Product Quantization for embedding corpora — the compression that
makes 100 TB-scale vector search serveable.

Scalar int8 quantization (q73's transform prep) buys 4x; PQ buys 32-64x:
split each d-dim vector into ``m`` contiguous subvectors, k-means each
subspace to ``ksub`` sub-centroids, and store the vector as m small
codes (one byte each for ksub <= 256). Search never decodes — ADC
(asymmetric distance computation) prices one query against a code by
summing m table lookups, so a 768-dim float32 corpus becomes m bytes
per vector and a probe costs m adds per candidate. This is the
standard serving design (Jégou, Douze & Schmid 2011, "Product
Quantization for Nearest Neighbor Search", TPAMI; FAISS's IVF-PQ) —
public method, no reference-repo counterpart.

Scale shape (each piece mirrors an existing audited pattern):

- **pq_train** seeds each subspace's codebook with DETERMINISTIC
  medoids (per hash-bucket lowest-id member — the ivf_centroids
  contract: reproducible with no RNG state) in ONE tiny aggregation,
  then runs optional Lloyd rounds at ONE Spark job per round: encode
  (zero-exchange literal argmin per subspace), posexplode ONCE, and a
  single (subspace, code, pos) mean aggregation updates ALL m
  codebooks together. Refined means land on the r6 grid (the k-means
  gate lesson: distributed summation is order-dependent at ~1e-16;
  the grid makes re-runs and the DuckDB oracle bit-identical).
- **pq_encode** is a ZERO-exchange codegen'd map — the m x ksub
  sub-centroids fold into one SQL string (the ivf_assign literal
  route, with the same (dist, code) tie order), argmin via
  array_sort; above PQ_FOLD_MAX centroid floats it auto-routes to an
  Arrow-batched numpy argmin (the _ivf_assign_arrow precedent) —
  route equivalence is asserted in tests. All input columns are
  preserved.
- **pq_adc_topk** folds each probe's m x ksub distance table into a
  literal lookup expression: score = sum over subspaces of
  LUT[j][code_j] — m element_at's and adds per (probe, candidate),
  no join, no decode; per-probe top-k keeps rank <= k via the
  row_number window (WindowGroupLimit — per-partition heaps).
  Probes are a bounded driver-side collect (the bm25_stats class).

Distance convention: ``metric="l2"`` scores by exact squared L2 to the
RECONSTRUCTED vector (the PQ paper's ADC); on unit-normalized inputs
(embedding_normalize first) L2 ordering == cosine ordering, which is
how the recall tests compare against the brute-force cosine oracle.

Determinism: seed medoids are exact (hash + min-id); refined centroids
sit on the r6 grid; encode argmins have measured cross-engine margins
(the q73 gate columns re-derive seed-codebook codes + an ADC distance
in DuckDB SQL — see q73_embed_transform and
tests/test_pq.py::test_pq_gate_margins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entangledb_spark.functions.numeric import r6

# Literal-folding ceiling for the encode route, counted in centroid
# FLOATS (m * ksub * dsub = m * ksub * d/m = ksub * d): same plan-text
# economics as IVF_FOLD_MAX_CELLS — ~20 chars of SQL per folded double,
# so 65k floats ~ 1.3 MB of plan text is the practical edge. Above it,
# encode auto-routes to the Arrow argmin path.
PQ_FOLD_MAX = 65536


def _vec_sql(vec) -> str:
    return "array(" + ",".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec) + ")"


def pq_train(
    e: DataFrame,
    m: int = 8,
    ksub: int = 16,
    refine: int = 0,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_expr=None,
) -> dict:
    """Train per-subspace codebooks in 1 + refine Spark jobs.

    Returns ``{"m", "dsub", "ksub", "codebooks": [m][<=ksub] entries of
    (code, subvector)}`` — codes are the seed bucket ids; a bucket/code
    that loses every member simply disappears (the ivf_centroids
    contract), so codebooks may hold fewer than ksub entries.

    ``bucket_expr`` overrides the seed bucketing Column (default
    xxhash64(id) % ksub) — pass a knuth_bucket expression when the seed
    medoids must be re-derivable in DuckDB SQL (the q73 gate).
    """
    d = e.select(F.size(emb_col).alias("d")).first().d
    if d % m != 0:
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    bucket = (
        bucket_expr
        if bucket_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(ksub))
    )
    emb_d = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    # ONE aggregation: per-bucket lowest-id member (map-side combined);
    # its m slices seed all m sub-codebooks at once
    seeds = (
        e.select(F.col(id_col).alias("_id"), emb_d.alias("_e"), bucket.alias("_b"))
        .groupBy("_b")
        .agg(F.min_by("_e", "_id").alias("_medoid"))
        .collect()
    )
    codebooks = [
        sorted(
            (int(r._b), [float(x) for x in r._medoid][j * dsub : (j + 1) * dsub])
            for r in seeds
        )
        for j in range(m)
    ]
    model = {"m": m, "dsub": dsub, "ksub": ksub, "codebooks": codebooks}
    for _ in range(refine):
        coded = pq_encode(
            e.select(F.col(id_col).alias("_id"), emb_d.alias("_e")),
            model,
            emb_col="_e",
            out_col="_codes",
        )
        # ONE job updates every subspace: posexplode once, key by
        # (subspace, that subspace's code, position-within-subspace)
        means = (
            coded.select("_codes", F.posexplode("_e").alias("_pos", "_v"))
            .select(
                (F.col("_pos") / dsub).cast("long").alias("_j"),
                F.element_at(
                    "_codes", ((F.col("_pos") / dsub).cast("int") + 1)
                ).alias("_c"),
                (F.col("_pos") % dsub).alias("_p"),
                "_v",
            )
            .groupBy("_j", "_c", "_p")
            .agg(r6(F.avg("_v")).alias("_mean"))
            .groupBy("_j", "_c")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_mean"))),
                    lambda s: s["_mean"],
                ).alias("_cent")
            )
            .collect()
        )
        by_j: dict[int, list] = {j: [] for j in range(m)}
        for r in means:
            by_j[int(r._j)].append((int(r._c), [float(x) for x in r._cent]))
        model = {
            "m": m,
            "dsub": dsub,
            "ksub": ksub,
            "codebooks": [sorted(by_j[j]) for j in range(m)],
        }
    return model


def pq_encode(
    df: DataFrame,
    model: dict,
    emb_col: str = "embedding",
    out_col: str = "pq_code",
    route: str = "auto",
) -> DataFrame:
    """Attach ``out_col`` array<bigint> (length m): each subspace's
    nearest sub-centroid code. All input columns are preserved.

    Literal route (default under PQ_FOLD_MAX folded floats): per
    subspace, argmin of ||x_j − c||² over the codebook — since ||x_j||²
    is constant within a subspace's argmin, the folded expression is
    (||c||²/2 − x_j·c), sorted as (dist, code) structs so ties break to
    the LOWER code on both routes and in the DuckDB oracle.
    """
    if out_col in df.columns:
        raise ValueError(
            f"pq_encode appends {out_col!r} but the input already has that "
            "column — rename or drop it first, or pass a different out_col"
        )
    m, dsub = model["m"], model["dsub"]
    n_floats = sum(len(cb) * dsub for cb in model["codebooks"])
    if route == "auto":
        route = "literal" if n_floats <= PQ_FOLD_MAX else "arrow"
    if route == "arrow":
        return _pq_encode_arrow(df, model, emb_col, out_col)
    subs = []
    for j, cb in enumerate(model["codebooks"]):
        lo = j * dsub + 1
        structs = ",".join(
            "struct("
            f"CAST('{sum(x * x for x in cent) / 2.0!r}' AS DOUBLE)"
            f" - aggregate(zip_with(slice({emb_col}, {lo}, {dsub}), "
            f"{_vec_sql(cent)}, (x, y) -> CAST(x AS DOUBLE) * y), "
            "CAST(0 AS DOUBLE), (a, v) -> a + v) AS dist, "
            f"CAST({code} AS BIGINT) AS code)"
            for code, cent in cb
        )
        subs.append(f"element_at(array_sort(array({structs})), 1).code")
    return df.withColumn(out_col, F.expr("array(" + ",".join(subs) + ")"))


def _pq_encode_arrow(
    df: DataFrame, model: dict, emb_col: str, out_col: str
) -> DataFrame:
    """Above-ceiling encode: broadcast the m stacked codebook matrices,
    one numpy argmin per subspace per Arrow batch. Tie order matches the
    literal route: codebook rows are code-ascending and argmin takes the
    first minimum."""
    import numpy as np
    from pyspark.sql import types as T

    from entangledb_spark.deploy import ensure_shipped

    spark = df.sparkSession
    ensure_shipped(spark)
    m, dsub = model["m"], model["dsub"]
    mats = []
    for cb in model["codebooks"]:
        codes = np.array([c for c, _ in cb], dtype=np.int64)
        cents = np.array([v for _, v in cb], dtype=np.float64)
        bias = 0.5 * (cents * cents).sum(axis=1)
        mats.append((codes, cents, bias))
    bc = spark.sparkContext.broadcast((m, dsub, mats))
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.LongType()))]
    )

    def encode_batches(batches):
        import numpy as _np

        b_m, b_dsub, b_mats = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _np.array(pdf[emb_col].tolist(), dtype=_np.float64)
            cols = []
            for j in range(b_m):
                codes, cents, bias = b_mats[j]
                xj = v[:, j * b_dsub : (j + 1) * b_dsub]
                dist = bias - xj @ cents.T  # (batch, ksub)
                cols.append(codes[_np.argmin(dist, axis=1)])
            out = pdf.copy()
            out[out_col] = list(_np.stack(cols, axis=1))
            yield out

    return df.mapInPandas(encode_batches, schema)


def pq_reconstruct_sql(model: dict, code_col: str) -> str:
    """SQL expression decoding ``code_col`` back to the approximate
    vector (concatenated sub-centroids) — debugging/audit aid; ADC never
    needs it."""
    parts = []
    for j, cb in enumerate(model["codebooks"]):
        cases = " ".join(
            f"WHEN {code} THEN {_vec_sql(cent)}" for code, cent in cb
        )
        parts.append(
            f"CASE element_at({code_col}, {j + 1}) {cases} ELSE NULL END"
        )
    return "concat(" + ",".join(parts) + ")"


def _probe_rows(probes, probe_id_col: str, probe_emb_col: str) -> list:
    if isinstance(probes, DataFrame):
        probes = probes.select(
            F.col(probe_id_col).alias("pid"),
            F.transform(F.col(probe_emb_col), lambda x: x.cast("double")).alias(
                "pemb"
            ),
        ).collect()
        return [(int(r.pid), [float(x) for x in r.pemb]) for r in probes]
    return [(int(p), [float(x) for x in v]) for p, v in probes]


def adc_score_sql(model: dict, pvec: list[float], code_col: str) -> str:
    """ONE probe's ADC scoring expression as a SQL string: the m x ksub
    squared-L2 lookup tables fold into literal arrays, a candidate costs
    m element_at + adds. Shared by the inline probes and the IVF-PQ
    index probe (ann_index.probe_ivfpq_index)."""
    dsub = model["dsub"]
    luts = []
    for j, cb in enumerate(model["codebooks"]):
        pj = pvec[j * dsub : (j + 1) * dsub]
        # sparse codes: table indexed by code id; gap codes can never
        # appear in data encoded by this model, priced 1e308 (not
        # inf — Spark's string→double cast doesn't parse 'inf')
        table = {c: sum((a - b) ** 2 for a, b in zip(pj, cent)) for c, cent in cb}
        width = max(table) + 1
        lut = [table.get(c, 1e308) for c in range(width)]
        luts.append(_vec_sql(lut))
    return (
        f"aggregate(zip_with({code_col}, array({','.join(luts)}), "
        "(c, l) -> element_at(l, CAST(c + 1 AS INT))), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )


def adc_lut_sql(model: dict, emb_col: str) -> str:
    """ADC lookup tables for the PROBE IN A COLUMN: the transpose of
    adc_score_sql. There the probe is a driver-side literal and the LUT
    folds into the plan per probe (plan size grows with the probe count);
    here the CODEBOOK is the literal — one model-sized fold shared by
    every probe row — and each probe row computes its own
    array<array<double>> LUT value (m sub-tables, entry c = squared L2
    of the probe's j-th subvector to sub-centroid c, gap codes 1e308
    exactly as adc_score_sql prices them). This is what makes the bulk
    probe route's plan size independent of the probe count. Element
    arithmetic and fold order match adc_score_sql term for term, so the
    two routes' distances are bit-identical."""
    dsub = model["dsub"]
    tables = []
    for j, cb in enumerate(model["codebooks"]):
        lo = j * dsub + 1
        by_code = dict(cb)
        width = max(by_code) + 1
        entries = []
        for c in range(width):
            if c in by_code:
                entries.append(
                    f"aggregate(zip_with(slice({emb_col}, {lo}, {dsub}), "
                    f"{_vec_sql(by_code[c])}, "
                    "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
                    "CAST(0 AS DOUBLE), (a, v) -> a + v)"
                )
            else:
                entries.append("CAST(1e308 AS DOUBLE)")
        tables.append("array(" + ",".join(entries) + ")")
    return "array(" + ",".join(tables) + ")"


def adc_lut_lookup_sql(code_col: str, lut_col: str) -> str:
    """Candidate-side ADC score against a LUT COLUMN (adc_lut_sql's
    output, delivered to the candidate row by a join): m element_at's and
    adds, the same fold adc_score_sql emits over its literal tables."""
    return (
        f"aggregate(zip_with({code_col}, {lut_col}, "
        "(c, l) -> element_at(l, CAST(c + 1 AS INT))), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
    )


def adc_lut_arrow(
    df: DataFrame, model: dict, emb_col: str, out_col: str
) -> DataFrame:
    """Above-PQ_FOLD_MAX LUT computation: broadcast the codebooks, one
    vectorized (probes x ksub) distance matrix per subspace per Arrow
    batch — the _pq_encode_arrow precedent. Gap codes priced 1e308 as in
    adc_score_sql/adc_lut_sql; float sums are numpy pairwise vs the SQL
    left fold, a ~1e-16 difference covered by the r4 route-equivalence
    grain."""
    import numpy as np
    from pyspark.sql import types as T

    from entangledb_spark.deploy import ensure_shipped

    spark = df.sparkSession
    ensure_shipped(spark)
    m, dsub = model["m"], model["dsub"]
    mats = []
    for cb in model["codebooks"]:
        by_code = dict(cb)
        width = max(by_code) + 1
        cents = np.array(
            [by_code.get(c, [0.0] * dsub) for c in range(width)], dtype=np.float64
        )
        gaps = np.array([c not in by_code for c in range(width)], dtype=bool)
        mats.append((cents, gaps))
    bc = spark.sparkContext.broadcast((m, dsub, mats))
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.ArrayType(T.DoubleType())))]
    )

    def lut_batches(batches):
        import numpy as _np

        b_m, b_dsub, b_mats = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _np.array(pdf[emb_col].tolist(), dtype=_np.float64)
            luts = []
            for j in range(b_m):
                cents, gaps = b_mats[j]
                xj = v[:, j * b_dsub : (j + 1) * b_dsub]
                # (batch, width): ||x - c||^2 expanded for one matmul
                d2 = (
                    (xj * xj).sum(axis=1)[:, None]
                    - 2.0 * (xj @ cents.T)
                    + (cents * cents).sum(axis=1)[None, :]
                )
                d2[:, gaps] = 1e308
                luts.append(d2)
            out = pdf.copy()
            out[out_col] = [
                [luts[j][i].tolist() for j in range(b_m)] for i in range(len(pdf))
            ]
            yield out

    return df.mapInPandas(lut_batches, schema)


def exact_l2_case_sql(rows: list, emb_col: str, probe_col: str = "probe_id") -> str:
    """Exact squared-L2 rerank expression: CASE on the probe-id column
    selecting the matching probe vector's folded distance. Shared by the
    inline two-stage search (pq_adc_rerank_topk) and the IVF-PQ index
    probe (ann_index.probe_ivfpq_index) so the rerank math cannot
    diverge between the two routes."""
    cases = " ".join(
        f"WHEN {pid} THEN aggregate(zip_with({emb_col}, {_vec_sql(pvec)}, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "CAST(0 AS DOUBLE), (a, v) -> a + v)"
        for pid, pvec in rows
    )
    return f"CASE {probe_col} {cases} END"


def _adc_scored(
    coded: DataFrame,
    model: dict,
    rows: list,
    code_col: str,
    keep_cols: list[str],
) -> DataFrame:
    """(keep_cols..., probe_id, adc_dist): the candidate × probe ADC
    relation — per-probe LUT literals (adc_score_sql); the probe axis is
    one explode (no join). An EMPTY probe set returns a typed empty
    relation (an empty literal array would otherwise fail struct-field
    extraction at plan time)."""
    if not rows:
        return coded.select(
            *keep_cols,
            F.lit(None).cast("long").alias("probe_id"),
            F.lit(None).cast("double").alias("adc_dist"),
        ).filter(F.lit(False))
    branches = [
        f"struct(CAST({pid} AS BIGINT) AS probe_id, "
        f"{adc_score_sql(model, pvec, code_col)} AS adc_dist)"
        for pid, pvec in rows
    ]
    return coded.select(
        *keep_cols,
        F.explode(F.expr("array(" + ",".join(branches) + ")")).alias("_s"),
    ).select(*keep_cols, F.col("_s.probe_id"), F.col("_s.adc_dist"))


def pq_adc_topk(
    coded: DataFrame,
    model: dict,
    probes,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    probe_id_col: str = "vec_id",
    probe_emb_col: str = "embedding",
) -> DataFrame:
    """Per-probe top-k by ADC squared-L2 — no decode, no join.

    ``probes`` is a DataFrame or (pid, vector) pairs (bounded — the
    probe set is the small side by construction). Returns (probe_id,
    id_col, adc_dist, rk) with rk 1..k per probe, ties on adc_dist
    broken by id for determinism.
    """
    from pyspark.sql import Window

    rows = _probe_rows(probes, probe_id_col, probe_emb_col)
    scored = _adc_scored(coded, model, rows, code_col, [id_col])
    w = Window.partitionBy("probe_id").orderBy(F.col("adc_dist").asc(), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("probe_id", id_col, "adc_dist", "rk")
    )


def pq_adc_rerank_topk(
    coded: DataFrame,
    model: dict,
    probes,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    emb_col: str = "embedding",
    probe_id_col: str = "vec_id",
    probe_emb_col: str = "embedding",
) -> DataFrame:
    """Two-stage search — the production FAISS pattern: ADC prices EVERY
    candidate from m-byte codes (cheap, approximate), keeps ``shortlist``
    per probe, then reranks only the shortlist by EXACT squared L2 on the
    full vectors. Recall equals the shortlist's coverage of the true
    top-k (measured in tests), while the exact math touches
    probes x shortlist rows instead of the whole corpus — the knob that
    trades recall for full-width reads at 100 TB.

    ``coded`` must carry both the codes and ``emb_col`` (pq_encode
    preserves its input columns). The exact distance folds each probe
    vector into a CASE branch on probe_id — still no join. Returns
    (probe_id, id_col, exact_dist, rk), rk 1..k per probe."""
    from pyspark.sql import Window

    rows = _probe_rows(probes, probe_id_col, probe_emb_col)
    scored = _adc_scored(coded, model, rows, code_col, [id_col, emb_col])
    w = Window.partitionBy("probe_id").orderBy(F.col("adc_dist").asc(), F.col(id_col))
    short = scored.withColumn("_ark", F.row_number().over(w)).filter(
        F.col("_ark") <= shortlist
    )
    exact = short.withColumn(
        "exact_dist",
        F.expr(exact_l2_case_sql(rows, emb_col))
        if rows
        else F.lit(None).cast("double"),
    )
    w2 = Window.partitionBy("probe_id").orderBy(
        F.col("exact_dist").asc(), F.col(id_col)
    )
    return (
        exact.withColumn("rk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rk") <= k)
        .select("probe_id", id_col, "exact_dist", "rk")
    )

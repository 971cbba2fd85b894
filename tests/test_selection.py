"""DSIR importance resampling (operators/selection.py): exactness vs an
independent Python reference, cross-engine parity vs a DuckDB SQL
re-derivation (the q92-gate recipe), target-preference on a planted
two-vocabulary corpus, deterministic Gumbel resampling, threshold-mode
selection, and the plan shape (broadcast diff join, no Python)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.selection import (
    DSIR_BUCKETS,
    GUMBEL_RES,
    dsir_log_weights,
    dsir_resample,
    dsir_select_threshold,
    feature_buckets,
)

B = 1000  # small bucket space for tests — collisions exercised, math same


def _py_bucket(tok: str, n_buckets: int = B) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % n_buckets


def _py_feats(text: str, n_buckets: int = B, bigrams: bool = True) -> list[int]:
    toks = text.lower().split()
    feats = list(toks)
    if bigrams and len(toks) >= 2:
        feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_py_bucket(t, n_buckets) for t in feats]


def _py_logw(raw_rows, target_rows, n_buckets: int = B) -> dict[int, float]:
    from collections import Counter

    cp: Counter = Counter()
    for _, t in target_rows:
        cp.update(_py_feats(t, n_buckets))
    cq: Counter = Counter()
    for _, t in raw_rows:
        cq.update(_py_feats(t, n_buckets))
    np_, nq = sum(cp.values()), sum(cq.values())
    out = {}
    for did, t in raw_rows:
        feats = _py_feats(t, n_buckets)
        s = sum(
            math.log(cp.get(b, 0) + 1) - math.log(cq.get(b, 0) + 1) for b in feats
        )
        out[did] = s + len(feats) * (
            math.log(nq + n_buckets) - math.log(np_ + n_buckets)
        )
    return out


RAW = [
    (0, "apple banana cherry apple orchard harvest"),
    (1, "banana cherry plum apple cider press"),
    (2, "gamma decay neutron flux reactor core shielding"),
    (3, "neutron capture cross section gamma spectroscopy"),
    (4, "apple pie with plum jam and cherry glaze"),
    (5, "reactor coolant loop neutron moderator graphite"),
    (6, "short"),
    (7, ""),
]
TARGET = [
    (100, "apple orchard banana plantation cherry grove plum harvest"),
    (101, "cider press apple jam plum pie cherry tart"),
]


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_logw_matches_python_reference(spark, corpora):
    raw, target = corpora
    got = {
        r.doc_id: r.logw
        for r in dsir_log_weights(raw, target, n_buckets=B).collect()
    }
    want = _py_logw(RAW, TARGET, B)
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d
    # empty doc: zero features -> logw exactly 0
    assert got[7] == 0.0


def test_logw_matches_duckdb(spark, corpora):
    """Full cross-engine re-derivation — the recipe the q92 gate columns
    use: token hash = ('0x' || substr(md5(tok),1,6))::BIGINT % B, same
    smoothing algebra, SQL only."""
    raw, target = corpora
    con = duckdb.connect()
    for name, rows in (("raw", RAW), ("target", TARGET)):
        con.execute(
            f"CREATE TABLE {name} AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, {t!r})" for i, t in rows)
            + ") AS v(doc_id, text)"
        )
    feats_sql = """
        SELECT doc_id, ('0x' || substr(md5(f), 1, 6))::BIGINT % {B} AS bucket
        FROM (
          SELECT doc_id, unnest(
            list_concat(
              toks,
              CASE WHEN len(toks) >= 2 THEN list_transform(
                range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
              ELSE [] END)) AS f
          FROM (SELECT doc_id,
                       regexp_extract_all(lower(text), '[^ \\t\\n\\x0B\\f\\r]+') AS toks
                FROM {tbl})
        )
    """
    duck = dict(
        con.execute(
            f"""
        WITH tf AS ({feats_sql.format(B=B, tbl='target')}),
             rf AS ({feats_sql.format(B=B, tbl='raw')}),
             cp AS (SELECT bucket, count(*) AS c FROM tf GROUP BY bucket),
             cq AS (SELECT bucket, count(*) AS c FROM rf GROUP BY bucket),
             tot AS (SELECT (SELECT count(*) FROM tf) AS np,
                            (SELECT count(*) FROM rf) AS nq),
             diff AS (
               SELECT coalesce(cp.bucket, cq.bucket) AS bucket,
                      ln(coalesce(cp.c, 0) + 1) - ln(coalesce(cq.c, 0) + 1) AS d
               FROM cp FULL OUTER JOIN cq ON cp.bucket = cq.bucket)
        SELECT r.doc_id,
               coalesce(sum(diff.d), 0)
               + count(rf.bucket) * (ln(tot.nq + {B}) - ln(tot.np + {B}))
        FROM raw r
        LEFT JOIN rf ON rf.doc_id = r.doc_id
        LEFT JOIN diff ON diff.bucket = rf.bucket
        CROSS JOIN tot
        GROUP BY r.doc_id, tot.np, tot.nq
        """
        ).fetchall()
    )
    got = {
        r.doc_id: r.logw
        for r in dsir_log_weights(raw, target, n_buckets=B).collect()
    }
    assert set(got) == set(duck)
    for d in got:
        assert abs(got[d] - duck[d]) < 1e-9, d


def test_resample_prefers_target_like_docs(spark, corpora):
    """On LENGTH-COMPARABLE units (the paper scores fixed-size chunks;
    the operator docstring documents the length bias), fruit-vocabulary
    docs must outrank nuclear-physics docs under a fruit target, and the
    Gumbel perturbation must not overturn a vocabulary-scale gap."""
    raw, target = corpora
    comparable = raw.filter(F.col("doc_id") <= 5)  # 6-7 word docs each
    top3 = {
        r.doc_id for r in dsir_resample(comparable, target, 3, n_buckets=B).collect()
    }
    assert top3 == {0, 1, 4}


def test_length_bias_is_real_and_documented(spark, corpora):
    """The documented failure mode, demonstrated: with the near-empty
    docs kept in, logw ~ 0 beats every long negative-sum doc — which is
    exactly why selection composes AFTER chunking/min-length gates."""
    raw, target = corpora
    w = {r.doc_id: r.logw for r in dsir_log_weights(raw, target, n_buckets=B).collect()}
    assert w[7] == 0.0
    assert w[7] > max(w[d] for d in (0, 1, 2, 3, 4, 5))


def test_resample_deterministic(spark, corpora):
    raw, target = corpora
    a = [r.doc_id for r in dsir_resample(raw, target, 5, n_buckets=B).collect()]
    b = [r.doc_id for r in dsir_resample(raw, target, 5, n_buckets=B).collect()]
    assert a == b and len(a) == 5


def test_threshold_selection(spark, corpora):
    raw, target = corpora
    sel = dsir_select_threshold(raw, target, 0.5, n_buckets=B)
    rows = sel.collect()
    assert 3 <= len(rows) <= 5  # ~half of 8, quantile-cut inclusive
    cut = min(r.score for r in rows)
    all_scores = {
        r.doc_id: r.score
        for r in dsir_select_threshold(raw, target, 1.0, n_buckets=B).collect()
    }
    kept = {r.doc_id for r in rows}
    for did, s in all_scores.items():
        assert (s >= cut) == (did in kept)


def test_plan_shape(spark, corpora):
    """Literal route (the default below DSIR_LITERAL_MAX_BUCKETS):
    scoring is a PURE NARROW MAP — zero Exchange, zero joins, the diff
    array folded into the plan. Join route (forced): the per-doc weight
    join must BROADCAST the <= n_buckets diff table (never shuffle the
    exploded corpus against it). Neither falls back to Python."""
    raw, target = corpora
    lit_plan = (
        dsir_log_weights(raw, target, n_buckets=B, route="literal")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in lit_plan
    assert "Join" not in lit_plan
    assert "BatchEvalPython" not in lit_plan
    join_plan = (
        dsir_log_weights(raw, target, n_buckets=B, route="join")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in join_plan
    assert "CartesianProduct" not in join_plan
    assert "BatchEvalPython" not in join_plan


def test_routes_agree(spark, corpora):
    """Same addends, different summation order: the two routes must agree
    to float tolerance on every doc (incl. the zero-feature doc), and
    'auto' at the default bucket count must pick the literal route."""
    raw, target = corpora
    lit = {
        r.doc_id: (r.n_feats, r.logw)
        for r in dsir_log_weights(raw, target, n_buckets=B, route="literal").collect()
    }
    jnd = {
        r.doc_id: (r.n_feats, r.logw)
        for r in dsir_log_weights(raw, target, n_buckets=B, route="join").collect()
    }
    assert set(lit) == set(jnd)
    for d in lit:
        assert lit[d][0] == jnd[d][0], d
        assert abs(lit[d][1] - jnd[d][1]) < 1e-9, d
    assert lit[7] == (0, 0.0)
    auto_plan = (
        dsir_log_weights(raw, target, n_buckets=B)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in auto_plan  # auto == literal at 1000 buckets


@pytest.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_q91_dsir_r4_boundary_margin(spark, sf):
    """q91 gates r4(dsir_logw) — a cross-engine float at |logw| ~ 100,
    where double noise is ~1e-12 absolute. Measure (don't argue) that no
    gate row's logw sits near the r4 FLIP boundary at any density the
    gate can run at (measured over ALL docs, a superset of the 100 gated
    sample rows — the conservative bound).

    The flip boundary of floor(x·10⁴ + 0.5) is where x·10⁴ + 0.5 crosses
    an integer — i.e. x·10⁴ at HALF-integers. An earlier version of this
    test measured distance to the nearest integer of x·10⁴, which is the
    safest point of the rounding cell, not the cliff. Measured 2026-08
    (r7, corrected): min flip distance 4.6e-8 / 3.1e-7 / 3.5e-9 at
    sf0.001/0.01/0.1 — 3+ orders above the ~1e-12 cross-engine
    summation noise at |logw| ~ 100."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    w = dsir_log_weights(
        docs, docs.filter(F.col("source") == "src0").select("text")
    )
    rows = w.select("logw").collect()
    dist = [
        abs((r.logw * 10000 + 0.5) - round(r.logw * 10000 + 0.5)) / 10000
        for r in rows
        if r.logw is not None
    ]
    m = min(dist)
    assert m > 1e-10, f"r4 flip-boundary margin collapsed to {m} at {sf}"


def test_gumbel_key_is_proper_and_hash_uniform(spark):
    """Gumbel keys from sequential ids: all finite, deterministic, and
    the underlying u-values spread across (0,1) (knuth hash, not the id
    order)."""
    from entangledb_spark.operators.selection import gumbel_key

    df = spark.range(1000).select(
        F.col("id"), gumbel_key(F.col("id")).alias("g")
    )
    rows = df.collect()
    gs = [r.g for r in rows]
    assert all(math.isfinite(g) for g in gs)
    # Gumbel(0,1): median ~0.3665, P(g<0) ~ e^-1; loose sanity bands
    neg = sum(g < 0 for g in gs) / len(gs)
    assert 0.25 < neg < 0.5, neg
    assert len(set(gs)) > 900  # GUMBEL_RES >> n, near-no collisions
    assert GUMBEL_RES >= 2**20


def test_cluster_balanced_sample_matches_reference(spark):
    """Survivors == pure-Python reference: assign each vector to its
    nearest refined centroid ((-dot, cell) order), rank within cell by
    (knuth_key, id), keep rank <= quota. Also pins the quota semantics:
    every cell's survivor count is min(quota, |cell|)."""
    import math as _m

    from entangledb_spark.operators.selection import cluster_balanced_sample
    from entangledb_spark.operators.similarity import ivf_centroids
    from entangledb_spark.operators.text import HASH_M, SAMPLE_K

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )
    quota = 40
    cents = ivf_centroids(df, 8, refine=1).collect()
    unit = {}
    for r in cents:
        n = _m.sqrt(sum(float(x) * float(x) for x in r.centroid)) or 1.0
        unit[int(r.cell)] = [float(x) / n for x in r.centroid]
    rows = [(r.vec_id, [float(x) for x in r.embedding]) for r in df.collect()]
    by_cell: dict[int, list[int]] = {}
    for vid, v in rows:
        best = min(
            (-sum(x * y for x, y in zip(v, u)), c) for c, u in unit.items()
        )
        by_cell.setdefault(best[1], []).append(vid)
    want = set()
    for c, vids in by_cell.items():
        key = lambda i: ((i % HASH_M) * (SAMPLE_K % HASH_M) % HASH_M, i)
        want |= set(sorted(vids, key=key)[:quota])
    got_rows = cluster_balanced_sample(df, cents, quota).collect()
    got = {r.vec_id for r in got_rows}
    assert got == want
    per_cell = {}
    for r in got_rows:
        per_cell[r.cell] = per_cell.get(r.cell, 0) + 1
    for c, n in per_cell.items():
        assert n == min(quota, len(by_cell[c]))


def test_cluster_balanced_sample_plan_shape(spark):
    """Assignment stays zero-Exchange narrow math; the only shuffle is
    the per-cell rank window. Nothing falls back to Python, nothing goes
    cartesian."""
    from entangledb_spark.operators.selection import cluster_balanced_sample
    from entangledb_spark.operators.similarity import ivf_centroids

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )
    cents = ivf_centroids(df, 8).collect()
    plan = (
        cluster_balanced_sample(df, cents, 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # hashpartition by cell (+AQE read)


def test_cluster_balanced_sample_carries_columns_and_custom_names(spark):
    """The survivor frame keeps EVERY input column (the curation shape:
    id + embedding + text + metadata), and custom id/embedding column
    names route all the way through ivf_assign (the round-7 review
    finding: both used to be hardcoded to vec_id/embedding)."""
    from entangledb_spark.operators.selection import cluster_balanced_sample
    from entangledb_spark.operators.similarity import ivf_centroids

    base = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).selectExpr("vec_id", "CAST(embedding AS array<double>) AS embedding")
    cents = ivf_centroids(base, 8, refine=1).collect()
    want = {r.vec_id for r in cluster_balanced_sample(base, cents, 40).collect()}

    renamed = base.selectExpr(
        "vec_id AS doc_id",
        "embedding AS emb",
        "vec_id * 10 AS payload",
    )
    got_rows = cluster_balanced_sample(
        renamed, cents, 40, id_col="doc_id", emb_col="emb"
    ).collect()
    assert {r.doc_id for r in got_rows} == want  # same survivors, any names
    assert set(got_rows[0].asDict()) == {"doc_id", "emb", "payload", "cell"}
    assert all(r.payload == r.doc_id * 10 for r in got_rows)  # columns intact


# ------------------------------------------------- mixture materialization


def test_materialize_mixture_matches_duckdb(spark):
    """The emitted row set — (doc_id, epoch, mix_id, mix_key, shard) per
    copy — re-derived exactly in DuckDB SQL from the same BIGINT
    arithmetic (knuth_bucket/knuth_key fragments), fractional epochs and
    multi-epoch repetition included."""
    from entangledb_spark.operators.selection import MIX_RES, materialize_mixture
    from entangledb_spark.operators.text import (
        HASH_M,
        SAMPLE_K,
        knuth_bucket_sql,
        knuth_key_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source"
    )
    weights = {"src0": 2.5, "src1": 1.0, "src2": 0.25}
    n_shards = 16
    got = sorted(
        (r.doc_id, r.epoch, r.mix_id, r.mix_key, r.shard)
        for r in materialize_mixture(
            docs, weights, n_shards=n_shards
        ).collect()
    )
    max_epochs = 2
    cases = " ".join(
        f"WHEN '{s}' THEN {int(w)} + (CASE WHEN "
        f"{knuth_bucket_sql('doc_id', MIX_RES)} < {round((w - int(w)) * MIX_RES)} "
        f"THEN 1 ELSE 0 END)"
        for s, w in weights.items()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(t)
        for t in con.execute(
            f"""
            WITH d AS (
              SELECT doc_id, CASE source {cases} ELSE 0 END AS copies
              FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
            ),
            e AS (
              SELECT doc_id, unnest(range(0, copies)) AS epoch
              FROM d WHERE copies > 0
            )
            SELECT doc_id, CAST(epoch AS INTEGER) AS epoch,
                   CAST(doc_id * {max_epochs + 1} + epoch AS BIGINT) AS mix_id,
                   CAST(({knuth_key_sql('doc_id')} + epoch * {SAMPLE_K})
                        % {HASH_M} AS BIGINT) AS mix_key,
                   CAST((({knuth_key_sql('doc_id')} + epoch * {SAMPLE_K})
                        % {HASH_M}) * {n_shards} // {HASH_M} AS INTEGER) AS shard
            FROM e ORDER BY doc_id, epoch
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_materialize_mixture_semantics(spark):
    """Copy-count semantics: floor(w) epochs for every doc plus the
    hash-fraction extra; counts land within hash-rounding of w·n; docs
    of a weight-1.0 source appear exactly once; unlisted sources drop
    (default) or get default_weight; mix_id is unique; shards are
    near-uniform; two runs are identical."""
    from entangledb_spark.operators.selection import materialize_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "lang"
    )
    n_by_src = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    weights = {"src0": 2.5, "src1": 1.0}
    mix = materialize_mixture(docs, weights)
    rows = mix.collect()
    by_src: dict[str, int] = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # src2 unlisted -> dropped entirely
    assert set(by_src) == {"src0", "src1"}
    assert by_src["src1"] == n_by_src["src1"]  # exactly one epoch
    # src0 at 2.5: every doc 2 or 3 times, total within 10% of 2.5n
    src0 = [r for r in rows if r.source == "src0"]
    per_doc: dict[int, int] = {}
    for r in src0:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert set(per_doc.values()) <= {2, 3}
    assert abs(by_src["src0"] - 2.5 * n_by_src["src0"]) <= 0.1 * 2.5 * n_by_src["src0"]
    # mix_id unique; passthrough columns survive; determinism
    ids = [r.mix_id for r in rows]
    assert len(ids) == len(set(ids))
    assert {c for c in mix.columns} >= {"doc_id", "source", "lang", "epoch",
                                        "mix_id", "mix_key", "shard"}
    again = sorted((r.mix_id, r.mix_key) for r in materialize_mixture(
        docs, weights).collect())
    assert again == sorted((r.mix_id, r.mix_key) for r in rows)
    # default_weight keeps unlisted sources
    with_def = materialize_mixture(docs, weights, default_weight=1.0)
    assert with_def.filter(F.col("source") == "src2").count() == n_by_src["src2"]
    # shards near-uniform under the HIGH-bits split (low bits of a
    # multiplicative hash are weak — mod-64 hit only ~half the shards
    # when this operator was first written): a corpus-wide 1.5x mix
    # (751 rows) must hit every shard with bounded imbalance
    full = materialize_mixture(docs, {}, default_weight=1.5)
    shard_counts = [
        r.n for r in full.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(shard_counts) == 64
    assert max(shard_counts) <= 2 * min(shard_counts), sorted(shard_counts)
    # bad weights fail loudly
    with pytest.raises(ValueError, match="finite"):
        materialize_mixture(docs, {"src0": float("nan")})
    with pytest.raises(ValueError, match="finite"):
        materialize_mixture(docs, {"src0": -1.0})


def test_materialize_mixture_is_shuffle_free(spark):
    """The mix is ONE narrow pass: no Exchange of any kind in the plan —
    the interleave is data (mix_key), never a sort."""
    from entangledb_spark.operators.selection import materialize_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source"
    )
    plan = (
        materialize_mixture(docs, {"src0": 2.5, "src1": 1.0, "src2": 0.25})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan


def test_materialize_mixture_feeds_packing(spark):
    """Composition with the packer: mix_id is the unique document key of
    the materialized mix, so pack_greedy shards and packs it like any
    corpus — every emitted copy lands in exactly one sequence."""
    from entangledb_spark.operators.packing import pack_greedy
    from entangledb_spark.operators.selection import materialize_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source", "text"
    )
    mix = materialize_mixture(docs, {"src0": 1.5, "src1": 1.0}).select(
        F.col("mix_id").alias("doc_id"), "text"
    )
    n_mix = mix.count()
    packed = pack_greedy(spark, mix)
    assert packed.count() == n_mix
    assert packed.select("doc_id").distinct().count() == n_mix


# ------------------------------------------------- leakage-safe split


def test_leakage_safe_split_pairs_never_straddle(spark):
    """Every near-dup pair lands on ONE side; proportions track val_frac;
    assignment is deterministic and seed-sensitive; DuckDB re-derives the
    exact split from (doc_id, split_key)."""
    import duckdb

    from entangledb_spark.operators.selection import MIX_RES, leakage_safe_split
    from entangledb_spark.operators.text import knuth_bucket_sql

    docs = spark.range(0, 2000).toDF("doc_id")
    # chains 0-1-2, 10-11, and a larger clique 100..104
    pair_rows = [(0, 1), (1, 2), (10, 11)] + [
        (100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)
    ]
    pairs = spark.createDataFrame(pair_rows, "id_a long, id_b long")
    out = leakage_safe_split(docs, pairs, val_frac=0.25, seed=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 2000
    # co-location: all pair members share split_key AND side
    for a, b in pair_rows:
        assert rows[a]["split_key"] == rows[b]["split_key"]
        assert rows[a]["split"] == rows[b]["split"]
    # transitive: the 0-1-2 chain is one cluster
    assert rows[0]["split_key"] == rows[2]["split_key"] == 0
    # proportions in the right neighborhood (Knuth hash, not exact)
    n_val = sum(1 for r in rows.values() if r["split"] == "val")
    assert 0.15 < n_val / 2000 < 0.35
    # deterministic rerun; different seed moves some docs
    again = {r["doc_id"]: r["split"] for r in
             leakage_safe_split(docs, pairs, val_frac=0.25, seed=3).collect()}
    assert again == {k: v["split"] for k, v in rows.items()}
    other = {r["doc_id"]: r["split"] for r in
             leakage_safe_split(docs, pairs, val_frac=0.25, seed=99).collect()}
    assert other != again
    # engine-portable: DuckDB re-derives split from split_key exactly
    con = duckdb.connect()
    con.execute("CREATE TABLE s (doc_id BIGINT, split_key BIGINT, split VARCHAR)")
    con.executemany(
        "INSERT INTO s VALUES (?, ?, ?)",
        [(int(k), int(v["split_key"]), v["split"]) for k, v in rows.items()],
    )
    cut = round(0.25 * MIX_RES)
    mismatch = con.execute(
        f"SELECT count(*) FROM s WHERE split != "
        f"(CASE WHEN {knuth_bucket_sql('split_key + 3', MIX_RES)} < {cut} "
        f"THEN 'val' ELSE 'train' END)"
    ).fetchone()[0]
    assert mismatch == 0
    con.close()


def test_leakage_safe_split_validates(spark):
    from entangledb_spark.operators.selection import leakage_safe_split

    docs = spark.range(5).toDF("doc_id")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    with pytest.raises(ValueError, match="val_frac"):
        leakage_safe_split(docs, pairs, val_frac=1.5)
    out = leakage_safe_split(docs, pairs, val_frac=0.0)
    assert all(r["split"] == "train" for r in out.collect())

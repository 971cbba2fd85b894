"""DSIR-style data selection via importance resampling (Xie et al.,
"Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169): pick raw-corpus documents whose hashed n-gram
distribution looks like a TARGET corpus — the standard way to tilt a
web-scale crawl toward a high-quality or in-domain target without
training a classifier.

Method (the paper's, unchanged): featurize every document as hashed
unigram+bigram counts over ``n_buckets`` buckets; fit bag-of-buckets
multinomials p (target) and q (raw) with add-one smoothing; per raw doc
the importance log-weight is

    log w(doc) = sum over features  log p_bucket - log q_bucket

and the resample draws k docs with probability proportional to w via the
Gumbel-top-k trick. Determinism: the Gumbel noise is derived from a
knuth-bucket hash of the doc id (u in (0,1) -> -ln(-ln(u))), so the same
corpus always selects the same documents — reproducible across runs,
cluster sizes, AND engines (every piece, including the token hash
conv(substr(md5(token),1,6),16,10), is re-derivable in DuckDB SQL; the
q92 gate columns do exactly that).

Spark shape, and why it scales:
- the two distributions are corpus aggregations with map-side combine
  whose RESULT is <= n_buckets rows (10k default) — tiny regardless of
  corpus size, and bucket keys are md5-uniform (no Zipf skew: the
  hottest token spreads nothing, it IS one bucket among 10k);
- per-doc weights: one explode + ONE broadcast join against the <=
  n_buckets diff table + per-doc sum (one exchange keyed by doc id);
- selection: top-k by (logw + gumbel) fuses to TakeOrderedAndProject for
  bench-scale k; at production scale select by THRESHOLD instead — take
  an approxQuantile of the score and filter, which is one narrow pass
  and no global sort (dsir_select_threshold).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DSIR_BUCKETS = 10_000
GUMBEL_RES = 2**20  # hash-uniform resolution for the deterministic Gumbel

# the corpus token definition shared with operators/text.py (any
# non-whitespace run, explicit class so both engines agree)
_TOKEN_RE = r"[^ \t\n\x0B\f\r]+"


def token_bucket(tok: Column, n_buckets: int = DSIR_BUCKETS) -> Column:
    """Cross-engine string->bucket hash: the first 6 md5 hex chars as an
    integer, mod n_buckets. 24 bits >> 10k buckets, and DuckDB re-derives
    it exactly: ('0x' || substr(md5(t), 1, 6))::BIGINT % n."""
    return F.pmod(
        F.conv(F.substring(F.md5(tok), 1, 6), 16, 10).cast("long"),
        F.lit(int(n_buckets)),
    )


def feature_buckets(
    text: Column, n_buckets: int = DSIR_BUCKETS, bigrams: bool = True
) -> Column:
    """Hashed n-gram feature buckets of a document (array<long>):
    unigrams + (optionally) space-joined bigrams of the lowercased
    whitespace tokens — the paper's hashed n-gram featurization."""
    toks = F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_RE), 0)
    feats = toks
    if bigrams:
        bi = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(1))),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(toks, bi)
    return F.transform(feats, lambda t: token_bucket(t, n_buckets))


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """(bucket, cnt) distribution of a corpus — <= n_buckets rows out,
    map-side combined, hash-uniform keys."""
    return (
        docs.select(
            F.explode(feature_buckets(F.col(text_col), n_buckets, bigrams)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Literal-route ceiling: the folded diff ARRAY is one double literal per
# bucket (~20 chars of plan text), so 20k buckets ~ 400 KB — comfortably
# inside plan-size limits while keeping lookups O(1) array indexing
# (integer bucket ids need no crc trick, unlike langid's string grams).
# Above it the scoring falls back to the explode + broadcast-join +
# per-doc-regroup shape, which works at any bucket count but pays one
# corpus-sized exchange.
DSIR_LITERAL_MAX_BUCKETS = 20_000


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    bigrams: bool = True,
    route: str = "auto",
) -> DataFrame:
    """Per-raw-document importance log-weight under add-one-smoothed
    bag-of-buckets multinomials:

        logw = sum_features [ln(cp_b + 1) - ln(cq_b + 1)]
               + n_feats * [ln(Nq + B) - ln(Np + B)]

    (the constant-term factoring keeps the diff table at only the
    OBSERVED buckets — unseen buckets contribute ln(1)=0 plus the
    constant, exactly add-one smoothing). Returns (id, n_feats, logw);
    docs with zero tokens get logw = 0.

    Two physical routes, same addends (summation order differs, ~1e-13;
    parity asserted in tests/test_selection.py):

    - ``route="literal"`` (auto while n_buckets <=
      DSIR_LITERAL_MAX_BUCKETS): the two bounded distribution aggregates
      collect into ONE length-n_buckets double-array literal and scoring
      is a pure narrow fold with O(1) array indexing — ZERO exchanges on
      the corpus, embarrassingly parallel, and streaming-safe (a
      stateless projection; a readStream scores with the same
      expression).
    - ``route="join"`` (above the ceiling): explode features, broadcast
      the diff table, regroup per doc — one corpus-sized exchange, but
      no plan-size ceiling."""
    tp = bucket_counts(target, text_col, n_buckets, bigrams)
    tq = bucket_counts(raw, text_col, n_buckets, bigrams)
    if route == "auto":
        route = "literal" if n_buckets <= DSIR_LITERAL_MAX_BUCKETS else "join"
    if route == "literal":
        # ONE corpus-scale job per distribution: totals are just the sums
        # of the collected dicts (a separate agg action would re-run the
        # whole tokenize+hash+aggregate — round-7 review finding)
        lp = {int(r.bucket): float(r.cnt) for r in tp.collect()}
        lq = {int(r.bucket): float(r.cnt) for r in tq.collect()}
        const = math.log(sum(lq.values()) + n_buckets) - math.log(
            sum(lp.values()) + n_buckets
        )
        diffs = [
            math.log(lp.get(b, 0.0) + 1.0) - math.log(lq.get(b, 0.0) + 1.0)
            for b in range(n_buckets)
        ]
        # ONE SQL string for the bulky literal (the langid/ivf_assign
        # lesson: thousands of Column-API calls cost seconds of driver
        # round-trips per plan)
        darr = F.expr(
            "array(" + ",".join(f"CAST('{d!r}' AS DOUBLE)" for d in diffs) + ")"
        )
        from entangledb_spark.operators.fingerprints import _let

        def with_feats(feats):
            n = F.size(feats)
            s = F.aggregate(
                feats,
                F.lit(0.0),
                lambda acc, b: acc + F.element_at(darr, (b + 1).cast("int")),
            )
            return F.struct(
                n.cast("long").alias("n_feats"),
                (s + n * const).alias("logw"),
            )

        # coalesce: a NULL text yields a NULL feature array, whose
        # size/aggregate would poison the fold — the join route's
        # explode_outer treats it as zero features, so must we
        packed = _let(
            F.coalesce(
                feature_buckets(F.col(text_col), n_buckets, bigrams),
                F.array().cast("array<long>"),
            ),
            with_feats,
        )
        return raw.select(F.col(id_col), packed.alias("_p")).select(
            id_col,
            F.col("_p.n_feats").alias("n_feats"),
            F.col("_p.logw").alias("logw"),
        )
    # join route: persist the bounded distributions so the totals actions
    # don't re-aggregate the corpus inside the diff-join plan
    from pyspark import StorageLevel

    tp = tp.persist(StorageLevel.MEMORY_AND_DISK)
    tq = tq.persist(StorageLevel.MEMORY_AND_DISK)
    totals_p = tp.agg(F.sum("cnt")).collect()[0][0] or 0
    totals_q = tq.agg(F.sum("cnt")).collect()[0][0] or 0
    const = math.log(totals_q + n_buckets) - math.log(totals_p + n_buckets)
    diff = (
        tp.select("bucket", F.log(F.col("cnt") + 1).alias("lp"))
        .join(
            tq.select("bucket", F.log(F.col("cnt") + 1).alias("lq")),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            (F.coalesce("lp", F.lit(0.0)) - F.coalesce("lq", F.lit(0.0))).alias("d"),
        )
    )
    feats = raw.select(
        F.col(id_col),
        F.explode_outer(feature_buckets(F.col(text_col), n_buckets, bigrams)).alias(
            "bucket"
        ),
    )
    return (
        feats.join(F.broadcast(diff), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").cast("long").alias("n_feats"),
            F.sum(F.coalesce("d", F.lit(0.0))).alias("_s"),
        )
        .select(
            id_col,
            "n_feats",
            (F.coalesce("_s", F.lit(0.0)) + F.col("n_feats") * const).alias("logw"),
        )
    )


def gumbel_key(id_expr: Column) -> Column:
    """Deterministic Gumbel(0,1) noise from a hash of the id: u =
    (knuth_bucket(id, 2^20) + 0.5) / 2^20 is hash-uniform in (0,1) and
    -ln(-ln(u)) is its Gumbel transform — reproducible across runs and
    engines (knuth_bucket is the repo's overflow-safe modular hash,
    DuckDB-re-derivable)."""
    from entangledb_spark.operators.text import knuth_bucket

    u = (knuth_bucket(id_expr, GUMBEL_RES) + F.lit(0.5)) / F.lit(float(GUMBEL_RES))
    return -F.log(-F.log(u))


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    bigrams: bool = True,
) -> DataFrame:
    """Gumbel-top-k importance resample: score = logw + Gumbel(id),
    keep the k highest — distributionally equivalent to sampling k docs
    without replacement with probability proportional to w (the
    Gumbel-max trick), but fully deterministic here because the noise is
    hash-derived. Returns the selected raw rows + (logw, score).

    k is expected SMALL relative to the corpus (top-k fuses to
    TakeOrderedAndProject); for percentage-scale selection use
    dsir_select_threshold.

    LENGTH BIAS, stated plainly: logw is a likelihood-ratio SUM over
    features, so a near-empty document scores ~0 and outranks any long
    document whose ratio is below 1 — inherent to importance weights,
    and why the paper scores fixed-size chunks, not raw documents.
    Compose after chunking (operators/text.py q55 recipe) or after a
    min-length quality gate so the units are comparable; the planted
    test corpus in tests/test_selection.py demonstrates both the bias
    and the length-controlled behavior."""
    w = dsir_log_weights(raw, target, text_col, id_col, n_buckets, bigrams)
    scored = raw.join(w, id_col).withColumn(
        "score", F.col("logw") + gumbel_key(F.col(id_col))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(int(k))


def dsir_select_threshold(
    raw: DataFrame,
    target: DataFrame,
    keep_fraction: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    bigrams: bool = True,
    rel_err: float = 0.01,
) -> DataFrame:
    """Production-scale selection: keep ~keep_fraction of the corpus by
    score THRESHOLD (approxQuantile + filter, no global sort; the
    selected count is approximate within the quantile sketch's rel_err,
    the standard trade at 100 TB).

    ``scored`` is persisted before the quantile action: approxQuantile
    scans the whole scored relation, and the returned filter would
    otherwise recompute the full feature-hash scoring a second time
    (round-7 review finding). At true corpus scale swap the persist for
    a checkpoint of the (id, score) projection."""
    from pyspark import StorageLevel

    w = dsir_log_weights(raw, target, text_col, id_col, n_buckets, bigrams)
    scored = raw.join(w, id_col).withColumn(
        "score", F.col("logw") + gumbel_key(F.col(id_col))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cut = scored.approxQuantile("score", [1.0 - keep_fraction], rel_err)[0]
    return scored.filter(F.col("score") >= cut)


def cluster_rank(id_col: str = "vec_id") -> Column:
    """Deterministic within-cell rank: knuth-hash order, ties to the id.

    Returns an unbound window Column over (``cell``, ``id_col``) — attach
    it to any frame carrying those columns (the real contract; an earlier
    signature took a DataFrame it never used).

    The key is a pseudo-random bijection of the id (text.knuth_key), so
    ranking by it is an unbiased per-cell shuffle that every engine,
    cluster size, and re-run reproduces — the same determinism contract
    as the stratified sampler and the DSIR Gumbel keys."""
    from pyspark.sql import Window

    from entangledb_spark.operators.text import knuth_key

    w = Window.partitionBy("cell").orderBy(
        knuth_key(F.col(id_col)), F.col(id_col)
    )
    return F.row_number().over(w).cast("long")


def cluster_balanced_sample(
    df: DataFrame,
    centroids,
    quota: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Diversity-preserving subsample: at most ``quota`` vectors per
    k-means cell, chosen by deterministic knuth-hash order.

    Uniform sampling over-represents dense embedding modes (boilerplate,
    templates, near-dup clusters); a per-cell quota flattens cluster
    mass — the cluster-balancing step the SemDeDup/DoReMi line of work
    applies before mixing. Pairs with ivf_centroids(refine=N): train
    cells once, then sample against the collected centroid rows.

    Plan shape: assignment is the zero-exchange ivf_assign map
    (preserving every input column); ranking is ONE shuffle of the
    assigned rows — pre-project ``df`` to the columns the survivors
    need so that exchange stays narrow. The window sorts per cell, so
    size n_cells to keep cells executor-sized (the SemDeDup paper's 50k
    cells put a 100 TB corpus at ~2 GB/cell); the quota itself never
    concentrates rows — every cell's output is bounded by ``quota``.

    Returns the surviving rows of ``df`` (all columns) plus ``cell``."""
    from entangledb_spark.operators.similarity import ivf_assign

    assigned = ivf_assign(df, centroids, emb_col=emb_col)
    return (
        assigned.withColumn("_ck_rank", cluster_rank(id_col))
        .filter(F.col("_ck_rank") <= quota)
        .drop("_ck_rank")
    )


# ------------------------------------------------- mixture materialization

MIX_RES = 2**20  # fractional-epoch hash resolution (1e-6 rate granularity)


def materialize_mixture(
    docs: DataFrame,
    weights: dict[str, float],
    default_weight: float = 0.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int = 64,
) -> DataFrame:
    """Materialize a weighted training MIX: the step between "mixture
    proportions decided" (q92's rate computation / DoReMi-style domain
    weights) and sequence packing — emit each document ``weights[source]``
    times, deterministically, with a pseudo-random interleave order.

    A weight w means: every doc of that source appears floor(w) times
    (full epochs — weights > 1 are the standard "repeat high-quality
    sources for multiple epochs" practice), plus one more copy for the
    deterministic hash-fraction frac(w) of its docs (knuth_bucket(id)
    < frac·MIX_RES — the q92 sampling rule at 2^-20 granularity).
    Sources missing from ``weights`` get ``default_weight`` (default 0:
    dropped — pass an explicit weight for every source you keep).

    Determinism and portability: zero RNG — every decision is BIGINT
    arithmetic on the doc id (text.knuth_bucket/knuth_key), so the same
    corpus materializes the same mix on any cluster size, any run, and
    any engine (the full row set is re-derived in DuckDB SQL in
    tests/test_selection.py).

    Scale shape: ONE narrow pass — a per-row copies expression, an
    explode over sequence(0, copies-1) (bounded by ceil(max weight)),
    and pure projections. NO shuffle of any kind (plan-asserted): the
    interleave is carried as data (``mix_key``), not enforced as a sort
    — downstream packers shard on it (pack_contiguous/pack_greedy's
    layout), and a trainer reading shard files gets the interleaved
    order without anyone paying a global sort.

    Output: every input column plus
      - ``epoch``   int, 0-based copy index of this doc;
      - ``mix_id``  long, unique per emitted copy
                    (id · (max_epochs+1) + epoch);
      - ``mix_key`` long, the deterministic interleave key
                    ((knuth_key(id) + epoch·SAMPLE_K) % HASH_M —
                    epoch copies land far apart, as repeated data
                    should);
      - ``shard``   int, the HIGH-bits range split
                    floor(mix_key · n_shards / HASH_M). Not mod:
                    a multiplicative hash's LOW bits are weak (mod-64
                    of sequential ids hit ~half the shards — measured),
                    the high bits are where Knuth's method mixes.
    """
    from entangledb_spark.operators.text import (
        HASH_M,
        SAMPLE_K,
        knuth_bucket,
        knuth_key,
    )

    for s, w in weights.items():
        if not (isinstance(w, (int, float)) and math.isfinite(w) and w >= 0):
            raise ValueError(f"mixture weight for {s!r} must be finite >= 0, got {w!r}")
    if not (
        isinstance(default_weight, (int, float))
        and math.isfinite(default_weight)
        and default_weight >= 0
    ):
        raise ValueError(f"default_weight must be finite >= 0, got {default_weight!r}")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    max_epochs = int(max([default_weight, *weights.values()], default=0.0))
    doc_id = F.col(id_col).cast("long")

    def _copies(w: float):
        base = int(w)
        frac_cut = round((w - base) * MIX_RES)
        c = F.lit(base)
        if frac_cut > 0:
            c = c + (knuth_bucket(doc_id, MIX_RES) < frac_cut).cast("int")
        return c

    copies = F.lit(int(default_weight))
    if round((default_weight - int(default_weight)) * MIX_RES) > 0:
        copies = _copies(default_weight)
    for s, w in sorted(weights.items()):
        copies = F.when(F.col(source_col) == s, _copies(w)).otherwise(copies)

    mix_key = (knuth_key(doc_id) + F.col("epoch") * F.lit(SAMPLE_K)) % F.lit(HASH_M)
    return (
        docs.withColumn("_copies", copies)
        .filter(F.col("_copies") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_copies") - 1)))
        .drop("_copies")
        .withColumn(
            "mix_id",
            (doc_id * F.lit(max_epochs + 1) + F.col("epoch")).cast("long"),
        )
        .withColumn("mix_key", mix_key.cast("long"))
        .withColumn(
            "shard",
            (F.col("mix_key") * F.lit(n_shards) / F.lit(HASH_M)).cast("int"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_frac: float = 0.1,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    seed: int = 0,
) -> DataFrame:
    """Train/validation split that CANNOT leak near-duplicates across the
    boundary — the eval-hygiene complement of the dedup family: a val set
    drawn uniformly at random still shares near-duplicate passages with
    train (the leakage Lee et al. arXiv:2107.06499 measure), so the unit
    of assignment must be the near-duplicate CLUSTER, not the document.

    ``pairs`` is any of the dedup family's pair relations ((id_a, id_b) —
    n-gram Jaccard, MinHash-LSH, SimHash, or embedding-cosine edges).
    Connected components run over the EDGE ENDPOINTS only (pairs are a
    tiny fraction of the corpus; the full-corpus CC would be wasted work
    at 100 TB — untouched documents are their own singleton clusters by
    construction). Every document's cluster id — the component's minimum
    member id, or its own id for singletons — hashes through the same
    engine-portable Knuth rule as the mixture/sampling family
    (text.knuth_bucket at 2^-20 granularity, seed-offset), so the split
    is deterministic across runs, cluster sizes, partitionings, AND
    engines (re-derivable in DuckDB SQL via knuth_bucket_sql).

    Plan: one CC loop over the edge relation (convergence-checked label
    propagation), one left join of the corpus against the component map
    (broadcastable — components ≤ 2·|pairs|), one narrow hash projection.

    Returns docs plus (split_key, split) where split ∈ ('train', 'val');
    every (id_a, id_b) pair is guaranteed same-side because both ids map
    to one split_key."""
    from entangledb_spark.operators.dedup import connected_components
    from entangledb_spark.operators.text import knuth_bucket

    if not (0.0 <= val_frac <= 1.0):
        raise ValueError(f"val_frac must be in [0, 1], got {val_frac}")
    edges = pairs.select(
        F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b")
    )
    verts = (
        edges.select(F.col("a").alias("id"))
        .unionByName(edges.select(F.col("b").alias("id")))
        .distinct()
    )
    cc = connected_components(verts, edges)  # (id, component)
    cut = round(val_frac * MIX_RES)
    out = (
        docs.join(cc, docs[id_col] == cc["id"], "left")
        .drop("id")
        .withColumn(
            "split_key",
            F.coalesce(F.col("component"), F.col(id_col).cast("long")),
        )
        .drop("component")
        .withColumn(
            "split",
            F.when(
                knuth_bucket(F.col("split_key") + F.lit(seed), MIX_RES) < cut,
                F.lit("val"),
            ).otherwise(F.lit("train")),
        )
    )
    return out

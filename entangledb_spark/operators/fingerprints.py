"""Winnowing document fingerprints (rolling k-gram hashes + min-in-window
selection) and fingerprint-overlap containment detection.

Whole-document near-dup (MinHash/SimHash Jaccard, operators/dedup.py) misses
PARTIAL overlap: a document that embeds one paragraph of another shares few
whole-doc shingles. Winnowing (Schleimer, Wilkerson & Aiken, "Winnowing:
Local Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
algorithm) selects a sparse, position-robust subset of k-gram hashes with a
coverage GUARANTEE: any shared substring of at least k + window - 1
characters contributes at least one shared fingerprint. That makes
fingerprint overlap a containment detector — licence headers, boilerplate,
quoted passages — at a storage density of ~2/(window+1) fingerprints per
character.

Spark shape: everything per-document is ONE narrow codegen'd map built from
higher-order functions (sequence → transform → slice → array_min); no
explode happens until the (doc_id, fp) relation, which is already winnowed-
sparse. The overlap join is an equi-join on the fingerprint hash with the
same doc-frequency hot-key cap as the Jaccard path (dedup.py:DOC_FREQ_CAP
rationale) — never all-pairs. Hashes are md5 hex STRINGS compared
lexicographically, which Spark and DuckDB order identically (the
established parity trick from span dedup, packing.py)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entangledb_spark.functions.exprmemo import expr_template
from entangledb_spark.operators.text import normalize_text

# k must be large enough that a matching k-gram means COPIED TEXT, not
# shared vocabulary: at k=8 ("the quic") template-generated corpora share
# most grams and the overlap join degenerates toward all-pairs (measured
# at sf0.01: 88k of 125k possible pairs, ~8 min); at k=24 a collision is
# a genuinely duplicated 24-char run. MOSS itself uses k~50 for prose
# (Schleimer et al. SIGMOD'03 §5). Noise threshold k=24, guarantee
# threshold t=k+window-1=31: any shared run >= 31 chars is always caught.
K_GRAM = 24  # rolling k-gram width (characters, post-normalization)
WINDOW = 8  # winnowing window (consecutive k-gram hashes per min-pick)
# Fingerprints present in more than this fraction of documents are dropped
# before the overlap self-join: a fingerprint in d docs generates C(d,2)
# candidate rows, so corpus-frequent boilerplate prints are quadratically
# expensive AND carry no containment signal (same rationale as the Jaccard
# DOC_FREQ_CAP, tighter because the cost is per-fingerprint-quadratic).
FP_DOC_FREQ_CAP = 0.1


def _let(bound: Column, body) -> Column:
    """Let-bind ``bound`` as a lambda variable for ``body``.

    Higher-order lambdas re-evaluate any CAPTURED expression tree once per
    array element — so ``slice(grams, j, w)`` inside a transform recomputes
    the whole grams pipeline (every md5 + the normalize regexp) at every
    window position, turning winnowing quadratic in document length
    (measured: sf0.01's 500 ~300-char docs took >5 min). Wrapping the
    expression in a single-element array and transforming binds it to a
    lambda VARIABLE, which is evaluated once per row and merely referenced
    per element."""
    return F.transform(F.array(bound), body)[0]


@expr_template
def winnow_expr(text: Column | str, k: int = K_GRAM, window: int = WINDOW) -> Column:
    """DISTINCT winnowed fingerprints of ``text`` as an array<string>
    column — one narrow expression, no shuffle, no UDF. ``text`` may be a
    column NAME (preferred — the ~230-round-trip template is then memoized
    per (name, k, window)) or a live Column.

    Grams are md5(hex) of the k-char substrings of the normalized text;
    each length-``window`` run of consecutive gram hashes contributes its
    minimum (robust winnowing's guarantee needs any-min; taking the
    lexicographic min of hex strings keeps both engines identical).
    Documents shorter than k + window - 1 chars but at least k chars
    contribute the single global min; shorter still → empty array."""

    def with_grams(grams: Column) -> Column:
        n_wins = F.size(grams) - F.lit(window - 1)
        wins = F.when(
            n_wins >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_wins, F.lit(1))),
                lambda j: F.array_min(F.slice(grams, j, window)),
            ),
        ).otherwise(
            F.when(F.size(grams) >= 1, F.array(F.array_min(grams))).otherwise(
                F.array().cast("array<string>")
            )
        )
        return F.array_distinct(wins)

    def with_text(s: Column) -> Column:
        n_grams = F.length(s) - F.lit(k - 1)
        # guard: Spark's sequence(1, n) with n < 1 is a DESCENDING
        # sequence, not empty — short docs must short-circuit to an
        # empty gram list
        grams = F.when(
            n_grams >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
                lambda i: F.md5(s.substr(i, F.lit(k))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return _let(grams, with_grams)

    return _let(normalize_text(text), with_text)


def winnow_expr_pos(text: Column, k: int = K_GRAM, window: int = WINDOW) -> Column:
    """Positional winnowing: distinct (fp, pos) structs instead of the
    bare fingerprint set — ``pos`` is the 1-based char offset of the
    selected k-gram in the NORMALIZED text, so downstream overlap
    detection can report matched spans, not just membership (the MOSS
    use-case the set variant gives up; see winnow_overlap_spans).

    Per window the minimal gram hash is selected with its LEFTMOST
    position on ties (array_position finds the first match) — a
    deterministic choice both engines reproduce. Same let-binding
    discipline as winnow_expr; ~2x the per-window cost (min + position
    scan), same narrow no-shuffle shape. The set variant stays the
    cheap default for detection-only pipelines."""
    empty = F.array().cast("array<struct<fp:string,pos:bigint>>")

    def pick(s: Column, base) -> Column:
        m = F.array_min(s)
        return F.struct(
            m.alias("fp"), (base + F.array_position(s, m)).cast("long").alias("pos")
        )

    def with_grams(grams: Column) -> Column:
        n_wins = F.size(grams) - F.lit(window - 1)
        wins = F.when(
            n_wins >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_wins, F.lit(1))),
                lambda j: _let(
                    F.slice(grams, j, window), lambda s: pick(s, j - 1)
                ),
            ),
        ).otherwise(
            F.when(F.size(grams) >= 1, F.array(pick(grams, F.lit(0)))).otherwise(empty)
        )
        return F.array_distinct(wins)

    def with_text(s: Column) -> Column:
        n_grams = F.length(s) - F.lit(k - 1)
        grams = F.when(
            n_grams >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
                lambda i: F.md5(s.substr(i, F.lit(k))),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return _let(grams, with_grams)

    return _let(normalize_text(text), with_text)


def winnow_postings_pos(
    docs: DataFrame,
    k: int = K_GRAM,
    window: int = WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exploded positional posting list: (id, fp, pos) — one narrow map
    + one explode over the winnowed-sparse struct array."""
    return docs.select(
        F.col(id_col), F.explode(winnow_expr_pos(F.col(text_col), k, window)).alias("e")
    ).select(F.col(id_col), F.col("e.fp").alias("fp"), F.col("e.pos").alias("pos"))


def winnow_overlap_spans(
    docs: DataFrame,
    k: int = K_GRAM,
    window: int = WINDOW,
    min_shared: int = 2,
    doc_freq_cap: float = FP_DOC_FREQ_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level containment: WHERE documents overlap, not just that
    they do. Every shared fingerprint at (pos_a, pos_b) certifies an
    identical k-char run at those offsets of the two normalized texts;
    anchors lying on the same DIAGONAL (pos_b - pos_a constant — the
    alignment offset of a contiguous shared region) are merged
    gaps-and-islands style when consecutive anchors are <= t = k +
    window - 1 apart, which is exactly the winnowing guarantee's anchor
    spacing inside a genuinely shared run of length >= t.

    Returns (doc_a, doc_b, start_a, start_b, span_len, n_anchors) with
    doc_a < doc_b, span_len in normalized-text characters
    (last_anchor - first_anchor + k), keeping spans with >=
    ``min_shared`` anchors. Offsets are 1-based.

    Plan: positional posting list → hot-fp broadcast anti-join (same
    cap rationale as winnow_overlap_pairs) → fp equi-join → per
    (pair, diagonal) ordered island aggregation (one shuffle keyed on
    the pair+diagonal, uniform) — never all-pairs, no UDFs."""
    from pyspark.sql import Window as W

    posting = winnow_postings_pos(docs, k, window, text_col, id_col).localCheckpoint(
        eager=False
    )
    n_docs = posting.select(id_col).distinct().count()
    hot = (
        posting.groupBy("fp")
        .agg(F.count_distinct(F.col(id_col)).alias("df"))
        .filter(F.col("df") > F.greatest(F.lit(doc_freq_cap * n_docs), F.lit(2.0)))
        .select("fp")
    )
    cold = posting.join(F.broadcast(hot), "fp", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    t = k + window - 1
    anchors = a.join(
        b,
        (F.col("a.fp") == F.col("b.fp")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        F.col("a.pos").alias("pos_a"),
        F.col("b.pos").alias("pos_b"),
        (F.col("b.pos") - F.col("a.pos")).alias("diag"),
    )
    w = W.partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    islands = anchors.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("pos_a") - F.lag("pos_a").over(w) > F.lit(t), 1
            ).otherwise(0)
        ).over(w),
    )
    return (
        islands.groupBy("doc_a", "doc_b", "diag", "island")
        .agg(
            F.min("pos_a").alias("start_a"),
            F.min("pos_b").alias("start_b"),
            (F.max("pos_a") - F.min("pos_a") + F.lit(k)).cast("long").alias("span_len"),
            F.count(F.lit(1)).alias("n_anchors"),
        )
        .filter(F.col("n_anchors") >= min_shared)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_len", "n_anchors")
    )


def winnow_span_summary(
    docs: DataFrame,
    k: int = K_GRAM,
    window: int = WINDOW,
    min_shared: int = 2,
    doc_freq_cap: float = FP_DOC_FREQ_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document rollup of winnow_overlap_spans — the deterministic
    span-summary shape the driver gate can hash: for every document that
    participates in at least one qualifying overlap span (either side of
    a pair), (id, n_overlap_spans, max_span_len) where n_overlap_spans
    counts the doc's (pair, diagonal, island) spans and max_span_len is
    the longest such span in normalized-text characters.

    Adds ONE uniform shuffle (the per-doc groupBy) on top of the span
    pipeline; the spans relation is containment-sparse (capped by the
    hot-fp guard), so the rollup input is tiny relative to the corpus."""
    spans = winnow_overlap_spans(
        docs, k, window, min_shared, doc_freq_cap, text_col, id_col
    )
    sides = spans.select(F.col("doc_a").alias(id_col), "span_len").unionAll(
        spans.select(F.col("doc_b").alias(id_col), "span_len")
    )
    return sides.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap_spans"),
        F.max("span_len").cast("long").alias("max_span_len"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = K_GRAM,
    window: int = WINDOW,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document winnowing summary:
    (id, n_grams, n_fps, fps) — ``fps`` the distinct fingerprint set.

    n_fps/n_grams ≈ 2/(window+1) for non-repetitive text; highly
    self-repetitive documents winnow to far fewer distinct prints (the
    same few hashes win every window), so the ratio itself is a cheap
    repetitiveness signal alongside operators/quality.py."""
    s = normalize_text(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.greatest(F.length(s) - F.lit(k - 1), F.lit(0)).cast("long").alias("n_grams"),
        winnow_expr(text_col, k, window).alias("fps"),
    ).withColumn("n_fps", F.size("fps").cast("long"))


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = K_GRAM,
    window: int = WINDOW,
    min_shared: int = 2,
    doc_freq_cap: float = FP_DOC_FREQ_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Containment-style overlap pairs: documents sharing >= ``min_shared``
    winnowed fingerprints, with ``containment`` = shared / min(|fps|) —
    near 1.0 when the smaller document is mostly contained in the larger,
    regardless of how big the larger one is (exactly the case whole-doc
    Jaccard scores near 0).

    Plan: fingerprint relation (narrow map + one explode) → hot-fingerprint
    drop via broadcast anti-join (fps in > cap × |docs| documents) →
    self-equi-join on the fingerprint hash → pair groupBy. Both shuffles
    key on uniform md5-derived values; the candidate count is bounded by
    Σ per-fp doc-frequency², which the cap bounds corpus-relative.

    Returns (doc_a, doc_b, n_shared, containment, n_fps_a, n_fps_b) with
    doc_a < doc_b — the per-side fingerprint-set sizes ride along so
    downstream consumers (containment survivors) need no re-join."""
    # Materialize the fingerprint relation ONCE. It is referenced by four
    # plan branches (sizes, hot-fp stats, both sides of the self-join);
    # left lazy, each branch re-inlines the winnowing expression tree —
    # whose nested higher-order functions also blow up optimizer time
    # super-linearly when duplicated into a self-join (measured: minutes
    # of driver-side planning at sf0.01 vs seconds once persisted).
    # localCheckpoint, NOT persist: a persist() here had no matching
    # unpersist (the pair relation is lazy, so there is no safe point
    # inside this function), leaking executor cache for the process
    # lifetime under repeated calls. A lazy local checkpoint gives the
    # same single-materialization + plan-truncation behavior, and its
    # blocks are reclaimed by the ContextCleaner once the returned
    # DataFrame is unreferenced — caller-transparent lifetime. (Trade-off,
    # documented: locally-checkpointed blocks don't survive executor
    # loss; the job retries from the source in that case.)
    fps = winnow_fingerprints(docs, k, window, text_col, id_col).localCheckpoint(
        eager=False
    )
    sizes = fps.select(F.col(id_col), "n_fps").filter(F.col("n_fps") > 0)
    posting = fps.select(F.col(id_col), F.explode("fps").alias("fp"))
    # count from the PERSISTED relation (one row per doc): materializes
    # the cache the later branches reuse, instead of paying a second
    # full scan of the source for a number fps already carries
    n_docs = fps.count()
    # Floor the hot threshold at 2: with a small corpus (< 1/cap docs)
    # cap×n drops below 2 and every shared print (df >= 2 by definition
    # of sharing) would be classified hot — overlap detection would
    # silently return zero pairs. df = 2 is the minimal overlap signal
    # and is always kept; the corpus-relative cap takes over beyond
    # 2/cap documents.
    hot = (
        posting.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > F.greatest(F.lit(doc_freq_cap * n_docs), F.lit(2.0)))
        .select("fp")
    )
    cold = posting.join(F.broadcast(hot), "fp", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_fps").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_fps").alias("_nb"))
    from entangledb_spark.functions.numeric import r4

    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            r4(F.col("n_shared") / F.least("_na", "_nb")).alias("containment"),
            F.col("_na").alias("n_fps_a"),
            F.col("_nb").alias("n_fps_b"),
        )
    )


def winnow_containment_survivors(
    docs: DataFrame,
    containment_threshold: float = 0.8,
    k: int = K_GRAM,
    window: int = WINDOW,
    min_shared: int = 2,
    doc_freq_cap: float = FP_DOC_FREQ_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop documents mostly CONTAINED in another document — the curation
    step winnowing exists for: quoted reposts, pages embedding a licence
    + another page's body, expanded-with-ads copies. For each overlap
    pair at containment >= ``containment_threshold`` the SMALLER
    fingerprint set (the contained side; ties to the higher id) loses;
    losers are removed by one corpus anti-join, preserving the input
    schema.

    Distinct from near-dup survivors (dedup.py): Jaccard survivors keep
    one representative of a clique of near-copies; containment survivors
    keep the SUPERSET document and drop its fragments, so a corpus of
    article + article-with-header keeps the article-with-header.
    100 TB shape: the pair relation is already capped (doc-frequency
    guard) and tiny at a high threshold; only the final anti-join
    touches the corpus."""
    pa = winnow_overlap_pairs(
        docs, k, window, min_shared, doc_freq_cap, text_col, id_col
    ).filter(F.col("containment") >= containment_threshold)
    sizes_a, sizes_b = F.col("n_fps_a"), F.col("n_fps_b")
    loser = F.when(sizes_a < sizes_b, F.col("doc_a")).when(
        sizes_b < sizes_a, F.col("doc_b")
    ).otherwise(F.greatest("doc_a", "doc_b"))
    losers = pa.select(loser.alias(id_col)).distinct()
    return docs.join(losers, id_col, "left_anti")

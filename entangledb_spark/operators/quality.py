"""Corpus quality filters for training-data pipelines (beyond parity).

Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
Models", Table A1) and benchmark-contamination detection — the two
standard corpus-hygiene passes a pretraining pipeline runs after dedup.

Scale shapes:
- Array-level metrics (duplicate-line fraction) are per-row built-in
  expressions: zero shuffles.
- Char-weighted metrics (duplicate line/n-gram character fractions,
  top-bigram dominance) need exact per-item counts. All item categories
  (lines, bigrams, trigrams) ride ONE tagged explode off ONE text scan —
  two shuffles total ((doc,type,item) counts, then the per-doc rollup) —
  instead of one scan+shuffle per category: at 100 TB re-reading the
  corpus per metric dominates everything else. Exact, skew-free (uniform
  composite keys), linear in corpus size. Locally the fused explode is
  ~25% slower than parallel per-category branches on a page-cached
  fixture; that tradeoff inverts as soon as the scan costs real I/O.
- Contamination joins the corpus' n-gram shingles against a benchmark
  set. Benchmarks are tiny (MBs) next to the corpus, so the benchmark
  side is broadcast — the corpus is never shuffled at all.

No Python UDFs anywhere; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from entangledb_spark.functions.exprmemo import expr_template
from entangledb_spark.functions.numeric import r4
from entangledb_spark.registry import query, table

WORD_SEQ_RE = r"[a-z0-9]+"

# Gopher Table A1 cutoffs for the metrics computed here: a document is
# repetition-flagged when any fraction exceeds its threshold.
DUP_LINE_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.20
TOP_BIGRAM_CHAR_FRAC_MAX = 0.20
DUP_TRIGRAM_CHAR_FRAC_MAX = 0.18


def _words(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_SEQ_RE), 0)


def _gram_expr(n: int) -> Column:
    """Word n-grams over a `words` array column as space-joined strings —
    a pure JVM array expression. Guarded by a `when`: Spark's
    `sequence(1, 0)` is DESCENDING `[1, 0]`, not empty, so short
    documents must short-circuit to an empty array."""
    parts = ", ".join(f"element_at(words, i + {k})" for k in range(n))
    grams = F.expr(
        f"transform(sequence(1, greatest(size(words) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', {parts}))"
    )
    return F.when(F.size("words") >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _run_dup_chars(sorted_arr: Column, char_len) -> Column:
    """Sum of cnt x char_len(item) over runs with cnt > 1 of a SORTED
    string array — the duplicate-character mass of Gopher's line/n-gram
    metrics, computed per row with ONE fold instead of a corpus-wide
    (doc, item) count shuffle. The accumulator carries (prev item, run
    length, closed-run total); the finish lambda closes the last run."""
    zero = F.expr(
        "struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run, "
        "CAST(0 AS BIGINT) AS dup)"
    )

    def closed(acc):
        return acc["dup"] + F.when(
            acc["run"] > 1, acc["run"] * char_len(acc["prev"])
        ).otherwise(F.lit(0).cast("long"))

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.when(
            same,
            F.struct(
                x.alias("prev"),
                (acc["run"] + F.lit(1).cast("long")).alias("run"),
                acc["dup"].alias("dup"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                closed(acc).alias("dup"),
            )
        )

    return F.aggregate(sorted_arr, zero, merge, closed)


def _run_top(sorted_arr: Column, char_len) -> Column:
    """Max (cnt, char_len) struct over the runs of a SORTED string array
    — the single most-frequent n-gram (ties to the longer gram, struct
    ordering), per row, no shuffle. Empty array -> struct(0, 0)."""
    zero = F.expr(
        "struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run, "
        "struct(CAST(0 AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS glen) AS top)"
    )

    def closed(acc):
        cand = F.struct(
            acc["run"].alias("cnt"),
            F.coalesce(char_len(acc["prev"]), F.lit(0).cast("long")).alias("glen"),
        )
        return F.when(acc["prev"].isNull(), acc["top"]).otherwise(
            F.greatest(acc["top"], cand)
        )

    def merge(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.when(
            same,
            F.struct(
                x.alias("prev"),
                (acc["run"] + F.lit(1).cast("long")).alias("run"),
                acc["top"].alias("top"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                closed(acc).alias("top"),
            )
        )

    return F.aggregate(sorted_arr, zero, merge, closed)


def repetition_metrics(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact per-document repetition metrics.

    Columns: n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram_char_frac, dup_trigram_char_frac, repetition_flagged.

    Definitions (Gopher A1):
    - dup_line_frac: duplicate lines / total lines (line-level).
    - dup_line_char_frac: characters inside lines that occur more than
      once / total line characters.
    - top_bigram_char_frac: characters covered by occurrences of the
      single most frequent word 2-gram / total word characters.
    - dup_trigram_char_frac: characters covered by word 3-grams occurring
      more than once / total 3-gram characters.
    """
    d_cols, rolled_cols, out_cols, flag = _repetition_templates(text_col, id_col)
    return (
        docs.select(*d_cols)
        .select(*rolled_cols)
        .select(*out_cols)
        .withColumn("repetition_flagged", flag)
    )


@expr_template
def _repetition_templates(text_col: str, id_col: str) -> tuple:
    """Templates for repetition_metrics' three projections + flag —
    ~1,000 py4j round-trips of pure HOF-fold construction, built once
    per (text_col, id_col)."""
    # NULL text behaves as the empty document: without the coalesce the
    # tagged-array concat below is NULL and explode(NULL) emits no rows,
    # silently dropping the doc from the output (and from the oracle
    # comparison).
    txt = F.coalesce(F.col(text_col), F.lit(""))
    d_cols = (
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.transform(F.split(txt, "\n"), lambda l: F.trim(l)),
            lambda l: l != "",
        ).alias("lines"),
        _words(txt).alias("words"),
    )

    # ZERO shuffles (since round 6): every Gopher metric is PER-DOCUMENT,
    # so nothing ever needed a corpus-wide exchange — duplicate counting
    # is a run-length walk over the doc's own SORTED item array, one
    # narrow fold per category (_run_dup_chars / _run_top). The round-5
    # tagged-explode formulation shuffled ~2x corpus-words rows twice
    # ((doc, item) counts + per-doc rollup); this is embarrassingly
    # parallel instead — the shape that actually survives 100 TB
    # (measured at sf0.1: 1.8s -> narrow map, and the exchange bytes go
    # to zero). Division/count semantics are unchanged, so the q81 gate
    # hash is identical.
    def ilen(x: Column) -> Column:
        return F.length(x).cast("long")

    def glen(x: Column) -> Column:
        # chars covered by a gram occurrence = its letters (spaces excluded)
        return F.length(F.regexp_replace(x, " ", "")).cast("long")

    rolled_cols = (
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.size(F.array_distinct("lines")).cast("long").alias("n_distinct_lines"),
        _run_dup_chars(F.array_sort("lines"), ilen).alias("dup_line_chars"),
        F.aggregate(
            "lines", F.lit(0).cast("long"), lambda a, l: a + F.length(l)
        ).alias("line_chars"),
        F.aggregate(
            "words", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).alias("word_chars"),
        _run_top(F.array_sort(_gram_expr(2)), glen).alias("top"),
        _run_dup_chars(F.array_sort(_gram_expr(3)), glen).alias("dup_trigram_chars"),
        F.aggregate(
            _gram_expr(3), F.lit(0).cast("long"), lambda a, g: a + glen(g)
        ).alias("trigram_chars"),
    )

    out_cols = (
        "doc_id",
        "n_lines",
        F.when(
            F.col("n_lines") > 0,
            1.0 - F.col("n_distinct_lines") / F.col("n_lines"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        (
            F.col("dup_line_chars")
            / F.greatest(F.col("line_chars"), F.lit(1)).cast("double")
        ).alias("dup_line_char_frac"),
        # a top bigram occurring once is not repetition — without the
        # cnt>=2 guard the metric degenerates to "longest bigram length
        # / doc length" and flags every short clean document
        F.when(
            F.col("top.cnt") >= 2,
            F.col("top.cnt")
            * F.col("top.glen")
            / F.greatest(F.col("word_chars"), F.lit(1)),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_char_frac"),
        (
            F.col("dup_trigram_chars")
            / F.greatest(F.col("trigram_chars"), F.lit(1)).cast("double")
        ).alias("dup_trigram_char_frac"),
    )
    flag = (
        (F.col("dup_line_frac") > DUP_LINE_FRAC_MAX)
        | (F.col("dup_line_char_frac") > DUP_LINE_CHAR_FRAC_MAX)
        | (F.col("top_bigram_char_frac") > TOP_BIGRAM_CHAR_FRAC_MAX)
        | (F.col("dup_trigram_char_frac") > DUP_TRIGRAM_CHAR_FRAC_MAX)
    )
    return d_cols, rolled_cols, out_cols, flag


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: flag corpus documents sharing any
    word n-gram (default 8-gram, the common contamination window) with a
    benchmark/eval set.

    Plan: distinct benchmark shingles (tiny) are BROADCAST; the corpus'
    distinct (doc_id, shingle) pairs join against them without shuffling
    the corpus. Output is one row per document: n_shingles,
    n_contaminated_shingles, contaminated_frac, contaminated flag.
    """

    def shingles(df: DataFrame, text: str, keep: list) -> DataFrame:
        return (
            df.select(*keep, _words(F.col(text)).alias("words"))
            .select(*keep, F.explode(_gram_expr(n)).alias("shingle"))
            .distinct()
        )

    doc_sh = shingles(docs, text_col, [F.col(id_col).alias("doc_id")])
    bench_sh = F.broadcast(shingles(benchmark, bench_text_col, []))

    per_doc = doc_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        doc_sh.join(bench_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )
    all_docs = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return (
        all_docs.join(per_doc, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .fillna(0, ["n_shingles", "n_contaminated_shingles"])
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated_shingles",
            (
                F.col("n_contaminated_shingles")
                / F.greatest(F.col("n_shingles"), F.lit(1))
            ).alias("contaminated_frac"),
            (F.col("n_contaminated_shingles") > 0).alias("contaminated"),
        )
    )


def contamination_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    window_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    corpus_windows: DataFrame | None = None,
    bench_hashes: DataFrame | None = None,
) -> DataFrame:
    """Contamination LOCALIZED: the maximal corpus token spans that match
    any ``window_tokens``-token window of the benchmark set — the
    surgical complement to `contamination` (which flags whole documents)
    and the decontamination practice of Lee et al. / the GPT-3 appendix:
    cut the leaked passage, keep the document.

    Plan: benchmark window hashes are tiny and BROADCAST (distinct md5
    keys only); the corpus' stride-1 window hashes (packing's
    _sliding_windows — one row per corpus token, the exact-substring
    price) left-semi join against them without shuffling the corpus, and
    the surviving start positions merge into maximal spans with the
    shared gaps-and-islands pass (packing.positions_to_spans, one doc_id
    exchange). Token identity is the substring-dedup family's contract:
    TOKEN_RE tokens, case-normalized md5 — NOT `contamination`'s
    [a-z0-9]+ word filter, because span offsets must index the
    document's real token stream to be removable.

    ``corpus_windows`` / ``bench_hashes``: precomputed
    ``packing._sliding_windows`` output (doc_id, pos, h) and a distinct
    single-column (h) benchmark hash relation. Pass them when another
    span operator over the same corpus shares the stride-1 explode —
    identical child subplans let ReuseExchange serve every consumer from
    one shuffle write (the q93 single-pass composition; see also
    packing.clean_corpus for the fused cleaner).

    Returns (doc_id, span_start, span_end, span_len, n_windows), bounds
    inclusive over the doc's TOKEN_RE token positions."""
    from entangledb_spark.operators.packing import (
        _sliding_windows,
        positions_to_spans,
    )

    bench_h = bench_hashes if bench_hashes is not None else (
        _sliding_windows(
            benchmark.select(
                F.lit(0).cast("long").alias("doc_id"),
                F.col(bench_text_col).alias("text"),
            ),
            window_tokens,
        )
        .select("h")
        .distinct()
    )
    corpus = corpus_windows if corpus_windows is not None else _sliding_windows(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        window_tokens,
    )
    hits = corpus.join(F.broadcast(bench_h), "h", "left_semi").select(
        "doc_id", "pos"
    )
    return positions_to_spans(hits, window_tokens)


def remove_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    window_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Apply contamination_spans as a cleaner: one row per non-empty doc
    with the benchmark-matching spans elided (packing.elide_spans —
    narrow token filter, no second corpus shuffle). Returns
    (doc_id, n_toks, removed_tokens, cleaned_text)."""
    from entangledb_spark.operators.packing import elide_spans

    spans = contamination_spans(
        docs, benchmark, window_tokens, text_col, id_col, bench_text_col
    )
    return elide_spans(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        spans,
    )


@query(
    "q81_quality_repetition",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(list_transform(str_split(coalesce(text, ''), chr(10)),
                                        l -> trim(l)),
                         l -> l <> '') AS lines,
             regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+') AS words
      FROM documents
    ),
    base AS (
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CASE WHEN len(lines) > 0
                  THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
                  ELSE 0.0 END AS dup_line_frac,
             coalesce(list_aggregate(list_transform(words, w -> length(w)), 'sum'), 0)
               AS word_chars
      FROM d
    ),
    lc AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN cnt > 1 THEN cnt * length(line) ELSE 0 END) AS DOUBLE)
               / greatest(sum(cnt * length(line)), 1) AS dup_line_char_frac
      FROM (SELECT doc_id, line, count(*) AS cnt
            FROM (SELECT doc_id, unnest(lines) AS line FROM d)
            GROUP BY doc_id, line)
      GROUP BY doc_id
    ),
    topbg AS (
      SELECT doc_id, max(struct_pack(cnt := cnt, glen := glen)) AS top
      FROM (SELECT doc_id, gram, count(*) AS cnt,
                   length(replace(gram, ' ', '')) AS glen
            FROM (SELECT doc_id,
                         unnest(CASE WHEN len(words) >= 2
                                THEN list_transform(range(1, len(words)),
                                                    i -> words[i] || ' ' || words[i+1])
                                ELSE CAST([] AS VARCHAR[]) END) AS gram
                  FROM d)
            GROUP BY doc_id, gram)
      GROUP BY doc_id
    ),
    tg AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN cnt > 1 THEN cnt * glen ELSE 0 END) AS DOUBLE)
               / greatest(sum(cnt * glen), 1) AS dup_trigram_char_frac
      FROM (SELECT doc_id, gram, count(*) AS cnt,
                   length(replace(gram, ' ', '')) AS glen
            FROM (SELECT doc_id,
                         unnest(CASE WHEN len(words) >= 3
                                THEN list_transform(range(1, len(words) - 1),
                                                    i -> words[i] || ' ' || words[i+1]
                                                         || ' ' || words[i+2])
                                ELSE CAST([] AS VARCHAR[]) END) AS gram
                  FROM d)
            GROUP BY doc_id, gram)
      GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_lines,
           r4(b.dup_line_frac) AS dup_line_frac,
           r4(coalesce(lc.dup_line_char_frac, 0.0)) AS dup_line_char_frac,
           r4(CASE WHEN topbg.top.cnt >= 2
                   THEN CAST(topbg.top.cnt * topbg.top.glen AS DOUBLE)
                        / greatest(b.word_chars, 1)
                   ELSE 0.0 END) AS top_bigram_char_frac,
           r4(coalesce(tg.dup_trigram_char_frac, 0.0)) AS dup_trigram_char_frac,
           (b.dup_line_frac > 0.30
            OR coalesce(lc.dup_line_char_frac, 0.0) > 0.20
            OR CASE WHEN topbg.top.cnt >= 2
                    THEN CAST(topbg.top.cnt * topbg.top.glen AS DOUBLE)
                         / greatest(b.word_chars, 1)
                    ELSE 0.0 END > 0.20
            OR coalesce(tg.dup_trigram_char_frac, 0.0) > 0.18) AS repetition_flagged
    FROM base b
    LEFT JOIN lc ON lc.doc_id = b.doc_id
    LEFT JOIN topbg ON topbg.doc_id = b.doc_id
    LEFT JOIN tg ON tg.doc_id = b.doc_id
    """,
)
def q81_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition metrics as an oracle-backed gate query: exact
    duplicate-line / duplicate-char / top-bigram / duplicate-trigram
    fractions per document plus the Table-A1 flag, hash-compared against a
    full DuckDB re-derivation (unnest + list comprehension mirror).

    Fractions are rounded via the shared r4 formula; the FLAG is computed
    from the UNROUNDED doubles on both sides — the ratios are quotients of
    exact integer counts, so the IEEE754 results (and threshold
    comparisons) agree bit-for-bit across engines."""
    from entangledb_spark.operators.dedup import repartition_for_cpu

    # zero-shuffle narrow map: spread the single-file fixture scan
    # across cores (no-op on real multi-file inputs) or the per-row
    # folds serialize on one core
    m = repetition_metrics(repartition_for_cpu(table(spark, sf_dir, "documents"), spark))
    return m.select(
        "doc_id",
        "n_lines",
        r4(F.col("dup_line_frac")).alias("dup_line_frac"),
        r4(F.col("dup_line_char_frac")).alias("dup_line_char_frac"),
        r4(F.col("top_bigram_char_frac")).alias("top_bigram_char_frac"),
        r4(F.col("dup_trigram_char_frac")).alias("dup_trigram_char_frac"),
        "repetition_flagged",
    )


# Add-k smoothing constant and hot-head size for the bigram LM scorer.
LM_SMOOTHING_K = 0.5
LM_HOT_HEAD = 1024


def ngram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = LM_SMOOTHING_K,
    hot_head: int = LM_HOT_HEAD,
) -> DataFrame:
    """Corpus-self-trained bigram LM scoring — the KenLM-style perplexity
    quality signal (CCNet / Wenzek et al. 2020): documents whose token
    transitions are improbable under the corpus' own statistics score low
    (gibberish, boilerplate soup, wrong-language fragments).

    score(doc) = mean over its bigrams (w1,w2) of
        ln( (C(w1,w2) + k) / (C(w1) + k·V) )        [add-k smoothing]
    plus ppl = exp(-score). Counts come from the full corpus; V is the
    unigram vocabulary size.

    Scale shapes:
    - Bigram counts: groupBy on the (w1,w2) composite — far more uniform
      than unigrams; partial aggregation collapses hot pairs map-side.
    - The doc-bigram → C(w1,w2) join keys on the same composite.
    - The C(w1) join is the Zipf hazard: "the" is a catastrophic hot key.
      Split-join: the top `hot_head` unigrams (tiny, covers the bulk of
      token mass) BROADCAST; only the long uniform tail shuffles. At
      100 TB the head stays KBs while the tail join keys are near-unique —
      no hot reducer on either path.
    - Per-doc mean: one groupBy(doc_id), uniform.

    Returns (doc_id, n_bigrams, avg_logprob, ppl), one row per document
    with >= 1 bigram.
    """
    w1 = F.col("w1")
    words = docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("words")
    )
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("words") >= 2,
                F.expr(
                    "transform(sequence(1, size(words) - 1), "
                    "i -> struct(element_at(words, i) AS w1, element_at(words, i + 1) AS w2))"
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")

    uni = (
        words.select(F.explode("words").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab_size = uni.agg(F.count(F.lit(1)).alias("v"))
    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))

    scored_pairs = bigrams.join(bg_counts, ["w1", "w2"])

    # Zipf split-join for C(w1): broadcast head, shuffle tail.
    hot = uni.orderBy(F.col("c1").desc(), w1).limit(hot_head)
    hot_b = F.broadcast(hot.withColumnRenamed("c1", "c1_hot"))
    with_hot = scored_pairs.join(hot_b, "w1", "left")
    cold = with_hot.filter(F.col("c1_hot").isNull()).drop("c1_hot").join(uni, "w1")
    hot_side = (
        with_hot.filter(F.col("c1_hot").isNotNull())
        .withColumnRenamed("c1_hot", "c1")
    )
    all_scored = hot_side.unionByName(cold)

    logprob = F.log(
        (F.col("c12") + F.lit(k))
        / (F.col("c1") + F.lit(k) * F.col("v").cast("double"))
    )
    return (
        all_scored.crossJoin(F.broadcast(vocab_size))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            r4(F.avg(logprob)).alias("avg_logprob"),
            r4(F.exp(-F.avg(logprob))).alias("ppl"),
        )
    )


# --- C4-style line-level cleaning -------------------------------------------
# (Raffel et al., "Exploring the Limits of Transfer Learning with a
# Unified Text-to-Text Transformer", JMLR 2020 §2.2 — the C4 heuristics.)
C4_MIN_LINE_WORDS = 3
C4_BAD_MARKERS = ["lorem ipsum", "javascript", "cookie policy", "all rights reserved"]
C4_TERMINALS = (".", "!", "?", '"', "'")


def c4_kept_lines_expr(
    text: Column,
    min_line_words: int = C4_MIN_LINE_WORDS,
    require_terminal: bool = True,
    bad_markers: list[str] | None = None,
) -> Column:
    """Array of the RAW (untrimmed) lines of ``text`` surviving the C4
    line heuristics — the shared expression under both clean_lines_c4
    and q91's gate columns (operators/text.py). One narrow codegen'd
    filter over split(text, '\\n'); no explode, no shuffle."""
    markers = [
        m.lower() for m in (C4_BAD_MARKERS if bad_markers is None else bad_markers)
    ]

    def line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        words = F.size(F.regexp_extract_all(t, F.lit(r"[^ \t\x0B\f\r]+"), 0))
        ok = words >= F.lit(min_line_words)
        if require_terminal:
            terminal = F.lit(False)
            for term in C4_TERMINALS:
                terminal = terminal | t.endswith(F.lit(term))
            ok = ok & terminal
        low = F.lower(t)
        for mk in markers:
            ok = ok & ~low.contains(F.lit(mk))
        return ok

    return F.filter(F.split(text, "\n"), line_ok)


def clean_lines_c4(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = C4_MIN_LINE_WORDS,
    require_terminal: bool = True,
    bad_markers: list[str] | None = None,
) -> DataFrame:
    """C4-style LINE-level cleaning as one narrow codegen'd map — the
    filters C4 applies before any document-level scoring:

    - drop lines with fewer than ``min_line_words`` words;
    - drop lines not ending in terminal punctuation (``require_terminal``);
    - drop lines containing any ``bad_markers`` substring (boilerplate:
      'lorem ipsum', cookie/JS notices, rights reserved);
    - drop the whole document if nothing survives.

    Everything is filter/transform over split(text, '\\n') — per-row
    array surgery, no explode, no shuffle, no Python; the kept text plus
    per-document accounting (lines/chars kept vs seen) comes out of the
    single pass, so at 100 TB this composes with q50's fused projection
    as the same one corpus scan. Returns
    (id, clean_text, n_lines, n_lines_kept, n_chars, n_chars_kept).

    Curly-brace pages (C4 drops documents containing '{') are LEFT to
    the caller: this fixture's corpus is prose, and the doc-level gate
    is one extra `~contains` filter where wanted."""
    lines = F.split(F.col(text_col), "\n")
    kept = c4_kept_lines_expr(
        F.col(text_col), min_line_words, require_terminal, bad_markers
    )
    joined = F.array_join(F.transform(kept, F.trim), "\n")
    out = docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.length(joined).cast("long").alias("n_chars_kept"),
        joined.alias("clean_text"),
    )
    return out.filter(F.col("n_lines_kept") > 0)

"""Text-analysis operators for training-data pipelines (beyond parity).

All hot-path logic is built-in JVM expressions (regexp_*, length, split,
md5) — no Python UDFs — so these stay inside whole-stage codegen and scale
linearly with partitions: each operator is a pure per-row map, zero
shuffles (except the final fingerprint group-by), which is exactly the
shape you want over a 100 TB document corpus.

Operators: token counting, quality scoring, language ID (stopword n-gram
heuristic), document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from entangledb_spark.functions.exprmemo import expr_template
from entangledb_spark.functions.numeric import r4
from entangledb_spark.operators._minhash_params import (
    minhash_gate_oracle_ctes,
    simhash_gate_oracle_ctes,
)
from entangledb_spark.operators.retrieval import bm25_gate_oracle_ctes
from entangledb_spark.registry import query, table

# Stopword marker regexes per language — tiny, deterministic heuristic that
# both engines (Spark & DuckDB oracle) evaluate identically. Word-boundary
# anchored; counts per document are the language scores.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
    "es": r"\b(el|los|las|es|una|que)\b",
}

# Whitespace-token regex with an EXPLICIT negated class (≡ Java's \S):
# Java's \s is [ \t\n\x0B\f\r] but RE2's (DuckDB's) \s omits \x0B, so a
# bare \S+ tokenizes \x0B-containing text differently in Spark vs the
# oracle — same divergence class BPE_TOKEN_RE already guards against.
# Every oracle SQL string spells out the same class.
TOKEN_RE = r"[^ \t\n\x0B\f\r]+"
WORD_RE = r"[a-zA-Z]+"
# GPT-2-style pre-tokenizer (contraction suffixes, space-prefixed letter/
# digit/punct runs, whitespace runs) WITHOUT the trailing-space lookahead —
# lookahead isn't RE2-expressible. Whitespace is the EXPLICIT class
# [ \t\n\x0B\f\r] rather than \s: Java's \s includes \x0B (vertical tab)
# but RE2's does not, so \s would tokenize \x0B-containing text differently
# in Spark vs the DuckDB oracle. Counts approximate LLM token counts far
# better than whitespace splitting (punctuation and contractions tokenize
# separately).
_BPE_WS = r" \t\n\x0B\f\r"
BPE_TOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_BPE_WS}\p{{L}}\p{{N}}]+|[{_BPE_WS}]+"
)


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace.

    The whitespace class is EXPLICIT (≡ Java's \\s) rather than \\s so
    both engines collapse identically: RE2's \\s omits \\x0B, so a bare
    \\s here vs there would fingerprint vertical-tab text differently —
    every oracle SQL string spells out the same class."""
    return F.trim(F.regexp_replace(F.lower(col), r"[ \t\n\x0B\f\r]+", " "))


def fingerprint(col: Column) -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex).

    The distributed analog of the reference's per-row primary-key identity
    (rows are identified by PK bytes, /root/reference/src/sql/engine/
    kv.rs:146): content-addressed identity for dedup at corpus scale.
    """
    return F.md5(normalize_text(col))


def _langid_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: F.size(F.regexp_extract_all(low, F.lit(pat), 0)).cast("long")
        for lang, pat in LANG_MARKERS.items()
    }


_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE_RE = r"\b\d{3}[-. ]?\d{3}[-. ]?\d{4}\b"


@query(
    "q50_text_suite",
    oracle=r"""
    WITH scores AS (
      SELECT doc_id, text,
             CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|in)\b')) AS BIGINT)  AS en_score,
             CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS BIGINT) AS de_score,
             CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une)\b')) AS BIGINT)  AS fr_score,
             CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|que)\b')) AS BIGINT) AS es_score
      FROM documents
    ),
    -- winnowing fingerprints (operators/fingerprints.py): k=24, window=8
    -- (K_GRAM/WINDOW constants; hardcoded because the literal is not an
    -- f-string — regex braces would collide)
    fpg AS (
      SELECT doc_id,
             greatest(length(t) - 23, 0) AS n_fp_grams,
             list_transform(range(1, greatest(length(t) - 23, 0) + 1),
                            i -> md5(substring(t, CAST(i AS INTEGER), 24))) AS g
      FROM (SELECT doc_id, trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS t
            FROM documents)
    ),
    wn AS (
      SELECT doc_id, n_fp_grams,
             CASE
               WHEN len(g) - 7 >= 1 THEN
                 list_distinct(list_transform(
                   range(1, len(g) - 7 + 1),
                   j -> list_aggregate(g[CAST(j AS INTEGER):CAST(j + 7 AS INTEGER)], 'min')))
               WHEN len(g) >= 1 THEN [list_aggregate(g, 'min')]
               ELSE CAST([] AS VARCHAR[])
             END AS fps
      FROM fpg
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                               AS n_char,
           CAST(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) AS BIGINT)       AS n_tokens,
           CAST(len(regexp_extract_all(text,
                '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\x0B\f\r\p{L}\p{N}]+|[ \t\n\x0B\f\r]+'))
                AS BIGINT)                                            AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) AS BIGINT)
                                                                      AS n_distinct_words,
           r4(CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
                 / greatest(length(text), 1))                         AS punct_ratio,
           r4(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
                 / greatest(length(text), 1))                         AS digit_ratio,
           r4(CAST(en_score AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')), 1)) AS stopword_ratio,
           r4(CAST(length(text) AS DOUBLE)
                 / greatest(len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')), 1)) AS avg_token_len,
           (length(text) >= 50 AND length(text) <= 10000
            AND len(regexp_extract_all(text, '[^ \t\n\x0B\f\r]+')) >= 10)           AS passes_length_gate,
           en_score, de_score, fr_score, es_score,
           CASE
             WHEN greatest(en_score, de_score, fr_score, es_score) = 0 THEN 'und'
             WHEN en_score >= de_score AND en_score >= fr_score AND en_score >= es_score THEN 'en'
             WHEN de_score >= fr_score AND de_score >= es_score THEN 'de'
             WHEN fr_score >= es_score THEN 'fr'
             ELSE 'es'
           END AS predicted_lang,
           md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp,
           regexp_replace(
             regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                            '<EMAIL>', 'g'),
             '\b\d{3}[-. ]?\d{3}[-. ]?\d{4}\b', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
                '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text,
                '\b\d{3}[-. ]?\d{3}[-. ]?\d{4}\b')) AS BIGINT) AS n_phones,
           CAST(wn.n_fp_grams AS BIGINT) AS n_fp_grams,
           CAST(len(wn.fps) AS BIGINT) AS n_fps,
           md5(array_to_string(list_sort(wn.fps), ',')) AS fp_digest
    FROM scores JOIN wn USING (doc_id)
    """,
)
def q50_text_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis in ONE wide projection — the operators a
    training pipeline runs together in a single pass over the corpus:

    - token counting: whitespace tokens, GPT-2-style BPE pre-tokens
      (BPE_TOKEN_RE — the LLM-token-count estimator), alpha words,
      distinct vocabulary.
    - quality scoring: punctuation/digit/stopword ratios, average token
      length, a length gate — the cheap pre-filters applied before
      model-based scoring.
    - language ID: stopword-marker counts with a deterministic argmax
      (fixed precedence en>de>fr>es on ties, 'und' when nothing hits); a
      production variant swaps in char-n-gram Naive Bayes, same shape.
    - content fingerprint: md5 over normalized text — the exact-dedup key
      (grouped form lives in q60_dedup_exact).
    - PII redaction: e-mail/phone regex scrub with match counts.
    - winnowing fingerprint density + digest (operators/fingerprints.py):
      n_fp_grams / n_fps / md5-of-sorted-prints — puts the winnowing
      relation itself on the driver's DuckDB oracle gate (the overlap
      JOIN stays pytest-verified); the n_fps/n_fp_grams ratio vs the
      ~2/(window+1) expectation is also a cheap self-repetitiveness
      signal.

    Everything is built-in JVM regexp/hash expressions in whole-stage
    codegen: a pure narrow map, zero shuffles, one pass over text — at
    100 TB the fused projection reads the corpus once instead of five
    times. The ~10 regex passes are the CPU hot spot, so the scan is
    spread across cores first (no-op when the input already has ≥cores
    partitions).

    The winnowing fingerprint array feeds TWO output columns (n_fps,
    fp_digest) but higher-order-function expressions never enter codegen
    subexpression elimination, so a single-projection form evaluated the
    whole winnow pipeline (one md5 per character + window mins) twice per
    row — measured 2x the winnow cost at sf1. It is therefore let-bound
    in its own projection layer (CollapseProject keeps a non-cheap alias
    with two consumers), halving the dominant per-row cost; same fused
    single pass, identical output columns."""
    from entangledb_spark.operators.dedup import repartition_for_cpu

    d = repartition_for_cpu(table(spark, sf_dir, "documents"), spark)
    return d.select("*", *_q50_pre_cols()).select(*_q50_cols())


@expr_template
def _q50_pre_cols() -> tuple:
    """Template: the let-bound winnow fingerprint array (see
    q50_text_suite — two consumers, HOFs get no codegen CSE)."""
    from entangledb_spark.operators.fingerprints import winnow_expr

    return (winnow_expr("text").alias("_fps"),)


@expr_template
def _q50_cols() -> tuple:
    """Template: q50's full select list (~740 py4j round-trips to build,
    all constants and column-name references — built once per process)."""
    from entangledb_spark.operators.fingerprints import K_GRAM as _K_GRAM

    _winnow_fps = F.col("_fps")
    n_char = F.length("text")
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0))
    count_re = lambda c, pat: F.size(F.regexp_extract_all(c, F.lit(pat), 0))  # noqa: E731
    s = _langid_scores(F.col("text"))
    en, de, fr, es = s["en"], s["de"], s["fr"], s["es"]
    predicted = (
        F.when(F.greatest(en, de, fr, es) == 0, F.lit("und"))
        .when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        "doc_id",
        n_char.cast("long").alias("n_char"),
        n_tok.cast("long").alias("n_tokens"),
        count_re(F.col("text"), BPE_TOKEN_RE).cast("long").alias("n_bpe_tokens"),
        count_re(F.col("text"), WORD_RE).cast("long").alias("n_words"),
        F.size(
            F.array_distinct(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z]+"), 0)
            )
        )
        .cast("long")
        .alias("n_distinct_words"),
        r4(
            count_re(F.col("text"), r"[.,;:!?]").cast("double")
            / F.greatest(n_char, F.lit(1))
        ).alias("punct_ratio"),
        r4(
            count_re(F.col("text"), r"[0-9]").cast("double") / F.greatest(n_char, F.lit(1))
        ).alias("digit_ratio"),
        r4(en.cast("double") / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        r4(n_char.cast("double") / F.greatest(n_tok, F.lit(1))).alias("avg_token_len"),
        ((n_char >= 50) & (n_char <= 10000) & (n_tok >= 10)).alias("passes_length_gate"),
        en.alias("en_score"),
        de.alias("de_score"),
        fr.alias("fr_score"),
        es.alias("es_score"),
        predicted.alias("predicted_lang"),
        fingerprint(F.col("text")).alias("fp"),
        redacted.alias("redacted"),
        count_re(F.col("text"), _EMAIL_RE).cast("long").alias("n_emails"),
        count_re(F.col("text"), _PHONE_RE).cast("long").alias("n_phones"),
        F.greatest(
            F.length(normalize_text(F.col("text"))) - F.lit(_K_GRAM - 1), F.lit(0)
        )
        .cast("long")
        .alias("n_fp_grams"),
        F.size(_winnow_fps).cast("long").alias("n_fps"),
        F.md5(F.concat_ws(",", F.array_sort(_winnow_fps))).alias("fp_digest"),
    )


CHUNK_TOKENS = 50


def _pii_oracle_columns() -> str:
    """q55's PII gate columns, composed FROM PII_PATTERNS so the oracle
    regex text can never drift from the operator's (the patterns live in
    the Java-regex ∩ RE2 subset; DuckDB standard strings pass backslashes
    through verbatim). n_pii is the raw regex-net count (pre-Luhn — the
    checksum is pytest-gated, tests/test_pii.py); len_redacted runs the
    full most-specific-first replacement chain on both engines."""
    from entangledb_spark.operators.pii import PII_PATTERNS

    def lit(pat: str) -> str:
        return "'" + pat.replace("'", "''") + "'"

    n_pii = " + ".join(
        f"len(regexp_extract_all(chunk, {lit(p)}))" for p in PII_PATTERNS.values()
    )
    red = "chunk"
    for kind, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, {lit(pat)}, '<{kind.upper()}>', 'g')"
    return f"CAST({n_pii} AS BIGINT) AS n_pii, CAST(length({red}) AS BIGINT) AS len_redacted"


@query(
    "q55_text_chunking",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(text, '[^ \t\n\x0B\f\r]+') AS toks FROM documents
    ),
    ch AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks) / 50.0) AS BIGINT))) AS chunk_id
      FROM t
    ),
    final AS (
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             array_to_string(toks[(chunk_id*50+1):((chunk_id+1)*50)], ' ') AS chunk,
             CAST(least(50, len(toks) - chunk_id*50) AS BIGINT) AS n_tokens
      FROM ch
    )
    SELECT doc_id, chunk_id, chunk, n_tokens, """
    + _pii_oracle_columns()
    + """
    FROM final
    """,
)
def q55_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: split each document into CHUNK_TOKENS-token
    windows — the standard pre-tokenization step of a training pipeline.
    posexplode of row-local token slices: a narrow flatMap, no shuffle,
    output rows ≈ corpus_tokens / CHUNK_TOKENS regardless of document-length
    skew (one giant doc becomes many rows, not one giant row).

    Round 7: each chunk also carries the PII scrub stage's accounting
    (operators/pii.py) — n_pii (every pattern's regex-net matches) and
    len_redacted (length after the full placeholder-replacement chain) —
    hash-gated against a DuckDB oracle built FROM the same PII_PATTERNS
    dict. The fixture is PII-free, so the gate certifies that both
    engines' regex/replace machinery agrees on ~all chunks (the q80
    format-detector precedent); planted-PII exactness, Luhn precision,
    and DuckDB parity on PII-bearing text live in tests/test_pii.py."""
    from entangledb_spark.operators.dedup import repartition_for_cpu
    from entangledb_spark.operators.pii import PII_PATTERNS, pii_count_expr, redact_pii

    d = repartition_for_cpu(table(spark, sf_dir, "documents"), spark)
    toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
    n_chunks = F.ceil(F.size("_toks") / float(CHUNK_TOKENS)).cast("int")
    # empty-doc guard INSIDE the chunk array (NULL → posexplode emits no
    # rows) instead of `.filter(size > 0)`: Catalyst pushed that filter
    # below the repartition exchange, re-running the tokenizer regex over
    # the whole corpus at RAW-SCAN parallelism before the spread (round 11;
    # same fix as packing._window_templates). Output rows identical.
    chunks = F.when(
        F.size("_toks") > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("_toks"), i * CHUNK_TOKENS + 1, CHUNK_TOKENS)
            ),
        ),
    )
    n_pii = sum(
        (pii_count_expr(F.col("chunk"), k) for k in PII_PATTERNS), F.lit(0).cast("long")
    )
    return (
        d.withColumn("_toks", toks)
        .select("doc_id", "_toks", F.posexplode(chunks).alias("chunk_id", "chunk"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk",
            F.least(
                F.lit(CHUNK_TOKENS), F.size("_toks") - F.col("chunk_id") * CHUNK_TOKENS
            )
            .cast("long")
            .alias("n_tokens"),
            n_pii.cast("long").alias("n_pii"),
            F.length(redact_pii(F.col("chunk"))).cast("long").alias("len_redacted"),
        )
    )


@query(
    "q66_text_entropy_udf",
    # minhash CTEs composed from operators/_minhash_params.py — the same
    # constants the Spark operator uses, so the engines can never drift
    oracle="""
    WITH RECURSIVE """
    + minhash_gate_oracle_ctes()
    + ","
    + simhash_gate_oracle_ctes()
    + ","
    + bm25_gate_oracle_ctes()
    + r""",
    toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+')) AS tok
      FROM documents
    ),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
    tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
    ent AS (
      SELECT cnt.doc_id,
             -sum((c / n) * log2(c / n)) AS e
      FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id
    ),
    -- TF-IDF top-1 keyword (operators/text.py tfidf_keywords, the
    -- test_tfidf_keywords mirror lifted onto the gate): N = docs with
    -- >=1 token, cap drops tokens in > 0.5*N docs before ranking
    kt AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM kt GROUP BY 1, 2),
    nn AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.token,
             r4(tf.tf * (ln((nn.n_docs + 1.0) / (dfr.df + 1.0)) + 1.0)) AS score
      FROM tf JOIN dfr USING (token) CROSS JOIN nn
      WHERE dfr.df <= 0.5 * nn.n_docs
    ),
    top1 AS (
      SELECT doc_id, token, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS rk
      FROM scored
    )
    SELECT d.doc_id, r4(coalesce(ent.e, 0.0)) AS entropy_bits,
           t.token AS top_keyword, t.score AS top_kw_score,
           CAST(mhs.sig[1] AS BIGINT) AS mh0,
           CAST(list_aggregate(mhs.sig, 'sum') AS BIGINT) AS mh_sum,
           CAST(coalesce(mpart.n, 0) AS BIGINT) AS n_mh_band_partners,
           CAST(coalesce(mcc.cc, d.doc_id) AS BIGINT) AS mh_cc,
           CAST(coalesce(sfp.fp, 0) AS BIGINT) AS sim60,
           CAST(coalesce(spart.n, 0) AS BIGINT) AS n_sim_band_partners,
           bm.bm25_tf, bm.bm25_q
    FROM documents d
    LEFT JOIN ent ON d.doc_id = ent.doc_id
    LEFT JOIN (SELECT * FROM top1 WHERE rk = 1) t ON d.doc_id = t.doc_id
    LEFT JOIN mhs ON d.doc_id = mhs.doc_id
    LEFT JOIN mpart ON d.doc_id = mpart.doc_id
    LEFT JOIN mcc ON d.doc_id = mcc.doc_id
    LEFT JOIN sfp ON d.doc_id = sfp.doc_id
    LEFT JOIN spart ON d.doc_id = spart.doc_id
    LEFT JOIN bm ON d.doc_id = bm.doc_id
    """,
)
def q66_text_entropy_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Shannon entropy per document via a vectorized @pandas_udf
    — the third Python-integration shape next to mapInPandas (multimodal)
    and applyInPandasWithState (streaming): scalar Arrow batches in, one
    numpy computation per batch, no per-row Python overhead. Entropy of the
    token frequency distribution is a standard gibberish/boilerplate signal
    (low entropy = repetitive text).

    Oracle-matched despite the numpy path: tokenization is re.findall of
    the SAME explicit whitespace class as TOKEN_RE (Python's str.split()
    would split on Unicode whitespace — \\x1c-\\x1f, \\x85, NBSP — that
    neither Java's \\s nor the oracle's class treats as separators), and
    the entropy sum is rounded to 4 decimals on both sides
    (summation-order float noise is ~1e-12, far below the rounding
    grain).

    Host for off-headline gate columns: TF-IDF top-1 keyword, the
    MinHash/SimHash/connected-components md5 twins, and (round 7) the
    BM25 retrieval score + query-term tf through the REAL
    operators/retrieval.py scoring path — the oracle re-derives
    N/avgdl/df and the identical left-assoc float fold in SQL."""
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from entangledb_spark.deploy import ensure_shipped

    ensure_shipped(spark)
    token_re = re.compile(TOKEN_RE)

    # no type hints: `from __future__ import annotations` stringifies them,
    # which pandas_udf's hint parser can't resolve for locally-imported pd
    @pandas_udf("double")
    def token_entropy(texts):
        out = []
        for t in texts:
            toks = token_re.findall(t.lower())
            if not toks:
                out.append(0.0)
                continue
            _, counts = np.unique(np.array(toks), return_counts=True)
            p = counts / counts.sum()
            out.append(float(-(p * np.log2(p)).sum()))
        return pd.Series(out)

    d = table(spark, sf_dir, "documents")
    from entangledb_spark.operators.dedup import repartition_for_cpu

    d = repartition_for_cpu(d.select("doc_id", "text"), spark)
    ent = d.select(
        "doc_id",
        r4(token_entropy(F.col("text"))).alias("entropy_bits"),
    )
    # TF-IDF top-1 keyword per doc — puts tfidf_keywords on the driver's
    # DuckDB oracle gate (the full top-k relation stays pytest-mirrored in
    # test_tfidf_keywords). Left join: a doc whose every token is
    # cap-dropped has no keyword.
    kw = tfidf_keywords(table(spark, sf_dir, "documents"), top_k=1).select(
        "doc_id",
        F.col("token").alias("top_keyword"),
        F.col("score").alias("top_kw_score"),
    )
    # MinHash-LSH gate columns (round 7): the REAL signature + banding
    # code path with the md5 base hash so the oracle re-derives every
    # permutation-min and the banded candidate join itself
    # (dedup.minhash_gate_summary — q62's production xxhash64 variant
    # stays rows-only; this is its DuckDB-checkable twin). mh_cc further
    # runs the real convergence-checked connected_components (q67's
    # engine) over the twin's pair graph, checked against a recursive-
    # CTE label propagation in the oracle.
    from entangledb_spark.operators.dedup import (
        minhash_gate_summary,
        simhash_gate_summary,
    )

    docs_cpu = repartition_for_cpu(table(spark, sf_dir, "documents"), spark)
    mh = minhash_gate_summary(docs_cpu)
    sh = simhash_gate_summary(docs_cpu)
    # BM25 gate columns (round 7): the REAL retrieval scoring path
    # (narrow tf map → bounded stats collect → zero-exchange literal
    # fold) for the fixed probe query; the oracle re-derives N/avgdl/df
    # and the identical left-assoc fold in SQL (operators/retrieval.py).
    from entangledb_spark.operators.retrieval import bm25_gate_summary

    # reuse the already-repartitioned docs relation (same values, and the
    # narrow tf map inherits mh/sh's executor parallelism) instead of a
    # third scan of the raw parquet partitioning
    bm = bm25_gate_summary(docs_cpu)
    return (
        ent.join(kw, "doc_id", "left")
        .join(mh, "doc_id", "left")
        .join(sh, "doc_id", "left")
        .join(bm, "doc_id", "left")
    )


# Deterministic pseudo-random for sampling: Knuth multiplicative hash on the
# document id — pure BIGINT arithmetic, so Spark and DuckDB agree bit-for-bit
# and a re-run (or a different cluster) draws the same sample.
#
# The hash is computed in MODULAR space: a direct doc_id·K product exceeds
# 2^63 for doc_id ≳ 3.5e9, and a 100 TB corpus at ~10 KB/doc has ~1e10
# documents — under ANSI mode the job would fail (loudly, but still fail).
# Reducing both operands mod the Mersenne prime M = 2^31−1 first keeps the
# product < 2^62 in BIGINT for ANY nonnegative doc_id while preserving the
# multiplicative mixing ((a mod M)·(b mod M) mod M ≡ a·b mod M). Both
# knuth_bucket (Spark Column) and knuth_bucket_sql (oracle SQL fragment)
# spell out the same arithmetic so the engines stay bit-identical.
SAMPLE_K = 2654435761
HASH_M = (1 << 31) - 1


def knuth_bucket(col: Column, n: int) -> Column:
    """Overflow-safe Knuth-hash bucket of a nonnegative BIGINT id: value in
    [0, n). Pure BIGINT arithmetic, identical to knuth_bucket_sql."""
    return ((col % HASH_M) * (SAMPLE_K % HASH_M)) % HASH_M % n


def knuth_bucket_sql(expr: str, n: int) -> str:
    """DuckDB oracle fragment computing exactly knuth_bucket(expr, n).
    Operands are cast to BIGINT explicitly — DuckDB types bare integer
    literals INT32 and the multiplication would overflow in 32 bits."""
    return (
        f"((CAST({expr} AS BIGINT) % {HASH_M}) * CAST({SAMPLE_K % HASH_M} AS BIGINT))"
        f" % {HASH_M} % {n}"
    )


def knuth_key(col: Column) -> Column:
    """Raw Knuth-hash order key in [0, HASH_M) — the bucket-free form of
    knuth_bucket, for when a deterministic engine-portable total ORDER
    over ids is needed (e.g. per-cell quota sampling) rather than a
    bucket. Distinct ids below HASH_M map to distinct keys (the map is a
    bijection mod the prime); callers still tie-break on the id itself
    for ids beyond that range."""
    return ((col % HASH_M) * (SAMPLE_K % HASH_M)) % HASH_M


def knuth_key_sql(expr: str) -> str:
    """DuckDB fragment computing exactly knuth_key(expr)."""
    return (
        f"((CAST({expr} AS BIGINT) % {HASH_M}) * CAST({SAMPLE_K % HASH_M} AS BIGINT))"
        f" % {HASH_M}"
    )


from entangledb_spark.operators.classifier import nb_oracle_ctes as _nb_oracle_ctes  # noqa: E402

# q91's NB-classifier gate columns retrain on the lang='en' weak label
_nb_ctes = _nb_oracle_ctes("lang = 'en'").lstrip()


@query(
    "q91_stratified_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, n_chars, text,
             {knuth_bucket_sql("doc_id", 1000)} AS bucket
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars, text,
             row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS rk
      FROM h
    ),
    samp AS (SELECT * FROM ranked WHERE rk <= 20),
    -- C4 line cleaning (operators/quality.py clean_lines_c4, the
    -- test_c4_cleaning mirror lifted onto the gate) applied to the
    -- sampled rows only
    c4 AS (
      SELECT doc_id,
             string_split(text, chr(10)) AS lines,
             list_filter(string_split(text, chr(10)), ln ->
               len(regexp_extract_all(trim(ln), '[^ \t\x0B\f\r]+')) >= 3
               AND (ends_with(trim(ln), '.') OR ends_with(trim(ln), '!')
                    OR ends_with(trim(ln), '?') OR ends_with(trim(ln), '"')
                    OR ends_with(trim(ln), chr(39)))
               AND NOT contains(lower(trim(ln)), 'lorem ipsum')
               AND NOT contains(lower(trim(ln)), 'javascript')
               AND NOT contains(lower(trim(ln)), 'cookie policy')
               AND NOT contains(lower(trim(ln)), 'all rights reserved')
             ) AS kept
      FROM samp
    ),
    -- positional-winnowing span summary over the FULL corpus
    -- (operators/fingerprints.py winnow_overlap_spans at k=24, window=8,
    -- min_shared=2, cap=0.1; the pytest DuckDB positional mirror lifted
    -- to gaps-and-islands): per-window leftmost-min (fp, pos) structs,
    -- hot-fp doc-frequency guard, fp equi-join with doc_a < doc_b,
    -- diagonal (pos_b - pos_a) island merge at anchor gap <= t = 31,
    -- spans with >= 2 anchors, rolled up per participating document
    wsn AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS t
      FROM documents
    ),
    -- vectorized winnow: one row per k-gram, then a frame-window MIN of
    -- (fp, pos) structs — struct comparison is (fp, then pos), i.e. the
    -- minimal hash with its LEFTMOST position, exactly the Spark side's
    -- array_min + first array_position tie-break. Start positions run
    -- 1..n_grams-7 (full windows); a doc with 1..7 grams keeps start 1,
    -- whose truncated frame covers all grams = the global min.
    gpos AS (
      SELECT doc_id, t, greatest(length(t) - 23, 0) AS n_grams,
             unnest(range(1, greatest(length(t) - 23, 0) + 1)) AS i
      FROM wsn
    ),
    grams AS (
      SELECT doc_id, n_grams, CAST(i AS BIGINT) AS pos,
             md5(substring(t, CAST(i AS INTEGER), 24)) AS gram
      FROM gpos
    ),
    wins AS (
      SELECT doc_id, pos, n_grams,
             min(struct_pack(fp := gram, pos := pos))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS sel
      FROM grams
    ),
    posting AS (
      SELECT DISTINCT doc_id, sel.fp AS fp, sel.pos AS pos
      FROM wins WHERE pos <= greatest(n_grams - 7, 1)
    ),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM posting),
    hot AS (
      SELECT fp FROM posting, nd GROUP BY fp, n
      HAVING count(DISTINCT doc_id) > greatest(0.1 * n, 2.0)
    ),
    cold AS (SELECT * FROM posting WHERE fp NOT IN (SELECT fp FROM hot)),
    anch AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.pos AS pos_a, b.pos - a.pos AS diag
      FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    lagd AS (
      SELECT doc_a, doc_b, diag, pos_a,
             CASE WHEN pos_a - lag(pos_a) OVER (PARTITION BY doc_a, doc_b, diag
                                                ORDER BY pos_a) > 31
                  THEN 1 ELSE 0 END AS brk
      FROM anch
    ),
    isl AS (
      SELECT doc_a, doc_b, diag, pos_a,
             sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS island
      FROM lagd
    ),
    sp AS (
      SELECT doc_a, doc_b, max(pos_a) - min(pos_a) + 24 AS span_len
      FROM isl GROUP BY doc_a, doc_b, diag, island
      HAVING count(*) >= 2
    ),
    pd AS (
      SELECT doc_id, count(*) AS n_overlap_spans, max(span_len) AS max_span_len
      FROM (SELECT doc_a AS doc_id, span_len FROM sp
            UNION ALL SELECT doc_b AS doc_id, span_len FROM sp)
      GROUP BY doc_id
    ),
    -- DSIR importance log-weights (operators/selection.py, arXiv:
    -- 2302.03169; round 7): hashed unigram+bigram features (token hash
    -- = first 6 md5 hex chars % 10000 — Spark's conv(substr(md5),16,10)
    -- exactly), target = the src0 slice, add-one-smoothed
    -- log-likelihood-ratio sum per document, corpus-wide then joined to
    -- the sampled rows (same hosting recipe as the span columns)
    dtoks AS (
      SELECT doc_id, source,
             regexp_extract_all(lower(text), '[^ \t\n\x0B\f\r]+') AS toks
      FROM documents
    ),
    dfeat AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(f), 1, 6))::BIGINT % 10000 AS bucket
      FROM (
        SELECT doc_id, source, unnest(list_concat(toks,
                 CASE WHEN len(toks) >= 2 THEN list_transform(
                   range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                 ELSE [] END)) AS f
        FROM dtoks)
    ),
    dcp AS (SELECT bucket, count(*) AS c FROM dfeat WHERE source = 'src0'
            GROUP BY bucket),
    dcq AS (SELECT bucket, count(*) AS c FROM dfeat GROUP BY bucket),
    dtot AS (SELECT (SELECT count(*) FROM dfeat WHERE source = 'src0') AS np,
                    (SELECT count(*) FROM dfeat) AS nq),
    ddiff AS (
      SELECT coalesce(dcp.bucket, dcq.bucket) AS bucket,
             ln(coalesce(dcp.c, 0) + 1) - ln(coalesce(dcq.c, 0) + 1) AS d
      FROM dcp FULL OUTER JOIN dcq ON dcp.bucket = dcq.bucket
    ),
    dw AS (
      SELECT doc.doc_id,
             CAST(count(rf.bucket) AS BIGINT) AS n_feats,
             coalesce(sum(dd.d), 0)
               + count(rf.bucket) * (ln(nq + 10000) - ln(np + 10000)) AS logw
      FROM documents doc
      LEFT JOIN dfeat rf ON rf.doc_id = doc.doc_id
      LEFT JOIN ddiff dd ON dd.bucket = rf.bucket
      CROSS JOIN dtot
      GROUP BY doc.doc_id, np, nq
    ),
    -- trained NB quality classifier (operators/classifier.py) retrained
    -- from scratch in SQL: md5-bucket hashed-token counts per class,
    -- add-one smoothing, log-odds, doc-count prior — the q92 langid
    -- training-in-SQL recipe for the binary hashed-feature sibling.
    -- Weak label: lang = 'en'. Margins (sign + r4 flip) measured in
    -- tests/test_classifier.py::test_nb_gate_margins at every density.
    {_nb_ctes}
    SELECT s.doc_id, s.lang, CAST(s.n_chars AS BIGINT) AS n_chars,
           CAST(s.rk AS BIGINT) AS rk,
           CAST(len(c4.lines) AS BIGINT) AS n_lines,
           CAST(len(c4.kept) AS BIGINT) AS n_lines_kept,
           -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
           -- array_join([]) is '' — empty kept must digest md5('')
           md5(coalesce(
             array_to_string(list_transform(c4.kept, x -> trim(x)), chr(10)), ''))
             AS c4_digest,
           CAST(coalesce(pd.n_overlap_spans, 0) AS BIGINT) AS n_overlap_spans,
           CAST(coalesce(pd.max_span_len, 0) AS BIGINT) AS max_span_len,
           CAST(dw.n_feats AS BIGINT) AS n_dsir_feats,
           r4(dw.logw) AS dsir_logw,
           CAST(CASE WHEN nb.score > 0 THEN 1 ELSE 0 END AS BIGINT) AS nb_pred,
           r4(nb.score) AS nbq_q
    FROM samp s JOIN c4 USING (doc_id) LEFT JOIN pd USING (doc_id)
         LEFT JOIN dw USING (doc_id)
         LEFT JOIN nbscore nb USING (doc_id)
    """,
)
def q91_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: exactly 20 documents per language stratum,
    selected by a deterministic hash order — reproducible corpus subsets
    without RNG state. Scale: one shuffle on the stratum key;
    WindowGroupLimit keeps per-partition top-k before the merge.

    The sampled rows also carry C4 line-cleaning accounting
    (n_lines / n_lines_kept / md5 digest of the cleaned text) — the
    clean-what-you-sampled composition that puts clean_lines_c4
    (operators/quality.py) on the driver's oracle gate. The C4
    expression is a narrow map evaluated AFTER the rank filter, so it
    costs 20 rows per stratum, not a corpus pass; a doc whose lines all
    drop digests the empty string (the full operator's document-drop
    semantics stay pytest-verified in test_c4_cleaning).

    Since round 6 each sampled row also reports its corpus-wide
    duplicate-span exposure — n_overlap_spans / max_span_len from the
    POSITIONAL-winnowing diagonal island merge
    (operators/fingerprints.py:winnow_span_summary at module defaults,
    oracle re-derived in DuckDB SQL) — putting the span-localization
    operator family on the driver's hash gate (VERDICT r5 #1). The span
    relation is computed over the full corpus (overlap partners live
    outside the sample by construction) then left-joined to the 100
    sampled rows; hosted here rather than on headline q93/q50 so the
    gate evidence costs no bench time (README registry policy rule 1).
    Docs with no qualifying span report 0/0.

    Since round 7 each sampled row ALSO carries its DSIR importance
    weight (operators/selection.py, arXiv:2302.03169) against the src0
    slice as the target corpus — n_dsir_feats / r4(dsir_logw) from the
    hashed unigram+bigram likelihood-ratio sum, distributions computed
    corpus-wide and re-derived in the oracle's SQL down to the
    conv(substr(md5(token),1,6)) bucket hash. Same hosting recipe as
    the span columns; the Gumbel-top-k resample itself stays
    pytest-gated (tests/test_selection.py, incl. a full DuckDB mirror
    of the weights).

    Round 7: each sampled row also carries the trained NB quality
    classifier's verdict (nb_pred, r4 score nbq_q —
    operators/classifier.py, hashed-token features on the md5 twin
    primitive, lang=='en' weak label): the oracle RETRAINS the model in
    SQL (the q92 langid recipe), so counting, smoothing, log-odds,
    prior, and scoring all sit on the hash gate; sign/flip margins
    measured in tests/test_classifier.py::test_nb_gate_margins."""
    from pyspark.sql import Window

    from entangledb_spark.operators.dedup import repartition_for_cpu
    from entangledb_spark.operators.fingerprints import winnow_span_summary
    from entangledb_spark.operators.quality import c4_kept_lines_expr
    from entangledb_spark.operators.selection import dsir_log_weights

    d = table(spark, sf_dir, "documents")
    bucket = knuth_bucket(F.col("doc_id"), 1000)
    w = Window.partitionBy("lang").orderBy(bucket.asc(), F.col("doc_id").asc())
    kept = c4_kept_lines_expr(F.col("text"))
    # the positional-winnow HOF is CPU-bound per row: spread the
    # single-file fixture scan across cores (no-op on real multi-file
    # inputs) before paying ~n_chars md5s per document
    summ = winnow_span_summary(repartition_for_cpu(d, spark))
    dsir = dsir_log_weights(d, d.filter(F.col("source") == "src0").select("text"))
    # trained NB quality classifier (round 7, operators/classifier.py):
    # trained corpus-wide on the lang=='en' weak label (one bounded
    # aggregation), scored on the 100 sampled rows via the literal-array
    # fold — the oracle retrains the identical model in SQL (md5-bucket
    # twin primitive), so training AND scoring sit on the hash gate
    from entangledb_spark.operators.classifier import (
        nb_score_expr,
        train_nb_quality,
    )

    nb_model = train_nb_quality(d, F.col("lang") == "en")
    nb_score = nb_score_expr(F.col("text"), nb_model)
    return (
        d.select("doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars"), "text")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 20)
        .join(summ, "doc_id", "left")
        .join(dsir, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "rk",
            F.size(F.split(F.col("text"), "\n")).cast("long").alias("n_lines"),
            F.size(kept).cast("long").alias("n_lines_kept"),
            F.md5(F.array_join(F.transform(kept, F.trim), "\n")).alias("c4_digest"),
            F.coalesce("n_overlap_spans", F.lit(0)).cast("long").alias("n_overlap_spans"),
            F.coalesce("max_span_len", F.lit(0)).cast("long").alias("max_span_len"),
            F.col("n_feats").cast("long").alias("n_dsir_feats"),
            r4(F.col("logw")).alias("dsir_logw"),
            (nb_score > 0).cast("long").alias("nb_pred"),
            r4(nb_score).alias("nbq_q"),
        )
    )


@query(
    "q92_dataset_mixture",
    oracle=rf"""
    WITH tagged AS (
      SELECT doc_id, source, lang, text,
             {knuth_bucket_sql("doc_id", 100)} AS bucket,
             CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 50 ELSE 20 END AS rate
      FROM documents
    ),
    -- trained char-trigram NB language ID (operators/langid.py), the
    -- test_langid DuckDB-training mirror lifted onto the gate: train on
    -- every labeled doc (top-64 grams/lang, control-char grams dropped),
    -- score the SAMPLED docs, argmax with ties to the first language
    tr AS (
      SELECT lang, trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS t
      FROM documents WHERE lang IS NOT NULL
    ),
    g AS (
      SELECT lang, unnest(list_transform(
               range(1, greatest(length(t) - 2, 0) + 1),
               i -> substring(t, CAST(i AS INTEGER), 3))) AS gram
      FROM tr
    ),
    c AS (
      SELECT lang, gram, count(*) AS c FROM g
      WHERE NOT regexp_matches(gram, '[\x00-\x1f\x7f]')
      GROUP BY lang, gram
    ),
    r AS (
      SELECT lang, gram, c,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram) AS rk
      FROM c
    ),
    kept AS (SELECT lang, gram, c FROM r WHERE rk <= 64),
    lstat AS (SELECT lang, sum(c) AS t, count(*) AS v FROM kept GROUP BY lang),
    samp AS (
      SELECT doc_id, source, lang AS true_lang,
             trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS t
      FROM tagged WHERE bucket < rate
    ),
    dg AS (
      SELECT doc_id, unnest(list_transform(
               range(1, greatest(length(t) - 2, 0) + 1),
               i -> substring(t, CAST(i AS INTEGER), 3))) AS gram
      FROM samp
    ),
    persum AS (
      SELECT dg.doc_id, ls.lang,
             sum(CASE WHEN k.c IS NOT NULL
                      THEN ln((k.c + 1.0) / (ls.t + ls.v + 1))
                      ELSE ln(1.0 / (ls.t + ls.v + 1)) END) AS s
      FROM dg CROSS JOIN lstat ls
      LEFT JOIN kept k ON k.lang = ls.lang AND k.gram = dg.gram
      GROUP BY dg.doc_id, ls.lang
    ),
    scorefin AS (
      SELECT sm.doc_id, ls.lang,
             coalesce(ps.s, 0.0) + ln(1.0 / (ls.t + ls.v + 1)) AS score
      FROM samp sm CROSS JOIN lstat ls
      LEFT JOIN persum ps ON ps.doc_id = sm.doc_id AND ps.lang = ls.lang
    ),
    pred AS (
      SELECT doc_id, lang AS predicted,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS pr
      FROM scorefin
    )
    SELECT sm.source, count(*) AS n_sampled,
           CAST(min(sm.doc_id) AS BIGINT) AS first_doc,
           CAST(count(*) FILTER (WHERE p.predicted = sm.true_lang) AS BIGINT)
             AS n_lang_match
    FROM samp sm
    JOIN (SELECT doc_id, predicted FROM pred WHERE pr = 1) p USING (doc_id)
    GROUP BY sm.source
    """,
)
def q92_dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: per-source sampling rates (80%/50%/20%)
    applied with the deterministic hash — the standard way to rebalance
    source proportions in a training mix. Pure narrow filter + one tiny
    aggregation; rates change without reshuffling anything.

    Each source row also reports ``n_lang_match`` — how many sampled
    docs the corpus-TRAINED char-trigram NB language ID
    (operators/langid.py) assigns their labeled language — putting the
    full train+score+argmax pipeline on the driver's oracle gate (the
    oracle re-trains the identical model in DuckDB SQL). The model is a
    bounded collect (≤ langs × 64 rows); scoring stays a narrow
    zero-shuffle expression over only the sampled rows, so the mixing
    plan shape is unchanged: one filter, one tiny aggregation.
    Summation-order float noise (~1e-12) is far below typical argmax
    margins; the count is additionally robust because only flips ACROSS
    the labeled language would change it."""
    from entangledb_spark.operators.langid import (
        langid_argmax_expr,
        train_langid_model,
    )

    d = table(spark, sf_dir, "documents")
    model = train_langid_model(d)
    bucket = knuth_bucket(F.col("doc_id"), 100)
    rate = (
        F.when(F.col("source") == "src0", 80)
        .when(F.col("source") == "src1", 50)
        .otherwise(20)
    )
    pred = langid_argmax_expr(F.col("text"), model)
    return (
        d.filter(bucket < rate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.coalesce(F.sum((pred == F.col("lang")).cast("long")), F.lit(0))
            .cast("long")
            .alias("n_lang_match"),
        )
    )


# --- TF-IDF keyword extraction ----------------------------------------------
KEYWORD_DOC_FREQ_CAP = 0.5  # tokens in > cap×N docs can never be keywords
KEYWORD_TOP_K = 5


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = KEYWORD_TOP_K,
    doc_freq_cap: float = KEYWORD_DOC_FREQ_CAP,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the classic keyword/topic
    signal a curation pipeline attaches before mixing or routing.

    score = tf · (ln((N+1)/(df+1)) + 1), smoothed so df=N stays finite;
    ties break lexicographically so both engines rank identically.

    N is the count of documents with ≥1 token. When ``n_docs`` is not
    supplied it is NOT a separate ``docs.count()`` action (that paid a
    second full corpus scan for one scalar — real money at 100 TB):
    it is a 1-row distinct-id aggregate over the tf relation, folded
    into the SAME query as a broadcast. The tf relation itself is
    lazily localCheckpoint-ed because THREE plan branches consume it
    (tf rows, df, N) and Catalyst's exchange reuse cannot unify them
    (the count_distinct branch canonicalizes to a different aggregate
    shape — measured: 3 source scans without the checkpoint, 1 with);
    the checkpoint blocks are ContextCleaner-reclaimed, the
    fingerprints.py lifetime recipe. Token-less documents never appear
    in tf, can't affect df, and can't have keywords, so excluding them
    from N only drops noise rows from the idf denominator; callers who
    need the raw-corpus N (e.g. to match an external idf table) pass
    ``n_docs`` explicitly.

    Plan and the Zipf hazard: the (token → df) relation joins back to
    per-doc term frequencies ON THE TOKEN — and the join-key frequency
    IS document frequency, so 'the' would hot-spot the shuffle exactly
    like the LM score's C(w1) join (quality.py). Here the fix is
    semantic instead of a split-join: tokens in more than cap×N
    documents get a near-floor idf and can never be keywords, so they
    are dropped by broadcast anti-join BEFORE the df join (the
    dedup.py DOC_FREQ_CAP pattern) — the surviving join keys are
    capped-frequency by construction. Two shuffles total: the (doc,
    token) tf aggregation and the per-doc top-k window.

    Returns (id, token, tf, df, score, rank), rank 1..top_k."""
    from pyspark.sql import Window

    from entangledb_spark.functions.numeric import r4

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z]+"), 0)
        ).alias("token"),
    )
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    if n_docs is None:
        tf = tf.localCheckpoint(eager=False)
    df_rel = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if n_docs is not None:
        n_col = F.lit(float(n_docs))
        with_n = lambda rel: rel  # noqa: E731
    else:
        # 1-row broadcast (BNLJ with a single-row build side — the q96
        # corpus-total recipe); stays inside one query execution so the
        # tf exchange is planned once and reused, not recomputed.
        nd = F.broadcast(
            tf.groupBy().agg(F.count_distinct(F.col(id_col)).alias("_n_docs"))
        )
        n_col = F.col("_n_docs").cast("double")
        with_n = lambda rel: rel.join(nd)  # noqa: E731
    hot = with_n(df_rel).filter(F.col("df") > doc_freq_cap * n_col).select("token")
    idf = F.log((n_col + 1.0) / (F.col("df") + 1.0)) + 1.0
    scored = (
        with_n(tf.join(F.broadcast(hot), "token", "left_anti").join(df_rel, "token"))
        .withColumn("score", r4(F.col("tf") * idf))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "token", "tf", "df", "score", "rank")
    )

"""Winnowing fingerprints: the SIGMOD'03 coverage guarantee on planted
overlaps, containment-pair detection, and a full DuckDB mirror of the
fingerprint relation on the real documents table."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from entangledb_spark.operators.fingerprints import (
    K_GRAM,
    WINDOW,
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from tests.oracle import duck_connect


def _rand_text(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_winnow_guarantee_shared_substring(spark):
    """Any shared substring of >= k + window - 1 chars must yield at least
    one shared fingerprint (the winnowing guarantee)."""
    rng = random.Random(11)
    a = _rand_text(rng, 400)
    # the guarantee-minimum shared run, placed mid-document in b
    shared = a[100 : 100 + K_GRAM + WINDOW - 1]
    b = _rand_text(rng, 150) + shared + _rand_text(rng, 150)
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    fps = {r.doc_id: set(r.fps) for r in winnow_fingerprints(df).collect()}
    assert fps[0] & fps[1], "guarantee violated: no shared fingerprint"


def test_winnow_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, "x" * K_GRAM), (3, "y" * (K_GRAM + WINDOW + 5))],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in winnow_fingerprints(df).collect()}
    assert rows[0].n_fps == 0 and rows[0].n_grams == 0
    assert rows[1].n_fps == 0  # shorter than one k-gram
    assert rows[2].n_fps == 1  # one gram, below window -> global min
    assert rows[3].n_fps == 1  # repetitive: every window picks the same hash


def test_overlap_pairs_detect_containment(spark):
    """A 250-char passage of A embedded in B is found as an overlap pair
    with high containment even though B is mostly unrelated text; the
    unrelated doc C pairs with neither."""
    rng = random.Random(23)
    a = _rand_text(rng, 600)
    passage = a[50:300]
    b = _rand_text(rng, 500) + passage + _rand_text(rng, 500)
    c = _rand_text(rng, 800)
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "doc_id long, text string"
    )
    # Default cap: the df-floor (hot threshold >= 2) keeps the planted
    # df=2 fingerprints even though cap×3 docs < 1 — exactly the
    # small-corpus case the floor exists for.
    pairs = {
        (r.doc_a, r.doc_b): r
        for r in winnow_overlap_pairs(df, min_shared=3).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)].containment > 0.2
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_winnow_duckdb_mirror(spark, sf_dir):
    """Full-engine parity of (n_grams, n_fps, sorted-fps digest) per
    document on the real corpus — same md5-hex/lexicographic-min recipe
    expressed in DuckDB list functions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    sdf = (
        winnow_fingerprints(docs)
        .select(
            "doc_id",
            "n_grams",
            "n_fps",
            F.md5(F.concat_ws(",", F.array_sort("fps"))).alias("digest"),
        )
    )
    got = {r.doc_id: (r.n_grams, r.n_fps, r.digest) for r in sdf.collect()}
    k, w = K_GRAM, WINDOW
    con = duck_connect(sf_dir)
    sql = f"""
    WITH s AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             greatest(length(t) - {k - 1}, 0) AS n_grams,
             list_transform(range(1, greatest(length(t) - {k - 1}, 0) + 1),
                            i -> md5(substring(t, CAST(i AS INTEGER), {k}))) AS grams
      FROM s
    ),
    wn AS (
      SELECT doc_id, n_grams,
             CASE
               WHEN len(grams) - {w - 1} >= 1 THEN
                 list_distinct(list_transform(
                   range(1, len(grams) - {w - 1} + 1),
                   j -> list_aggregate(
                     grams[CAST(j AS INTEGER):CAST(j + {w - 1} AS INTEGER)], 'min')))
               WHEN len(grams) >= 1 THEN [list_aggregate(grams, 'min')]
               ELSE CAST([] AS VARCHAR[])
             END AS fps
      FROM g
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fps,
           md5(array_to_string(list_sort(fps), ',')) AS digest
    FROM wn
    """
    truth = {d: (g, n, dg) for d, g, n, dg in con.execute(sql).fetchall()}
    assert got == truth


def test_fp_doc_freq_cap_boundary(spark):
    """Strict-> boundary of the hot-fingerprint guard, mirroring the q61
    token-cap test (tests/test_skew_stress.py): with 4 docs and cap=0.5
    the threshold is 2.0 fingerprints-per-doc-frequency — a passage
    shared by exactly 2 docs survives (its prints have df=2), a passage
    shared by 3 docs is dropped entirely (df=3 > 2), so the pairs that
    exist ONLY through the 3-doc boilerplate must vanish while the
    2-doc containment pair stays."""
    rng = random.Random(97)
    passage_a = _rand_text(rng, 80)   # in docs 0,1  -> df=2, kept
    passage_b = _rand_text(rng, 80)   # in docs 0,1,2 -> df=3, dropped
    docs = spark.createDataFrame(
        [
            (0, passage_a + _rand_text(rng, 120) + passage_b),
            (1, _rand_text(rng, 120) + passage_a + passage_b),
            (2, passage_b + _rand_text(rng, 200)),
            (3, _rand_text(rng, 300)),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in winnow_overlap_pairs(docs, min_shared=1, doc_freq_cap=0.5).collect()
    }
    assert (0, 1) in pairs, "df=2 passage must survive the cap"
    assert (0, 2) not in pairs and (1, 2) not in pairs, (
        "pairs owed solely to the df=3 boilerplate must be dropped"
    )


def test_containment_survivors_keep_superset_doc(spark):
    """article (doc 0) fully contained in article+header (doc 1): the
    contained side loses regardless of id order; an unrelated doc and a
    BELOW-threshold partial overlap both survive."""
    from entangledb_spark.operators.fingerprints import winnow_containment_survivors

    rng = random.Random(41)
    article = _rand_text(rng, 500)
    wrapped = "all rights reserved header text " + article + " footer navigation links"
    partial = article[:140] + _rand_text(rng, 600)  # small shared prefix only
    other = _rand_text(rng, 400)
    df = spark.createDataFrame(
        [(0, article), (1, wrapped), (2, partial), (3, other)],
        "doc_id long, text string",
    )
    surv = {
        r.doc_id
        for r in winnow_containment_survivors(
            df, containment_threshold=0.8, doc_freq_cap=1.0
        ).collect()
    }
    assert surv == {1, 2, 3}, surv
    # and schema is preserved
    assert winnow_containment_survivors(df).columns == df.columns


# --- positional winnowing / span-level containment --------------------------


def _norm(s):
    return " ".join(s.lower().split())


def test_winnow_pos_duckdb_mirror(spark):
    """The positional expression must match an independent DuckDB
    formulation exactly: same selected fingerprints, same 1-based
    offsets, same leftmost tie-break."""
    import duckdb

    from pyspark.sql import functions as F

    from entangledb_spark.operators.fingerprints import winnow_expr_pos

    docs = [
        (0, "The quick brown fox jumps over the lazy dog near the river bank today."),
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # repetitive: distinct dedup
        (2, "short text"),                        # < k chars -> empty
        (3, "exactly twenty-four chars"),         # 25 chars -> 2 grams < window
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, e.fp, e.pos)
        for r in df.select(
            "doc_id", winnow_expr_pos(F.col("text")).alias("w")
        ).collect()
        for e in r.w
    }
    con = duckdb.connect()
    con.register("docs", df.toPandas())
    truth = {
        (d, e["fp"], e["pos"])
        for d, es in con.execute(
            r"""
            WITH fpg AS (
              SELECT doc_id,
                     list_transform(range(1, greatest(length(t) - 23, 0) + 1),
                                    i -> md5(substring(t, CAST(i AS INTEGER), 24))) AS g
              FROM (SELECT doc_id, trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS t
                    FROM docs)
            )
            SELECT doc_id,
                   CASE
                     -- no list_distinct: DuckDB can't hash struct lists;
                     -- the test compares SETS so both sides dedup anyway
                     WHEN len(g) - 7 >= 1 THEN
                       (list_transform(
                         range(1, len(g) - 7 + 1),
                         j -> struct_pack(
                           fp := list_aggregate(g[CAST(j AS INTEGER):CAST(j + 7 AS INTEGER)], 'min'),
                           pos := CAST(j - 1 + list_position(
                             g[CAST(j AS INTEGER):CAST(j + 7 AS INTEGER)],
                             list_aggregate(g[CAST(j AS INTEGER):CAST(j + 7 AS INTEGER)], 'min')) AS BIGINT))))
                     WHEN len(g) >= 1 THEN
                       [struct_pack(fp := list_aggregate(g, 'min'),
                                    pos := CAST(list_position(g, list_aggregate(g, 'min')) AS BIGINT))]
                     ELSE CAST([] AS STRUCT(fp VARCHAR, pos BIGINT)[])
                   END AS w
            FROM fpg
            """
        ).fetchall()
        for e in es
    }
    assert got == truth
    assert any(d == 1 for d, _, _ in got)  # repetitive doc still fingerprints
    assert not any(d == 2 for d, _, _ in got)  # sub-k doc is empty


def test_overlap_spans_report_correct_offsets(spark):
    """A planted shared paragraph must surface as ONE span per pair on
    the correct diagonal, with offsets inside the true shared region
    and coverage within the winnowing guarantee t = k + window - 1."""
    from entangledb_spark.operators.fingerprints import (
        K_GRAM,
        WINDOW,
        winnow_overlap_spans,
    )

    shared = (
        "the licensing header that both documents carry verbatim and "
        "which is long enough to anchor several winnowed fingerprints "
        "across its full width for reliable span detection"
    )
    a_text = "Unique preamble for document alpha here. " + shared + " Alpha tail content."
    b_text = (
        "Completely different opener text for beta document, longer than alpha's. "
        + shared
        + " Beta closes differently."
    )
    fill = "totally unrelated filler document about fish and bicycles and weather."
    df = spark.createDataFrame(
        [(0, a_text), (1, b_text), (2, fill)], "doc_id long, text string"
    )
    spans = winnow_overlap_spans(df).collect()
    assert {(r.doc_a, r.doc_b) for r in spans} == {(0, 1)}
    t = K_GRAM + WINDOW - 1
    na, nb = _norm(a_text), _norm(b_text)
    sa_true = na.index(_norm(shared)) + 1  # 1-based
    sb_true = nb.index(_norm(shared)) + 1
    L = len(_norm(shared))
    # one merged island on the single alignment diagonal
    assert len(spans) == 1
    r = spans[0]
    assert r.start_b - r.start_a == sb_true - sa_true  # correct diagonal
    assert sa_true <= r.start_a <= sa_true + t
    assert sb_true <= r.start_b <= sb_true + t
    end_a = r.start_a + r.span_len - 1
    assert end_a <= sa_true + L - 1
    assert r.span_len >= L - 2 * t  # guarantee-bounded coverage
    assert r.n_anchors >= 2


def test_winnow_span_summary_rollup(spark):
    """The per-doc rollup (q91's gate columns) must report each planted
    pair participant once with the island's span length, and omit
    non-participating docs entirely."""
    from entangledb_spark.operators.fingerprints import (
        K_GRAM,
        winnow_span_summary,
    )

    shared = (
        "the licensing header that both documents carry verbatim and "
        "which is long enough to anchor several winnowed fingerprints "
        "across its full width for reliable span detection"
    )
    a_text = "Unique preamble for document alpha here. " + shared + " Alpha tail."
    b_text = "Completely different beta opener, longer than alpha's. " + shared
    fill = "totally unrelated filler document about fish and bicycles and weather."
    df = spark.createDataFrame(
        [(0, a_text), (1, b_text), (2, fill)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in winnow_span_summary(df).collect()}
    assert set(rows) == {0, 1}
    for d in (0, 1):
        assert rows[d].n_overlap_spans == 1
        # the merged island must cover a good fraction of the shared run
        assert K_GRAM <= rows[d].max_span_len <= len(shared) + K_GRAM
    assert rows[0].max_span_len == rows[1].max_span_len

"""Sliding-window exact substring dedup (packing.duplicate_substring_spans
/ remove_duplicate_substrings) vs a bit-exact pure-Python reference of the
Lee et al. (arXiv:2107.06499) semantics: duplicated windows at ANY offset,
keep-first survivor, maximal-span merge."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.packing import (
    SS_WINDOW_TOKENS,
    dedup_spans,
    duplicate_substring_spans,
    remove_duplicate_substrings,
)
from entangledb_spark.operators.text import TOKEN_RE


def _ref(texts: dict[int, str], w: int, min_count: int = 2):
    """Reference: spans per doc + cleaned text, brute force."""
    toks = {d: re.findall(TOKEN_RE, t) for d, t in texts.items()}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - w + 1):
            occ.setdefault(" ".join(ts[p : p + w]).lower(), []).append((d, p))
    removed: dict[int, list[int]] = {}
    for lst in occ.values():
        if len(lst) >= min_count:
            for d, p in sorted(lst)[1:]:
                removed.setdefault(d, []).append(p)
    spans = {}
    for d, ps in removed.items():
        ps.sort()
        out, start, prev = [], ps[0], ps[0]
        nwin = 1
        for p in ps[1:]:
            if p - prev > w:
                out.append((start, prev + w - 1, nwin))
                start, nwin = p, 0
            prev = p
            nwin += 1
        out.append((start, prev + w - 1, nwin))
        spans[d] = out
    cleaned = {}
    for d, ts in toks.items():
        if not ts:
            continue
        drop = set()
        for s, e, _ in spans.get(d, []):
            drop.update(range(s, e + 1))
        cleaned[d] = " ".join(t for i, t in enumerate(ts) if i not in drop)
    return spans, cleaned


def _df(spark, texts):
    return spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )


PASSAGE = " ".join(f"p{i}" for i in range(40))  # 40 shared tokens
CORPUS = {
    1: "alpha beta " + PASSAGE + " gamma delta",
    2: "one two three four five " + PASSAGE,  # different, non-aligned offset
    3: "zz " + PASSAGE + " yy " + PASSAGE,  # internal repeat too
    4: "totally unique text with no overlap across documents here today",
    5: "Alpha Beta " + PASSAGE.upper(),  # case-normalized duplicate
    6: "short doc",  # below the window size
}


def test_spans_match_reference(spark):
    spans, _ = _ref(CORPUS, 15)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicate_substring_spans(
            _df(spark, CORPUS), window_tokens=15
        ).collect()
    }
    want = {
        (d, s, e, n) for d, lst in spans.items() for (s, e, n) in lst
    }
    assert got == want and len(got) > 0
    # doc 1 holds the global first occurrence: no span covers its passage
    assert not any(d == 1 for d, *_ in got)
    # doc 3's second internal copy and doc 5's case variant are both caught
    assert any(d == 3 for d, *_ in got) and any(d == 5 for d, *_ in got)


def test_alignment_robustness_vs_tumbling(spark):
    """The reason this operator exists: a passage duplicated at offsets
    that differ mod the chunk size is INVISIBLE to tumbling chunk hashes
    (q93/C4 rule) but fully recovered by the sliding windows."""
    docs = _df(spark, {k: CORPUS[k] for k in (1, 2, 4)})
    tumbling = dedup_spans(docs, span_tokens=10)
    assert [r.n_removed for r in tumbling.collect()] == [0, 0, 0]
    spans = duplicate_substring_spans(docs, window_tokens=15).collect()
    assert len(spans) == 1 and spans[0].doc_id == 2
    assert spans[0].span_len == 40  # the full passage, merged to ONE span


def test_cleaned_text_matches_reference(spark):
    _, cleaned = _ref(CORPUS, 15)
    got = {
        r.doc_id: (r.removed_tokens, r.cleaned_text)
        for r in remove_duplicate_substrings(
            _df(spark, CORPUS), window_tokens=15
        ).collect()
    }
    assert set(got) == set(cleaned)
    for d, text in cleaned.items():
        n_removed = len(re.findall(TOKEN_RE, CORPUS[d])) - len(
            re.findall(TOKEN_RE, text)
        )
        assert got[d] == (n_removed, text), d
    # untouched docs keep their full token stream
    assert got[4][0] == 0 and got[6][0] == 0


@pytest.mark.parametrize("w", [5, 25])
def test_window_size_sweep(spark, w):
    spans, _ = _ref(CORPUS, w)
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_substring_spans(
            _df(spark, CORPUS), window_tokens=w
        ).collect()
    }
    assert got == {(d, s, e) for d, lst in spans.items() for (s, e, _) in lst}


def test_hot_span_cap_equivalence(spark):
    """Survivors identical with the straggler guard engaged (the
    _mark_duplicates contract, here through the sliding-window caller):
    a boilerplate window repeated across many docs routes via the
    broadcast hot-stats path without changing a single span."""
    boiler = " ".join(f"b{i}" for i in range(15))
    texts = {d: f"doc {d} says " + boiler for d in range(1, 31)}
    texts[99] = "completely unrelated filler text that matters to nobody"
    docs = _df(spark, texts)
    base = sorted(
        tuple(r)
        for r in duplicate_substring_spans(docs, window_tokens=15).collect()
    )
    capped = sorted(
        tuple(r)
        for r in duplicate_substring_spans(
            docs, window_tokens=15, hot_span_cap=5
        ).collect()
    )
    assert base == capped and len(base) == 29  # all but the first doc


def test_span_invariants(spark, sf_dir):
    """Real-corpus properties at sf0.001: spans in-bounds, non-overlapping
    per doc, gaps between consecutive spans exceed the window (else they
    would have merged), span_len >= window and = n_windows + w - 1."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    w = SS_WINDOW_TOKENS
    spans = duplicate_substring_spans(docs).collect()
    n_toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
            ).alias("n"),
        ).collect()
    }
    per_doc: dict[int, list] = {}
    for r in spans:
        assert 0 <= r.span_start <= r.span_end < n_toks[r.doc_id]
        assert r.span_len == r.span_end - r.span_start + 1 >= w
        # starts chain at gaps <= w, so windows can undercount positions
        # but never exceed them
        assert 1 <= r.n_windows <= r.span_len - w + 1
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for lst in per_doc.values():
        lst.sort()
        for (s1, e1), (s2, e2) in zip(lst, lst[1:]):
            assert s2 - (e1 - w + 1) > w  # start gap > w, else merged


# ------------------------------------------ contamination span localization


def _ref_contamination(texts, bench_texts, w):
    toks = {d: re.findall(TOKEN_RE, t) for d, t in texts.items()}
    bench = set()
    for t in bench_texts:
        bt = re.findall(TOKEN_RE, t)
        for p in range(len(bt) - w + 1):
            bench.add(" ".join(bt[p : p + w]).lower())
    spans = {}
    for d, ts in toks.items():
        ps = [
            p
            for p in range(len(ts) - w + 1)
            if " ".join(ts[p : p + w]).lower() in bench
        ]
        if not ps:
            continue
        out, start, prev, nwin = [], ps[0], ps[0], 1
        for p in ps[1:]:
            if p - prev > w:
                out.append((start, prev + w - 1, nwin))
                start, nwin = p, 0
            prev = p
            nwin += 1
        out.append((start, prev + w - 1, nwin))
        spans[d] = out
    return spans


def test_contamination_spans_match_reference(spark):
    from entangledb_spark.operators.quality import (
        contamination_spans,
        remove_contamination,
    )

    bench_texts = [
        "what is the capital of france paris is the capital",
        PASSAGE,  # the corpus passage is itself a benchmark item
    ]
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], "qid long, text string"
    )
    texts = dict(CORPUS)
    texts[7] = "intro words what is the capital of france paris is the capital outro"
    spans = _ref_contamination(texts, bench_texts, 8)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in contamination_spans(
            _df(spark, texts), bench, window_tokens=8
        ).collect()
    }
    want = {(d, s, e, n) for d, lst in spans.items() for (s, e, n) in lst}
    assert got == want and len(got) > 0
    # unlike corpus dedup there is NO keep-first: every doc holding the
    # benchmark passage is contaminated, including the earliest one
    assert any(d == 1 for d, *_ in got) and any(d == 7 for d, *_ in got)
    # removal matches the reference elision
    cleaned = {
        r.doc_id: r.cleaned_text
        for r in remove_contamination(
            _df(spark, texts), bench, window_tokens=8
        ).collect()
    }
    for d, txt in texts.items():
        ts = re.findall(TOKEN_RE, txt)
        if not ts:
            continue
        drop = set()
        for s, e, _ in spans.get(d, []):
            drop.update(range(s, e + 1))
        assert cleaned[d] == " ".join(
            t for i, t in enumerate(ts) if i not in drop
        ), d


def test_contamination_spans_plan_is_broadcast(spark):
    """The benchmark side must broadcast — the corpus is never shuffled
    before the semi join."""
    from entangledb_spark.operators.quality import contamination_spans

    bench = spark.createDataFrame([(0, PASSAGE)], "qid long, text string")
    plan = contamination_spans(
        _df(spark, CORPUS), bench, window_tokens=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# ------------------------------------------------ single-pass span surgery


def _family_reference(texts, w, bench_pred):
    """Both families from the pure-Python reference: dedup spans over ALL
    docs (keep-first) + contamination spans over non-bench docs against
    the bench slice's windows (no keep-first)."""
    ss, _ = _ref(texts, w)
    bench_texts = [t for d, t in texts.items() if bench_pred(d)]
    corpus = {d: t for d, t in texts.items() if not bench_pred(d)}
    ct = _ref_contamination(corpus, bench_texts, w)
    return ss, ct


def test_span_families_match_single_family_pipelines(spark):
    """span_families (shared windows + _flag_spans islands) returns
    byte-identical spans to the two independent operators."""
    from entangledb_spark.operators.packing import span_families
    from entangledb_spark.operators.quality import contamination_spans

    docs = _df(spark, CORPUS)
    pred = F.col("doc_id") % 2 == 0
    ss, ct = span_families(docs, pred, window_tokens=15)
    want_ss = sorted(
        tuple(r)
        for r in duplicate_substring_spans(docs, window_tokens=15).collect()
    )
    want_ct = sorted(
        tuple(r)
        for r in contamination_spans(
            docs.filter(F.col("doc_id") % 2 != 0),
            docs.filter(F.col("doc_id") % 2 == 0),
            window_tokens=15,
        ).collect()
    )
    assert sorted(tuple(r) for r in ss.collect()) == want_ss
    assert sorted(tuple(r) for r in ct.collect()) == want_ct
    assert len(want_ss) > 0 and len(want_ct) > 0


def test_span_family_stats_matches_references(spark):
    """The linear (branchless) composition returns the same per-doc
    stats and contamination span list as the pure-Python references."""
    from entangledb_spark.operators.packing import span_family_stats

    w = 15
    ss_ref, ct_ref = _family_reference(CORPUS, w, lambda d: d % 2 == 0)
    rows = {
        r.doc_id: r
        for r in span_family_stats(
            _df(spark, CORPUS), F.col("doc_id") % 2 == 0, window_tokens=w
        ).collect()
    }
    assert set(rows) == set(ss_ref) | set(ct_ref)
    for d, r in rows.items():
        ss = ss_ref.get(d, [])
        ct = ct_ref.get(d, [])
        assert r.ss_n_spans == len(ss)
        assert r.ss_removed_tokens == sum(e - s + 1 for s, e, _ in ss)
        assert r.ss_max_span == max((e - s + 1 for s, e, _ in ss), default=0)
        assert r.ct_n_spans == len(ct)
        assert r.ct_removed_tokens == sum(e - s + 1 for s, e, _ in ct)
        assert sorted((sp.span_start, sp.span_end) for sp in r.ct_spans) == [
            (s, e) for s, e, _ in sorted(ct)
        ]


def test_precomputed_windows_param_equivalence(spark):
    """duplicate_substring_spans(windows=...) and
    contamination_spans(corpus_windows=..., bench_hashes=...) accept a
    shared _sliding_windows relation and return identical results."""
    from entangledb_spark.operators.packing import _sliding_windows
    from entangledb_spark.operators.quality import contamination_spans

    docs = _df(spark, CORPUS)
    w = _sliding_windows(docs, 15)
    base = sorted(
        tuple(r)
        for r in duplicate_substring_spans(docs, window_tokens=15).collect()
    )
    via_param = sorted(
        tuple(r)
        for r in duplicate_substring_spans(
            None, window_tokens=15, windows=w
        ).collect()
    )
    assert base == via_param
    corpus = docs.filter(F.col("doc_id") % 2 != 0)
    bench = docs.filter(F.col("doc_id") % 2 == 0)
    cw = _sliding_windows(corpus, 15)
    bh = _sliding_windows(bench, 15).select("h").distinct()
    assert sorted(
        tuple(r)
        for r in contamination_spans(corpus, bench, window_tokens=15).collect()
    ) == sorted(
        tuple(r)
        for r in contamination_spans(
            None, None, window_tokens=15, corpus_windows=cw, bench_hashes=bh
        ).collect()
    )


def test_span_family_stats_hot_cap_equivalence(spark):
    """The straggler guard composes with the bench mark: hot boilerplate
    hashes route through the broadcast hot-stats path carrying their
    bench membership — stats identical to the uncapped run (the
    _mark_duplicates contract, exercised through the bench_pred branch
    the guard gained in round 9)."""
    from entangledb_spark.operators.packing import span_family_stats

    boiler = " ".join(f"b{i}" for i in range(15))
    texts = {d: f"doc number {d} says " + boiler for d in range(1, 31)}
    texts[99] = "completely unrelated filler text that matters to nobody"
    docs = _df(spark, texts)
    pred = F.col("doc_id") % 5 == 0

    def norm(df):
        # collect_list order is nondeterministic: sort ct_spans in-row
        return sorted(
            tuple(r)[:6] + (sorted((s.span_start, s.span_end) for s in r.ct_spans),)
            for r in df.collect()
        )

    base = norm(span_family_stats(docs, pred, window_tokens=15))
    capped = norm(
        span_family_stats(docs, pred, window_tokens=15, hot_span_cap=5)
    )
    assert base == capped and len(base) > 0
    # the boilerplate is both duplicated AND bench-contaminated: some doc
    # must carry spans from each family
    assert any(r[1] > 0 for r in base) and any(r[4] > 0 for r in base)


def test_q93_explodes_corpus_exactly_once_at_stride_1(spark):
    """The round-8 declared cost, engineered away: q93's composed span
    surgery (substring dedup + contamination spans + contamination
    elision) must explode the corpus into stride-1 windows EXACTLY once
    in the final adaptive plan — the span_family_stats linear
    composition. The tumbling family keeps its own (stride-10) explode."""
    import __spark_entry__ as entry

    df = entry.queries()["q93_span_dedup"](spark, "/root/testdata/sf0.001")
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    stride1 = [
        l
        for l in final.splitlines()
        if "Generate posexplode" in l and "- 15)" in l
    ]
    tumbling = [
        l
        for l in final.splitlines()
        if "Generate posexplode" in l and "CEIL" in l
    ]
    assert len(stride1) == 1, final
    assert len(tumbling) == 1, final
    # and the stride-1 windows shuffle on the md5 key exactly once
    h_exchanges = [
        l
        for l in final.splitlines()
        if "Exchange hashpartitioning(h#" in l
    ]
    assert len(h_exchanges) == 2  # one tumbling, one stride-1
    # round 11: the two span families must SHARE one corpus scan+shuffle —
    # the size guards moved inside the window expressions so both branches'
    # scan→repartition subtrees are canonically identical and AQE serves
    # the second from the first's shuffle write. Final plan: exactly one
    # ReusedExchange, and only two live documents scans remain (the shared
    # span scan + the raw-text re-join).
    assert final.count("ReusedExchange") == 1, final
    doc_scans = [
        l
        for l in final.splitlines()
        if "FileScan parquet" in l and "documents.parquet" in l
    ]
    assert len(doc_scans) == 2, final


def test_clean_corpus_union_semantics(spark):
    """clean_corpus = tokens removed by EITHER family removed: equals the
    reference union of dedup-removed and contamination-removed token
    positions, in one corpus pass."""
    from entangledb_spark.operators.packing import clean_corpus

    w = 15
    bench_texts = [PASSAGE]
    ss_ref, _ = _ref(CORPUS, w)
    ct_ref = _ref_contamination(CORPUS, bench_texts, w)
    bench = spark.createDataFrame(
        [(0, t) for t in bench_texts], "qid long, text string"
    )
    got = {
        r.doc_id: (r.removed_tokens, r.cleaned_text)
        for r in clean_corpus(
            _df(spark, CORPUS), bench, window_tokens=w
        ).collect()
    }
    for d, txt in CORPUS.items():
        ts = re.findall(TOKEN_RE, txt)
        if not ts:
            continue
        drop = set()
        for fam in (ss_ref, ct_ref):
            for s, e, _ in fam.get(d, []):
                drop.update(range(s, e + 1))
        want = " ".join(t for i, t in enumerate(ts) if i not in drop)
        assert got[d] == (len(drop & set(range(len(ts)))), want), d
    # doc 1 holds the passage's first occurrence: dedup keeps it but
    # contamination still cuts it — the union must remove it
    assert got[1][0] > 0


def test_clean_corpus_rejects_mismatched_window_sizes(spark):
    from entangledb_spark.operators.packing import clean_corpus

    with pytest.raises(ValueError, match="bench_window_tokens"):
        clean_corpus(
            _df(spark, CORPUS),
            _df(spark, {0: PASSAGE}),
            window_tokens=15,
            bench_window_tokens=8,
        )


def test_positions_to_spans_gap_boundaries(spark):
    """The merge rule is p2 - p1 <= w EXACTLY: a gap of w chains (covered
    ranges touch), a gap of w+1 splits (one token escapes between them) —
    and docs are independent."""
    from entangledb_spark.operators.packing import positions_to_spans

    w = 10
    rows = (
        [(1, 0), (1, 10), (1, 21)]  # 0+10 chain; 21 = 10 + w + 1 splits
        + [(2, 5)]                   # second doc independent
        + [(3, 0), (3, 1), (3, 2)]   # dense run merges to one span
    )
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len, r.n_windows)
        for r in positions_to_spans(
            spark.createDataFrame(rows, "doc_id long, pos int"), w
        ).collect()
    )
    assert got == [
        (1, 0, 19, 20, 2),   # starts 0 and 10 touch: [0..9] + [10..19]
        (1, 21, 30, 10, 1),  # split by the w+1 gap
        (2, 5, 14, 10, 1),
        (3, 0, 11, 12, 3),   # dense run: [0..11]
    ]

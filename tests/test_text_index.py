"""Persistent inverted text index (operators/text_index.py): probe ==
inline BM25 route, partition pruning at the source, append + refresh
parity, parameter-mismatch rejection, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.retrieval import BM25_GATE_TERMS, bm25_topk
from entangledb_spark.operators.text_index import (
    bm25_topk_indexed,
    build_text_index,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("text_index") / "idx")
    build_text_index(_docs(spark), d)
    return d


def test_indexed_matches_inline_topk(spark, index_dir):
    """Same ranking, same tf, same r4 score as the inline corpus-scan
    route (raw floats differ ~1e-16 from aggregation order vs the fixed
    fold — the measured flip margins dwarf it)."""
    k = 15
    inline = bm25_topk(_docs(spark), BM25_GATE_TERMS, k=k).collect()
    probe = bm25_topk_indexed(spark, index_dir, BM25_GATE_TERMS, k=k).collect()
    assert [r.doc_id for r in probe] == [r.doc_id for r in inline]
    for a, b in zip(probe, inline):
        assert a.bm25_tf == b.bm25_tf
        assert abs(a.score - b.score) < 1e-9


def test_probe_reads_only_term_buckets(spark, index_dir):
    """The probe's postings scan must prune to the query terms' bucket
    directories: every file scan in the probe plan carries a NON-EMPTY
    PartitionFilters on the bucket column (the corpus_dedup_stream
    assertion idiom — df.inputFiles() ignores pruning, so the plan is
    the truth here)."""
    probe = bm25_topk_indexed(spark, index_dir, ("hash",), k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scans, plan
    assert all("PartitionFilters: [" in l for l in scans), plan
    assert not any("PartitionFilters: []" in l for l in scans), plan
    assert "bucket" in plan


def test_probe_plan_shape(spark, index_dir):
    probe = bm25_topk_indexed(spark, index_dir, BM25_GATE_TERMS, k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_append_then_refresh_equals_single_build(spark, tmp_path):
    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    d = str(tmp_path / "idx_app")
    build_text_index(half_a, d)
    build_text_index(half_b, d, mode="append")
    got = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=12).collect()
    d2 = str(tmp_path / "idx_full")
    build_text_index(docs, d2)
    want = bm25_topk_indexed(spark, d2, BM25_GATE_TERMS, k=12).collect()
    assert [(r.doc_id, r.bm25_tf) for r in got] == [
        (r.doc_id, r.bm25_tf) for r in want
    ]
    for a, b in zip(got, want):
        assert abs(a.score - b.score) < 1e-12


def test_append_param_mismatch_rejected(spark, index_dir):
    with pytest.raises(ValueError, match="append with"):
        build_text_index(
            _docs(spark).limit(1), index_dir, n_buckets=32, mode="append"
        )


def test_unknown_and_duplicate_terms(spark, index_dir):
    """An out-of-vocabulary term contributes nothing (df=0 idf priced,
    no postings); duplicate probe terms are deduped."""
    base = bm25_topk_indexed(spark, index_dir, ("hash",), k=5).collect()
    with_junk = bm25_topk_indexed(
        spark, index_dir, ("hash", "zzzznotindocs", "hash"), k=5
    ).collect()
    assert [r.doc_id for r in base] == [r.doc_id for r in with_junk]
    for a, b in zip(base, with_junk):
        assert abs(a.score - b.score) < 1e-12


def test_bulk_matches_per_query_probes(spark, index_dir):
    """bm25_topk_bulk == one bm25_topk_indexed per query (same ranking,
    scores within aggregation-order noise)."""
    from entangledb_spark.operators.text_index import bm25_topk_bulk

    qs = [
        (0, "hash join performance"),
        (1, "stream window watermark"),
        (2, "vector"),
    ]
    qdf = spark.createDataFrame(qs, "query_id long, text string")
    bulk = bm25_topk_bulk(spark, index_dir, qdf, k=7).collect()
    by_q: dict[int, list] = {}
    for r in sorted(bulk, key=lambda r: (r.query_id, r.rk)):
        by_q.setdefault(r.query_id, []).append(r)
    for qid, text in qs:
        terms = tuple(text.split())
        want = bm25_topk_indexed(spark, index_dir, terms, k=7).collect()
        got = by_q.get(qid, [])
        assert [r.doc_id for r in got] == [r.doc_id for r in want], qid
        for a, b in zip(got, want):
            assert a.bm25_tf == b.bm25_tf
            assert abs(a.score - b.score) < 1e-9


def test_bulk_plan_prunes_and_broadcasts(spark, index_dir):
    """The bulk join must keep the postings scan partition-pruned (static
    bucket filter from the bounded bucket collect) and broadcast the tiny
    query-token and lexicon sides — never shuffle postings by token."""
    from entangledb_spark.operators.text_index import bm25_topk_bulk

    qdf = spark.createDataFrame(
        [(0, "hash join"), (1, "stream")], "query_id long, text string"
    )
    plan = (
        bm25_topk_bulk(spark, index_dir, qdf, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    post_scans = [
        l for l in plan.splitlines() if "PartitionFilters" in l and "postings" in l
    ]
    assert post_scans and not any("PartitionFilters: []" in l for l in post_scans), plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_retrieval_contamination_summary(spark, index_dir):
    """A document ranked top-k by several benchmark items aggregates into
    one suspect row with the hit count and its best rank."""
    from entangledb_spark.operators.text_index import (
        bm25_topk_bulk,
        retrieval_contamination,
    )

    bench = spark.createDataFrame(
        [(0, "hash join"), (1, "hash table"), (2, "stream window")],
        "query_id long, text string",
    )
    hits = bm25_topk_bulk(spark, index_dir, bench, k=5).collect()
    want: dict[int, list] = {}
    for r in hits:
        want.setdefault(r.doc_id, []).append(r)
    got = {r.doc_id: r for r in retrieval_contamination(spark, index_dir, bench, k=5).collect()}
    assert set(got) == set(want)
    for d, rows in want.items():
        assert got[d].n_bench_hits == len(rows)
        assert got[d].best_rank == min(r.rk for r in rows)
        assert abs(got[d].max_score - max(r.score for r in rows)) < 1e-12


def test_append_replay_is_idempotent(spark, tmp_path):
    """Re-running an append with the same batch name must REPLACE its own
    partitions, not duplicate them — the property that makes the
    streaming writer exactly-once under foreachBatch replay."""
    import os

    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    d = str(tmp_path / "idx_replay")
    build_text_index(half_a, d)
    build_text_index(half_b, d, mode="append", batch="b1")
    once = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10).collect()
    n_rows_once = spark.read.parquet(os.path.join(d, "postings")).count()
    build_text_index(half_b, d, mode="append", batch="b1")  # replay
    again = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10).collect()
    n_rows_again = spark.read.parquet(os.path.join(d, "postings")).count()
    assert n_rows_again == n_rows_once
    assert [(r.doc_id, r.bm25_tf) for r in again] == [
        (r.doc_id, r.bm25_tf) for r in once
    ]
    for a, b in zip(again, once):
        assert abs(a.score - b.score) < 1e-12


def test_stream_index_writer_end_to_end(spark, tmp_path):
    """Stream half the corpus into an index built on the other half; the
    probes must equal a single-shot build over the whole corpus, and a
    restart on the same checkpoint must replay nothing."""
    import os

    from entangledb_spark.operators.text_index import stream_index_writer

    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    src = str(tmp_path / "src")
    half_b.repartition(3).write.parquet(src)
    d = str(tmp_path / "idx_stream")
    ckpt = str(tmp_path / "ckpt")
    build_text_index(half_a, d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    w = stream_index_writer(d, stream, "s1", ckpt)
    w.trigger(availableNow=True).start().awaitTermination()
    got = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=12).collect()
    d2 = str(tmp_path / "idx_full")
    build_text_index(docs, d2)
    want = bm25_topk_indexed(spark, d2, BM25_GATE_TERMS, k=12).collect()
    assert [(r.doc_id, r.bm25_tf) for r in got] == [
        (r.doc_id, r.bm25_tf) for r in want
    ]
    for a, b in zip(got, want):
        assert abs(a.score - b.score) < 1e-12
    # restart on the same checkpoint: no new batches, index unchanged
    n_rows = spark.read.parquet(os.path.join(d, "postings")).count()
    w2 = stream_index_writer(d, stream, "s1", ckpt)
    w2.trigger(availableNow=True).start().awaitTermination()
    assert spark.read.parquet(os.path.join(d, "postings")).count() == n_rows


def test_compaction_preserves_probes(spark, tmp_path):
    """After folding stream batches into one base batch, probe results
    are identical and the ledger collapses to a single entry. The commit
    is the atomic meta-pointer swap: the active postings dir moves to
    ``postings_v1``, the old dir is reclaimed, and the folded batch
    names are ledgered so their replays are skipped."""
    import os

    from entangledb_spark.operators.text_index import (
        _posts_path,
        _read_meta,
        compact_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "idx_compact")
    build_text_index(docs.filter(F.col("doc_id") % 3 == 0), d)
    build_text_index(docs.filter(F.col("doc_id") % 3 == 1), d, mode="append", batch="s1-0")
    build_text_index(docs.filter(F.col("doc_id") % 3 == 2), d, mode="append", batch="s1-1")
    before = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=12).collect()
    n_files_before = len(
        spark.read.parquet(_posts_path(d, _read_meta(d))).inputFiles()
    )
    compact_index(spark, d)
    after = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=12).collect()
    assert [(r.doc_id, r.bm25_tf) for r in after] == [
        (r.doc_id, r.bm25_tf) for r in before
    ]
    for a, b in zip(after, before):
        assert abs(a.score - b.score) < 1e-12
    meta = _read_meta(d)
    assert meta["batches"] == {"base": docs.count()}
    assert meta["postings_dir"] == "postings_v1"
    assert not os.path.exists(os.path.join(d, "postings"))  # old dir reclaimed
    assert meta["folded"] == ["s1-0", "s1-1"]
    n_files_after = len(
        spark.read.parquet(_posts_path(d, meta)).inputFiles()
    )
    assert n_files_after <= n_files_before


def test_folded_batch_replay_skipped_after_compaction(spark, tmp_path):
    """foreachBatch may replay a micro-batch whose data compact_index
    already folded into base — the folded ledger must make that replay a
    no-op (without it, the replay would re-append every posting of that
    batch: duplicate scores, double-counted n_docs)."""
    from entangledb_spark.operators.text_index import (
        _posts_path,
        _read_meta,
        compact_index,
    )

    docs = _docs(spark)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    d = str(tmp_path / "idx_fold_replay")
    build_text_index(half_a, d)
    build_text_index(half_b, d, mode="append", batch="s1-7")
    compact_index(spark, d)
    meta = _read_meta(d)
    n_rows = spark.read.parquet(_posts_path(d, meta)).count()
    n_docs = sum(meta["batches"].values())
    probes = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10).collect()
    # the crash-replay: the checkpoint re-delivers batch 7 after compaction
    build_text_index(half_b, d, mode="append", batch="s1-7")
    meta2 = _read_meta(d)
    assert spark.read.parquet(_posts_path(d, meta2)).count() == n_rows
    assert sum(meta2["batches"].values()) == n_docs
    again = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10).collect()
    assert [(r.doc_id, r.bm25_tf) for r in again] == [
        (r.doc_id, r.bm25_tf) for r in probes
    ]


def test_append_existing_batch_full_replacement(spark, tmp_path):
    """Re-aiming an append at an existing batch name with DIFFERENT data
    must fully replace the old batch — including postings in buckets the
    new data never touches (dynamic partition overwrite alone leaves
    those stale)."""
    from entangledb_spark.operators.text_index import refresh_stats

    docs = _docs(spark)
    base = docs.filter(F.col("doc_id") % 3 == 0)
    big = docs.filter(F.col("doc_id") % 3 > 0)
    small = big.filter(F.col("doc_id") % 17 == 1)  # touches far fewer buckets
    d = str(tmp_path / "idx_replace")
    build_text_index(base, d)
    build_text_index(big, d, mode="append", batch="b1")
    build_text_index(small, d, mode="append", batch="b1")  # corrected data
    refresh_stats(spark, d)
    got = bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=12).collect()
    d2 = str(tmp_path / "idx_replace_want")
    build_text_index(base.unionByName(small), d2)
    want = bm25_topk_indexed(spark, d2, BM25_GATE_TERMS, k=12).collect()
    assert [(r.doc_id, r.bm25_tf) for r in got] == [
        (r.doc_id, r.bm25_tf) for r in want
    ]
    for a, b in zip(got, want):
        assert abs(a.score - b.score) < 1e-12


def test_append_to_base_rejected(spark, index_dir):
    with pytest.raises(ValueError, match="base"):
        build_text_index(_docs(spark), index_dir, mode="append", batch="base")


def test_probe_terms_normalized(spark, index_dir):
    """Corpus tokens are lower()'d at build time; a mixed-case probe term
    must score like its lowercase form on BOTH probe routes (on the
    index it would otherwise also read the WRONG bucket directory), and
    a term that can't tokenize raises instead of silently zeroing."""
    lo = bm25_topk_indexed(spark, index_dir, ("hash", "join"), k=8).collect()
    hi = bm25_topk_indexed(spark, index_dir, ("Hash", "JOIN"), k=8).collect()
    assert [(r.doc_id, r.bm25_tf) for r in hi] == [(r.doc_id, r.bm25_tf) for r in lo]
    inline_lo = bm25_topk(_docs(spark), ("hash",), k=8).collect()
    inline_hi = bm25_topk(_docs(spark), ("Hash",), k=8).collect()
    assert [(r.doc_id, r.score) for r in inline_hi] == [
        (r.doc_id, r.score) for r in inline_lo
    ]
    with pytest.raises(ValueError, match="bm25_topk_bulk"):
        bm25_topk_indexed(spark, index_dir, ("two words",), k=3)


def test_build_postings_single_data_shuffle(spark):
    """dl derives narrowly before the explode, so the postings relation
    needs exactly ONE data shuffle (the tf aggregation) plus the write's
    bucket routing — no Window re-exchange on doc_id."""
    import os

    from entangledb_spark.operators.text_index import N_TOKEN_BUCKETS

    docs = _docs(spark)
    toks = docs.select(
        F.col("doc_id"),
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0).alias(
            "_toks"
        ),
    ).select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        F.explode("_toks").alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    plan = tf._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_rebuild_honors_error_and_ignore_modes(spark, tmp_path):
    """Spark save-mode intent over a LIVE index: mode='error' must raise
    (not silently replace the committed index — the staged rebuild never
    touches the active dir, so without the explicit check 'error' lost
    its meaning), and mode='ignore' must leave the index untouched."""
    import os

    from entangledb_spark.operators.text_index import _read_meta

    docs = _docs(spark)
    d = str(tmp_path / "idx_modes")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), d)
    meta0 = _read_meta(d)
    before = sorted(
        (r.doc_id, round(r.score, 6))
        for r in bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10).collect()
    )
    for mode in ("error", "errorifexists"):
        with pytest.raises(ValueError, match="already committed"):
            build_text_index(docs, d, mode=mode)
    build_text_index(docs, d, mode="ignore")  # no-op, no raise
    assert _read_meta(d) == meta0
    assert before == sorted(
        (r.doc_id, round(r.score, 6))
        for r in bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10).collect()
    )
    # fresh-dir semantics unchanged: 'error' on an EMPTY target builds
    d2 = str(tmp_path / "idx_fresh")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), d2, mode="error")
    assert os.path.exists(os.path.join(d2, "postings"))


def test_rebuild_over_live_index_is_staged_and_committed(spark, tmp_path):
    """A rebuild over a LIVE index must never write into the committed
    postings directory: it stages a fresh versioned dir, flips the meta
    pointer atomically, and reclaims the old dir only after the commit —
    for both the never-compacted (plain 'postings') and the compacted
    (versioned) starting layouts."""
    import os

    from entangledb_spark.operators.text_index import (
        _posts_path,
        _read_meta,
        compact_index,
    )

    docs = _docs(spark)
    d = str(tmp_path / "idx_rebuild")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), d)
    assert _read_meta(d).get("postings_dir", "postings") == "postings"
    old_dir = _posts_path(d, _read_meta(d))

    # rebuild over the live, never-compacted index
    build_text_index(docs, d)
    meta = _read_meta(d)
    assert meta["postings_dir"] == "postings_v1"
    assert not os.path.exists(old_dir)  # reclaimed AFTER the commit
    def _r4(df):
        # the probe==inline contract is at the r4 grain (fold-order ULPs)
        return sorted(
            (r.doc_id, round(r.score, 4))
            for r in df.select("doc_id", "score").collect()
        )

    want = _r4(bm25_topk(docs, BM25_GATE_TERMS, k=10))
    got = _r4(bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10))
    assert got == want

    # and over a compacted one: version keeps climbing, old dir reclaimed
    build_text_index(docs.filter(F.col("doc_id") % 3 == 1), d, mode="append", batch="b1")
    compact_index(spark, d)
    v_dir = _posts_path(d, _read_meta(d))
    build_text_index(docs, d)
    meta2 = _read_meta(d)
    assert meta2["postings_dir"].startswith("postings_v")
    assert meta2["postings_dir"] != meta["postings_dir"]
    assert not os.path.exists(v_dir)
    got2 = _r4(bm25_topk_indexed(spark, d, BM25_GATE_TERMS, k=10))
    assert got2 == want

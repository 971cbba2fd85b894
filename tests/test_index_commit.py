"""Adversarial cross-kind tests of the SHARED index commit protocol
(operators/index_commit.py): the per-kind suites exercise each index's
lifecycle separately; these interleave appends / compactions / rebuilds
on TWO index kinds living in one directory tree, and crash the commit in
the exact window the protocol exists to protect — after the staged data
write, before the atomic meta swap (the round-8 ADVICE bug class:
reclaim-before-commit / torn-pointer states must be impossible)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators import index_commit
from entangledb_spark.operators.ann_index import (
    build_ivfpq_index,
    compact_ivfpq_index,
    probe_ivfpq_index,
)
from entangledb_spark.operators.text_index import (
    bm25_topk_indexed,
    build_text_index,
    compact_index,
    refresh_stats,
)

SF = "/root/testdata/sf0.001"
TERMS = ("data", "model", "training")


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    )


def _bm25(spark, d, k=10):
    return sorted(
        (r.doc_id, round(r.score, 6))
        for r in bm25_topk_indexed(spark, d, TERMS, k=k).collect()
    )


def _probe(spark, d, probes, k=3):
    return sorted(
        (r.query_id, r.neighbor_id, round(r.adc_dist, 4), r.rk)
        for r in probe_ivfpq_index(
            spark, d, probes, k=k, exclude_self=False, route="literal"
        ).collect()
    )


def _meta(d):
    with open(os.path.join(d, index_commit.META_FILE)) as f:
        return json.load(f)


def test_interleaved_lifecycles_two_kinds_one_tree(spark, tmp_path):
    """Text and IVF-PQ indexes side by side, driven through interleaved
    appends, compactions, folded-batch replays, and a full text rebuild
    — the ledgers never double-count, replays of folded batches are
    no-ops for BOTH kinds, and results are stable across every
    maintenance operation."""
    tdir = str(tmp_path / "tree" / "text_idx")
    vdir = str(tmp_path / "tree" / "vec_idx")
    docs, emb = _docs(spark), _emb(spark)
    d0 = docs.filter(F.col("doc_id") % 3 == 0)
    d1 = docs.filter(F.col("doc_id") % 3 == 1)
    d2 = docs.filter(F.col("doc_id") % 3 == 2)
    e0 = emb.filter(F.col("vec_id") < 50)
    e1 = emb.filter(F.col("vec_id") >= 50)
    probes = emb.filter(F.col("vec_id").isin(3, 77))

    build_text_index(d0, tdir)
    build_ivfpq_index(e0, vdir, n_cells=4, m=4, ksub=8)
    # interleave appends across the two kinds
    build_text_index(d1, tdir, mode="append", batch="t-b1")
    build_ivfpq_index(e1, vdir, mode="append", batch="v-b1", n_cells=4, m=4, ksub=8)
    text_snapshot = _bm25(spark, tdir)
    vec_snapshot = _probe(spark, vdir, probes)
    assert sum(_meta(vdir)["batches"].values()) == 500

    # compact text; its folded t-b1 must skip on replay while the OTHER
    # kind's same-era batch is untouched
    compact_index(spark, tdir)
    build_text_index(d1, tdir, mode="append", batch="t-b1")  # folded replay
    refresh_stats(spark, tdir)
    assert _bm25(spark, tdir) == text_snapshot
    assert _meta(tdir)["folded"] == ["t-b1"]
    assert _meta(vdir)["folded"] == []

    # third text batch on the compacted layout; then compact the vector
    # index and replay ITS folded batch
    build_text_index(d2, tdir, mode="append", batch="t-b2")
    full_text = _bm25(spark, tdir)
    compact_ivfpq_index(spark, vdir)
    build_ivfpq_index(e1, vdir, mode="append", batch="v-b1", n_cells=4, m=4, ksub=8)
    assert _probe(spark, vdir, probes) == vec_snapshot
    assert sum(_meta(vdir)["batches"].values()) == 500
    assert _meta(vdir)["folded"] == ["v-b1"]

    # full-corpus text results must equal a fresh single-shot build
    ref = str(tmp_path / "ref_text")
    build_text_index(docs, ref)
    assert full_text == _bm25(spark, ref)

    # rebuild text over the live index (versioned staging + pointer flip)
    build_text_index(docs, tdir, mode="overwrite")
    assert _bm25(spark, tdir) == full_text
    m = _meta(tdir)
    assert m["batches"] == {"base": 500} and m["version"] >= 2
    # exactly one live postings layout on disk (stale dirs reclaimed)
    layouts = [
        n for n in os.listdir(tdir) if n == "postings" or n.startswith("postings_v")
    ]
    assert layouts == [m["postings_dir"]]
    # the neighbor kind never noticed any of it
    assert _probe(spark, vdir, probes) == vec_snapshot


@pytest.mark.parametrize("kind", ["text", "ivfpq"])
def test_crash_between_staged_write_and_meta_swap(spark, tmp_path, monkeypatch, kind):
    """Kill the commit in the protected window — staged compaction data
    fully written, atomic meta swap about to happen — for BOTH kinds
    through the ONE shared write_meta. Before the swap the old layout
    must keep serving identical results; the retry must commit cleanly
    and reclaim every stale directory."""
    d = str(tmp_path / kind)
    if kind == "text":
        build_text_index(_docs(spark).filter(F.col("doc_id") % 2 == 0), d)
        build_text_index(
            _docs(spark).filter(F.col("doc_id") % 2 == 1),
            d, mode="append", batch="b1",
        )
        snapshot = lambda: _bm25(spark, d)  # noqa: E731
        compact = lambda: compact_index(spark, d)  # noqa: E731
        base_name, dir_key = "postings", "postings_dir"
    else:
        emb = _emb(spark)
        build_ivfpq_index(emb.filter(F.col("vec_id") < 50), d, n_cells=4, m=4, ksub=8)
        build_ivfpq_index(
            emb.filter(F.col("vec_id") >= 50),
            d, mode="append", batch="b1", n_cells=4, m=4, ksub=8,
        )
        probes = emb.filter(F.col("vec_id").isin(3, 77))
        snapshot = lambda: _probe(spark, d, probes)  # noqa: E731
        compact = lambda: compact_ivfpq_index(spark, d)  # noqa: E731
        base_name, dir_key = "codes", "codes_dir"

    before = snapshot()
    meta_before = _meta(d)
    real_write = index_commit.write_meta

    def crashing_write(index_dir, meta):
        raise RuntimeError("injected crash: power loss before the meta swap")

    monkeypatch.setattr(index_commit, "write_meta", crashing_write)
    with pytest.raises(RuntimeError, match="injected crash"):
        compact()
    monkeypatch.setattr(index_commit, "write_meta", real_write)

    # the crash left the staged dir orphaned but the COMMITTED state
    # untouched: same meta, same results through the old pointer
    assert _meta(d) == meta_before
    assert snapshot() == before
    staged = [n for n in os.listdir(d) if n.startswith(f"{base_name}_v")]
    assert staged, "crashed attempt should have staged a versioned dir"

    # retry: same version target — staging_dir clears the orphan, the
    # commit lands, the old layout is reclaimed, results unchanged
    compact()
    m = _meta(d)
    assert m["batches"]["base"] == 500
    assert "b1" in m["folded"]
    assert snapshot() == before
    layouts = [
        n for n in os.listdir(d) if n == base_name or n.startswith(f"{base_name}_v")
    ]
    assert layouts == [m[dir_key]]

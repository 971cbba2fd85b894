"""End-to-end training-data pipeline over the documents fixture — the
operators composed the way a real corpus-preparation job chains them
(the composition order documented in docs/DEDUP.md):

  PII redaction → C4 line cleaning → text metrics → quality gates
  (length/repetition/LM-perplexity) → trained-classifier audit score
  (NB over hashed token features) → exact dedup → containment
  survivors (winnowing) → span dedup → semantic dedup (embedding
  near-dup survivors) → retrieval-based decontamination (BM25 index
  over the survivors, benchmark top-1 hits dropped) → diversity quota
  (cluster-balanced sampling over k-means cells) → sequence packing →
  vocabulary induction

Each stage consumes the previous stage's DataFrame (single lazy plan per
stage boundary, no driver round-trips besides the assertions), and the
invariants checked here are the ones a pipeline owner would monitor:
monotone row counts, survivor quality, packing budget compliance.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from entangledb_spark.operators.dedup import exact_dedup
from entangledb_spark.operators.packing import (
    SEQ_BUDGET,
    dedup_spans,
    pack_contiguous,
    vocabulary,
)
from entangledb_spark.operators.quality import ngram_lm_score, repetition_metrics
from entangledb_spark.registry import QUERIES, load_all, table

SF = "/root/testdata/sf0.001"


def test_pipeline_end_to_end(spark, tmp_path):
    from entangledb_spark.operators.quality import clean_lines_c4

    from entangledb_spark.operators.pii import redact_documents

    load_all()
    raw = redact_documents(table(spark, SF, "documents"))
    n_raw = raw.count()

    # 0. C4 line-level cleaning (no terminal requirement: the fixture is
    # single-line prose without punctuation guarantees)
    docs = (
        clean_lines_c4(raw, require_terminal=False)
        .select("doc_id", F.col("clean_text").alias("text"))
        .join(raw.select("doc_id", "lang"), "doc_id")
    )
    n0 = docs.count()
    assert 0 < n0 <= n_raw

    # 1. quality gates: length + repetition + LM perplexity
    rep = repetition_metrics(docs).select("doc_id", "repetition_flagged")
    lm = ngram_lm_score(docs).select("doc_id", "ppl")
    ppl_cut = lm.approxQuantile("ppl", [0.95], 0.01)[0]  # drop worst 5%
    gated = (
        docs.join(rep, "doc_id")
        .join(lm, "doc_id", "left")
        .filter(
            (F.length("text") >= 50)
            & ~F.col("repetition_flagged")
            & (F.coalesce(F.col("ppl"), F.lit(0.0)) <= ppl_cut)
        )
        .select("doc_id", "text", "lang")
    )
    n1 = gated.count()
    assert 0 < n1 <= n0

    # 1b. trained quality classifier: NB over hashed token features,
    # trained on a weak label derivable from the corpus itself (here:
    # the labeled lang column), scored zero-shuffle on the survivors.
    # The pipeline keeps the score as an audit column rather than
    # filtering on it — this fixture's label signal is measured too
    # weak to cut on (test_classifier documents that), which is itself
    # the realistic calibration step: score first, pick cuts later.
    from entangledb_spark.operators.classifier import (
        nb_quality_score,
        train_nb_quality,
    )

    nb_model = train_nb_quality(docs, F.col("lang") == "en")
    audited = nb_quality_score(gated, nb_model)
    assert audited.filter(F.col("nb_score").isNull()).count() == 0
    assert audited.count() == n1  # scoring is a projection, never a filter

    # 2. exact dedup on normalized-content fingerprint
    deduped = exact_dedup(gated)
    n2 = deduped.count()
    assert 0 < n2 <= n1

    # 2b. containment survivors: drop docs mostly contained in another
    from entangledb_spark.operators.fingerprints import winnow_containment_survivors

    contained_free = winnow_containment_survivors(deduped)
    n2b = contained_free.count()
    assert 0 < n2b <= n2

    # 3. corpus-level span dedup (keep-first) rewrites the text
    cleaned = dedup_spans(contained_free).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    n3 = cleaned.count()
    assert n3 == contained_free.filter(F.length("text") > 0).count()

    # 3b. semantic dedup: embedding near-dup survivors (vec_id ≡ doc_id
    # in the fixture), applied as a semi-join on the surviving ids
    from entangledb_spark.operators.similarity import embedding_near_dup_survivors

    emb = table(spark, SF, "embeddings").select("vec_id", "embedding")
    sem_keep = embedding_near_dup_survivors(emb, threshold=0.95).select(
        F.col("vec_id").alias("doc_id")
    )
    cleaned = cleaned.join(sem_keep, "doc_id", "left_semi")
    n3b = cleaned.count()
    assert 0 < n3b <= n3

    # 3c. retrieval-based decontamination: BM25-index the survivors,
    # drop any document a benchmark item ranks FIRST (top-1 = the
    # strongest paraphrase-overlap suspects; exact 8-gram contamination
    # is the separate quality.contamination gate)
    from entangledb_spark.operators.text_index import (
        build_text_index,
        retrieval_contamination,
    )

    idx = str(tmp_path / "pipeline_idx")
    build_text_index(cleaned, idx)
    bench = spark.createDataFrame(
        [(0, "hash join window sort"), (1, "stream batch merge")],
        "query_id long, text string",
    )
    suspects = retrieval_contamination(spark, idx, bench, k=3)
    drop = suspects.filter(F.col("best_rank") == 1).select("doc_id")
    cleaned = cleaned.join(drop, "doc_id", "left_anti")
    n3c = cleaned.count()
    assert 0 < n3c < n3b  # each benchmark item drops its top hit

    # 3d. diversity quota: at most Q survivors per k-means cell
    # (cluster-balanced sampling flattens dense embedding modes)
    from entangledb_spark.operators.selection import cluster_balanced_sample
    from entangledb_spark.operators.similarity import ivf_centroids

    emb_surv = emb.selectExpr(
        "vec_id", "CAST(embedding AS array<double>) AS embedding"
    ).join(cleaned.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi")
    cents = ivf_centroids(emb_surv, 8, refine=1)
    quota = 40
    sampled = cluster_balanced_sample(emb_surv, cents, quota)
    per_cell = sampled.groupBy("cell").count().collect()
    assert all(r["count"] <= quota for r in per_cell)
    cleaned = cleaned.join(
        sampled.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n3d = cleaned.count()
    assert 0 < n3d <= n3c

    # 4. pack into fixed token budgets
    packed = pack_contiguous(cleaned)
    rows = packed.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.offset_in_seq < SEQ_BUDGET
    # every surviving non-empty document is packed exactly once
    assert len({(r.shard, r.doc_id) for r in rows}) == len(rows)

    # 5. vocabulary over the final corpus: coverage is a CDF
    vocab = vocabulary(cleaned, top_k=100).collect()
    assert len(vocab) > 0
    cov = [v.coverage for v in sorted(vocab, key=lambda v: v.rank)]
    assert all(0 < a <= b <= 1.0 + 1e-12 for a, b in zip(cov, cov[1:]))

    # the pipeline actually filtered something (fixture contains dups/noise)
    assert n2 < n0

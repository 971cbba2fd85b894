"""Quantitative quality gate for the rows-only dedup queries: the
MinHash+LSH banded candidates (q62) must achieve high recall against the
exact SHINGLE-set Jaccard ground truth (unsampled, full self-join) at
fixture scale — this is the correctness argument for the seeded-hash
pipeline the DuckDB oracle can't express.

Ground truth uses word-shingle sets (SHINGLE_N, same unit the MinHash
signature hashes): that is the quantity MinHash estimates and LSH banding
must recover. Token-set Jaccard would be the wrong yardstick here — on a
synthetic corpus drawn from a small vocabulary, almost every document
pair shares most distinct WORDS (≈91k of 125k pairs exceed 0.5) while
only genuinely near-duplicate pairs share word SEQUENCES (28 pairs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entangledb_spark.operators.dedup import SHINGLE_N, word_tokens
from entangledb_spark.registry import QUERIES, load_all, table

load_all()

SF = "/root/testdata/sf0.001"
JACCARD_THRESHOLD = 0.5
MIN_RECALL = 0.9


def exact_shingle_jaccard_pairs(spark, sf_dir: str) -> set[tuple[int, int]]:
    """All (a, b) doc pairs with shingle-set Jaccard >= threshold — full
    self-join, no sampling, no banding: the ground truth."""
    d = table(spark, sf_dir, "documents")
    toks = word_tokens(F.col("text"))
    shingles = (
        d.withColumn("_t", toks)
        .withColumn(
            "sh",
            F.when(
                F.size("_t") >= SHINGLE_N,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size("_t") - SHINGLE_N),
                        lambda i: F.concat_ws(" ", F.slice("_t", i + 1, SHINGLE_N)),
                    )
                ),
            ).otherwise(F.array(F.concat_ws(" ", "_t"))),
        )
        .select("doc_id", F.explode("sh").alias("w"))
    )
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = shingles.alias("a"), shingles.alias("b")
    pairs = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("shared"))
    out = (
        pairs.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("da"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("db"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("da", "db")
        .collect()
    )
    return {(r.da, r.db) for r in out}


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    truth = exact_shingle_jaccard_pairs(spark, SF)
    assert truth, "fixture should contain planted near-duplicates"
    cands = {
        (r.doc_a, r.doc_b) for r in QUERIES["q62_dedup_minhash_lsh"](spark, SF).collect()
    }
    recall = len(truth & cands) / len(truth)
    assert recall >= MIN_RECALL, (
        f"LSH banding recall {recall:.2f} < {MIN_RECALL} ({len(truth)} true pairs)"
    )


def _bands(h: int) -> tuple[int, int, int, int]:
    return ((h >> 48) & 0xFFFF, (h >> 32) & 0xFFFF, (h >> 16) & 0xFFFF, h & 0xFFFF)


def test_simhash_near_pairs_banded(spark):
    """simhash_near_pairs: pigeonhole-banded candidate generation finds
    exactly the fingerprint pairs within hamming <= 3 — built from known
    synthetic fingerprints so the expected pair set is provable by hand."""
    import pytest

    from entangledb_spark.operators.dedup import simhash_near_pairs

    base = 0x0123456789ABCDEF
    fps = {
        1: base,
        2: base ^ 0b101,            # 2 flips, both in band_d -> hamming 2
        3: base ^ ((1 << 63) | (1 << 40) | (1 << 20) | 1),  # 4 flips, one per band
        4: 0x7EDCBA9876543210,      # far away
        5: base ^ (1 << 17),        # 1 flip in band_c -> hamming 1 (pairs w/ 1 AND 2)
    }
    rows = [(d, _to_i64(h), *(_to_i64(b) for b in _bands(h))) for d, h in fps.items()]
    sim = spark.createDataFrame(
        rows, "doc_id long, simhash long, band_a long, band_b long, band_c long, band_d long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sim).collect()
    }
    assert got == {(1, 2): 2, (1, 5): 1, (2, 5): 3}, got
    # doc 3 (hamming 4 from doc 1) excluded even though it shares no full
    # band; doc 4 shares nothing. The pigeonhole bound is enforced:
    with pytest.raises(ValueError, match="hamming <= 3"):
        simhash_near_pairs(sim, max_hamming=4)


def _to_i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def test_simhash_near_pairs_on_fixture(spark):
    """End-to-end over q63's output on the fixture corpus: structural
    invariants (ordering, distance bound, exact duplicates at hamming 0
    — the fixture contains exact-copy documents)."""
    from entangledb_spark.operators.dedup import simhash_near_pairs

    load_all()
    sim = QUERIES["q63_dedup_simhash"](spark, SF)
    pairs = simhash_near_pairs(sim, max_hamming=3).collect()
    assert all(r["doc_a"] < r["doc_b"] and 0 <= r["hamming"] <= 3 for r in pairs)
    assert any(r["hamming"] == 0 for r in pairs)  # exact copies exist in fixture


def test_near_dup_survivors_end_to_end(spark):
    """near_dup_survivors removes exactly the non-keeper cluster members
    that q67 reports, keeps everything else, and preserves the documents
    schema — the full curation-pipeline composition verified against its
    own cluster report."""
    from entangledb_spark.operators.dedup import near_dup_survivors

    load_all()
    docs = table(spark, SF, "documents")
    clusters = QUERIES["q67_dedup_clusters"](spark, SF).collect()
    surv = near_dup_survivors(spark, SF)
    assert surv.columns == docs.columns
    surv_ids = {r["doc_id"] for r in surv.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    # clusters here are all est_jaccard>=0.5 pairs? q67 uses ALL candidate
    # pairs; survivors filters to est>=0.5 — so expected removals are the
    # >=0.5-edge clusters. Recompute expected loser set independently:
    from entangledb_spark.operators.dedup import (
        connected_components,
        q62_dedup_minhash_lsh,
    )
    from pyspark.sql import functions as F2

    pairs = (
        q62_dedup_minhash_lsh(spark, SF)
        .filter(F2.col("est_jaccard") >= 0.5)
        .select(F2.col("doc_a").alias("a"), F2.col("doc_b").alias("b"))
    )
    vertices = (
        pairs.select(F2.col("a").alias("id"))
        .union(pairs.select(F2.col("b").alias("id")))
        .distinct()
    )
    comp = {r["id"]: r["component"] for r in connected_components(vertices, pairs).collect()}
    expected_losers = {i for i, c in comp.items() if i != min(j for j in comp if comp[j] == c)}
    assert surv_ids == all_ids - expected_losers
    assert len(expected_losers) > 0  # the fixture really has near-dups
    _ = clusters  # q67 exercised alongside (rows-only sanity)


def test_minhash_md5_twin_matches_python_reference(spark):
    """The q66 gate's md5-base signature (minhash_signature base='md5')
    recomputed exactly in pure Python — hashlib md5 over the space-joined
    shingle strings, the same (a·x+b) mod P permutation minima — so the
    DuckDB oracle, the Spark expression, and an independent
    implementation all agree on the bits."""
    import hashlib

    from entangledb_spark.operators._minhash_params import (
        MINHASH_AB,
        MINHASH_P,
        SHINGLE_N as SN,
    )
    from entangledb_spark.operators.dedup import minhash_signature

    texts = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "completely unrelated words here 42 numbers too"),
        (3, "tiny"),
        (4, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: list(r.minhash)
        for r in minhash_signature(df, base="md5").select("doc_id", "minhash").collect()
    }

    def md5_30(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % (1 << 30)

    import re

    for did, text in texts:
        toks = re.findall(r"[a-z0-9]+", text.lower())
        if len(toks) >= SN:
            base = [md5_30(" ".join(toks[i : i + SN])) for i in range(len(toks) - SN + 1)]
        else:
            base = [md5_30(" ".join(toks))]
        want = [min((a * h + b) % MINHASH_P for h in base) for a, b in MINHASH_AB]
        assert got[did] == want, did


def test_minhash_md5_twin_same_near_dup_behavior(spark):
    """Behavioral equivalence of the gate twin: on a planted corpus of
    clear near-dup clusters + singletons, the md5-base banded join finds
    partners for exactly the clustered docs — the same detection the
    production xxhash64 base makes (different hash universe, same
    decisions on non-borderline inputs)."""
    from entangledb_spark.operators.dedup import minhash_gate_summary

    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    base_b = "one two three four five six seven eight nine ten " * 4
    rows = [
        (0, base_a),
        (1, base_a + "lambda"),          # near-dup of 0
        (2, base_b),
        (3, base_b + "eleven"),          # near-dup of 2
        (4, "totally different content with no overlap at all whatsoever"),
        (5, "another unique document about unrelated various topics"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.n_mh_band_partners
        for r in minhash_gate_summary(df).collect()
    }
    assert got[0] > 0 and got[1] > 0 and got[2] > 0 and got[3] > 0
    assert got[4] == 0 and got[5] == 0


def test_simhash_md5_twin_matches_python_reference(spark):
    """The q66 gate's 60-bit simhash twin (simhash_gate_summary)
    recomputed in pure Python — md5-derived 60-bit token hashes, per-bit
    +-1 votes over DISTINCT tokens, sign bits packed — so the DuckDB
    oracle, the Spark expression, and an independent implementation all
    agree on the bits; band partner counts checked on a planted pair."""
    import hashlib
    import re

    from entangledb_spark.operators._minhash_params import SIMHASH_GATE_BITS
    from entangledb_spark.operators.dedup import simhash_gate_summary

    texts = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta iota"),  # 1 token off
        (2, "совершенно unrelated 123 numbers and words"),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: (r.sim60, r.n_sim_band_partners)
           for r in simhash_gate_summary(df).collect()}

    def py_sim60(text: str) -> int:
        toks = set(re.findall(r"[a-z0-9]+", text.lower()))
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
        fp = 0
        for i in range(SIMHASH_GATE_BITS):
            vote = sum(1 if (h >> i) & 1 else -1 for h in hs)
            if vote > 0:
                fp |= 1 << i
        return fp

    for did, text in texts:
        assert got[did][0] == py_sim60(text), did
    assert got[3][0] == 0  # zero-token doc fingerprints to 0
    # docs 0 and 1 differ by one token -> tiny hamming -> share a band
    assert got[0][1] >= 1 and got[1][1] >= 1
    # zero-token docs are EXCLUDED from the band join (the oracle's
    # unnest-of-empty omits them; Spark must agree) — two tokenless docs
    # must NOT partner each other via the all-zero fingerprint
    df2 = spark.createDataFrame(
        texts + [(4, "   "), (5, None)], "doc_id long, text string"
    )
    got2 = {r.doc_id: r.n_sim_band_partners
            for r in simhash_gate_summary(df2).collect()}
    assert got2[3] == 0 and got2[4] == 0 and got2[5] == 0


def test_minhash_pair_set_equivalence_xxhash64_vs_md5(spark):
    """Round-10 binding test for the q62 gate re-key (TWINS.md): the
    PRODUCTION xxhash64 base and the gate's DuckDB-re-derivable md5 base
    must produce the SAME candidate pair set on the real fixture — both
    raw (all band collisions) and at the operating threshold
    (est_jaccard >= 0.5, the near_dup_survivors default). Different hash
    universes, same decisions: the fixture's near-dups are unambiguous,
    so a divergence here means a bug in the shared banding/permutation
    math, not hash luck."""
    from entangledb_spark.operators.dedup import minhash_lsh_pairs

    sf = "/root/testdata/sf0.001"
    xx = minhash_lsh_pairs(spark, sf, base="xxhash64").collect()
    md = minhash_lsh_pairs(spark, sf, base="md5").collect()
    assert {(r.doc_a, r.doc_b) for r in xx} == {(r.doc_a, r.doc_b) for r in md}
    thr = lambda rows: {  # noqa: E731
        (r.doc_a, r.doc_b) for r in rows if r.est_jaccard >= 0.5
    }
    assert thr(xx) == thr(md)
    # exact_jaccard is computed over each base's own 30-bit shingle
    # universe — the VALUES may differ by collision noise, but the
    # decision-relevant ordering agrees on every shared pair
    ex = {(r.doc_a, r.doc_b): r.exact_jaccard for r in xx}
    em = {(r.doc_a, r.doc_b): r.exact_jaccard for r in md}
    for k in ex:
        assert abs(ex[k] - em[k]) < 0.02, (k, ex[k], em[k])


def test_simhash_base_equivalence_on_exact_duplicates(spark):
    """Round-10 binding test for the q63 gate re-key: a pair of documents
    with IDENTICAL distinct-token sets must fingerprint identically
    (hamming 0) under BOTH the production 64-bit xxhash64 base and the
    gate's 60-bit md5 base — the semantic invariant the two hash
    universes share exactly. (Unlike MinHash-LSH candidate pairs, the
    hamming<=3 candidate sets legitimately differ between 60- and 64-bit
    spaces, so the binding property is the exact-duplicate one; behavior
    on planted near-dups is covered by the twin tests above.)"""
    from entangledb_spark.operators.dedup import simhash_fingerprints, word_tokens

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    groups = (
        docs.select(
            "doc_id",
            F.array_join(F.array_sort(F.array_distinct(word_tokens(F.col("text")))), " ").alias("k"),
        )
        .groupBy("k")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .collect()
    )
    assert groups, "fixture must contain exact-duplicate documents"
    dup_pairs = {
        (min(a, b), max(a, b))
        for g in groups
        for i, a in enumerate(sorted(g.ids))
        for b in sorted(g.ids)[i + 1 :]
    }
    for base in ("xxhash64", "md5"):
        fp = {
            r.doc_id: r.simhash
            for r in simhash_fingerprints(spark, sf, base=base).collect()
        }
        for a, b in dup_pairs:
            assert fp[a] == fp[b], (base, a, b)


def test_repartition_for_cpu_post_aggregation_uses_live_probe(spark):
    """repartition_for_cpu's byte arithmetic judges the SCAN; a
    post-aggregation input must fall through to the live probe (VERDICT
    r11 item 5): df.inputFiles() still reports the scan's files for an
    aggregated relation, so with a tiny maxPartitionBytes the byte route
    would declare a 1-partition aggregate "already wide" and leave a
    CPU-heavy map serial. The whitelist (_scan_narrow_lineage) must route
    scans through the arithmetic and anything that can re-distribute rows
    through the probe."""
    from entangledb_spark.operators.dedup import (
        _scan_narrow_lineage,
        repartition_for_cpu,
    )

    docs = table(spark, SF, "documents").select("doc_id", "text")
    agg = docs.groupBy(F.length("text").alias("n")).count()
    assert _scan_narrow_lineage(docs)
    assert _scan_narrow_lineage(docs.filter("doc_id > 3"))
    assert not _scan_narrow_lineage(agg)
    assert not _scan_narrow_lineage(docs.orderBy("doc_id"))
    assert not _scan_narrow_lineage(docs.join(docs.select("doc_id"), "doc_id"))

    cores = spark.sparkContext.defaultParallelism
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1b")
    try:
        # scan bytes >= cores * 1b → byte route says "already wide": the
        # aggregate must NOT take that route — the live probe sees its
        # true (coalesced) width and widens it for the CPU map
        out = repartition_for_cpu(agg, spark)
        assert out.rdd.getNumPartitions() >= cores
        # while a genuine scan takes the arithmetic route untouched
        assert repartition_for_cpu(docs, spark) is docs
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_q62_verification_scan_pinned_in_executed_plan(spark):
    """Executed-plan pin for q62's round-11 B1 structure (VERDICT r11
    item: 'pin q62's single verification corpus scan'): in the final
    adaptive plan exactly ONE live documents.parquet FileScan remains —
    the others are served from the persisted relations (signatures,
    candidates), which appear as InMemoryTableScans; a cached relation's
    own build subtree prints inline at its first materialization, which
    is where the surviving scan line lives. A regression that drops a
    persist or splits the candidate-bounded verification subtree makes
    the ta/tb exact-score joins (or the banded self-join) re-scan the
    corpus and shows up here as extra live documents scans."""
    import __spark_entry__ as entry

    df = entry.queries()["q62_dedup_minhash_lsh"](spark, SF)
    df.collect()
    final = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    doc_scans = [
        l
        for l in final.splitlines()
        if "FileScan parquet" in l and "documents.parquet" in l
    ]
    assert len(doc_scans) == 1, final
    assert final.count("InMemoryTableScan") >= 2, final

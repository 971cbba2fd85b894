"""Hybrid retrieval (operators/hybrid.py): RRF fusion math against an
independent pure-Python reference, end-to-end single-query and bulk paths
over real persistent indexes, and kind dispatch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entangledb_spark.operators.hybrid import (
    RRF_K,
    hybrid_topk,
    hybrid_topk_bulk,
    probe_ann_index,
    rrf_fuse,
)

SF = "/root/testdata/sf0.001"


def python_rrf(lists: dict[str, list], rrf_k: int = RRF_K, k: int = 10):
    """Independent reference: lists maps label -> [doc_id ...] in rank
    order. Returns [(doc_id, score)] top-k by (score desc, doc_id asc)."""
    scores: dict = {}
    for ids in lists.values():
        for rank, d in enumerate(ids, start=1):
            scores[d] = scores.get(d, 0.0) + 1.0 / (rrf_k + rank)
    ranked = sorted(scores.items(), key=lambda t: (-t[1], t[0]))
    return ranked[:k]


def test_rrf_fuse_math_exact(spark):
    a = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rk long")
    b = spark.createDataFrame([(20, 1), (10, 2), (40, 3)], "doc_id long, rk long")
    out = {
        r["doc_id"]: r
        for r in rrf_fuse([("x", a), ("y", b)], k=10).collect()
    }
    assert out[10]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62)
    assert out[20]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    assert out[30]["rrf_score"] == pytest.approx(1 / 63)
    assert out[30]["n_lists"] == 1 and out[10]["n_lists"] == 2
    assert out[10]["ranks"] == {"x": 1, "y": 2}
    # 10 and 20 tie exactly → doc_id breaks it
    assert out[10]["rk"] < out[20]["rk"]
    expected = python_rrf({"x": [10, 20, 30], "y": [20, 10, 40]})
    got = sorted(out.values(), key=lambda r: r["rk"])
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]


def test_rrf_fuse_validation(spark):
    a = spark.createDataFrame([(1, 1)], "doc_id long, rk long")
    with pytest.raises(ValueError, match="duplicate"):
        rrf_fuse([("x", a), ("x", a)])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([("x", a)], k=0)


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    """A text index over documents and an LSH + IVF-PQ index over the
    matching embeddings (shared 0..499 id space)."""
    from entangledb_spark.operators.ann_index import (
        build_ivfpq_index,
        build_lsh_index,
    )
    from entangledb_spark.operators.text_index import build_text_index

    root = tmp_path_factory.mktemp("hybrid_idx")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    tdir = str(root / "text")
    ldir = str(root / "lsh")
    pdir = str(root / "ivfpq")
    build_text_index(docs, tdir)
    build_lsh_index(embs, ldir)
    build_ivfpq_index(embs, pdir, n_cells=8, m=4, ksub=16)
    return {"text": tdir, "lsh": ldir, "ivfpq": pdir, "docs": docs, "embs": embs}


def _query_parts(spark, indexes):
    doc = (
        indexes["docs"].filter(F.col("doc_id") == 7).select("text").first()["text"]
    )
    terms = tuple(doc.lower().split()[:8])
    vec = (
        indexes["embs"].filter(F.col("vec_id") == 7).first()["embedding"]
    )
    return terms, [float(x) for x in vec]


def test_hybrid_topk_matches_python_reference(spark, indexes):
    from entangledb_spark.operators.text_index import bm25_topk_indexed

    terms, vec = _query_parts(spark, indexes)
    fused = hybrid_topk(
        spark, indexes["text"], indexes["lsh"], terms, vec, k=10, candidates=20
    ).collect()
    assert fused, "hybrid retrieval returned nothing"
    # rebuild the reference from the two (independently tested) probe paths
    bm_ids = [
        r["doc_id"]
        for r in bm25_topk_indexed(spark, indexes["text"], terms, k=20)
        .orderBy(F.col("score").desc(), "doc_id")
        .collect()
    ]
    probe = spark.createDataFrame(
        [(-1, vec)], "vec_id long, embedding array<float>"
    )
    ann = probe_ann_index(spark, indexes["lsh"], probe, k=20).collect()
    ann_ids = [r["neighbor_id"] for r in sorted(ann, key=lambda r: r["rk"])]
    expected = python_rrf({"bm25": bm_ids, "ann": ann_ids}, k=10)
    got = sorted(fused, key=lambda r: r["rk"])
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, score) in zip(got, expected):
        assert r["rrf_score"] == pytest.approx(score)
    # the query doc itself should surface near the top (it matches both
    # its own terms and its own vector)
    assert 7 in [r["doc_id"] for r in got][:3]
    # explainability: ranks map labels
    assert set(got[0]["ranks"]).issubset({"bm25", "ann"})


def test_hybrid_topk_ivfpq_kind(spark, indexes):
    terms, vec = _query_parts(spark, indexes)
    fused = hybrid_topk(
        spark, indexes["text"], indexes["ivfpq"], terms, vec, k=5, candidates=15
    ).collect()
    assert len(fused) == 5
    assert [r["rk"] for r in sorted(fused, key=lambda r: r["rk"])] == [1, 2, 3, 4, 5]


def test_hybrid_topk_bulk_matches_per_query(spark, indexes):
    """Bulk fusion must equal running each query through the single path."""
    docs, embs = indexes["docs"], indexes["embs"]
    qids = [3, 11, 42]
    rows = (
        docs.filter(F.col("doc_id").isin(qids))
        .join(embs, F.col("doc_id") == F.col("vec_id"))
        .select("doc_id", "text", "embedding")
        .collect()
    )
    queries = spark.createDataFrame(
        [
            (int(r["doc_id"]), " ".join(r["text"].lower().split()[:8]),
             [float(x) for x in r["embedding"]])
            for r in rows
        ],
        "query_id long, text string, embedding array<float>",
    )
    bulk = hybrid_topk_bulk(
        spark, indexes["text"], indexes["ivfpq"], queries, k=5, candidates=15
    ).collect()
    by_q = {}
    for r in bulk:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(qids)
    for r in rows:
        qid = int(r["doc_id"])
        single = hybrid_topk(
            spark,
            indexes["text"],
            indexes["ivfpq"],
            tuple(r["text"].lower().split()[:8]),
            [float(x) for x in r["embedding"]],
            k=5,
            candidates=15,
        ).collect()
        want = [(x["doc_id"], x["rk"]) for x in sorted(single, key=lambda x: x["rk"])]
        got = [
            (x["doc_id"], x["rk"])
            for x in sorted(by_q[qid], key=lambda x: x["rk"])
        ]
        assert got == want, f"query {qid}: bulk {got} != single {want}"


def test_probe_ann_index_dispatch_errors(spark, indexes, tmp_path):
    probe = spark.createDataFrame(
        [(-1, [0.0] * 16)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no index meta"):
        probe_ann_index(spark, str(tmp_path / "nope"), probe)


def test_hybrid_tvfs_in_sql(spark, indexes, tmp_path):
    """The dialect spellings run the identical fusion path end-to-end:
    FROM hybrid_topk(...) literal probe and FROM hybrid_topk_bulk(...)
    over an ATTACHed query table."""
    from entangledb_spark.engine import Engine, EngineError

    eng = Engine(spark, str(tmp_path / "db"))
    terms, vec = _query_parts(spark, indexes)
    vec_lit = " ".join(f"{x:.6f}" for x in vec)
    r = eng.execute(
        f"SELECT doc_id, rk FROM hybrid_topk('{indexes['text']}', "
        f"'{indexes['lsh']}', '{' '.join(terms)}', '{vec_lit}', 5) "
        "ORDER BY rk"
    )
    rows = r.rows
    assert len(rows) == 5 and rows[0][1] == 1
    # parity with the DataFrame surface
    df_rows = [
        (x["doc_id"], x["rk"])
        for x in sorted(
            hybrid_topk(
                spark, indexes["text"], indexes["lsh"], terms, vec,
                k=5, candidates=50,
            ).collect(),
            key=lambda x: x["rk"],
        )
    ]
    assert rows == df_rows
    # bulk spelling over an ATTACHed parquet query set
    qpath = str(tmp_path / "queries.parquet")
    docs, embs = indexes["docs"], indexes["embs"]
    (
        docs.filter(F.col("doc_id").isin([3, 11]))
        .join(embs, F.col("doc_id") == F.col("vec_id"))
        .select(
            F.col("doc_id").alias("query_id"),
            F.col("text"),
            F.col("embedding"),
        )
        .write.mode("overwrite")
        .parquet(qpath)
    )
    eng.attach_parquet("bench_queries", qpath)
    r = eng.execute(
        f"SELECT query_id, doc_id, rk FROM hybrid_topk_bulk("
        f"'{indexes['text']}', '{indexes['ivfpq']}', 'bench_queries', 3) "
        "ORDER BY query_id, rk"
    )
    rows = r.rows
    assert {q for q, _, _ in rows} == {3, 11}
    assert [rk for q, _, rk in rows if q == 3] == [1, 2, 3]
    with pytest.raises(EngineError, match="lacks required column"):
        eng.execute("CREATE TABLE bad (query_id INT PRIMARY KEY)")
        eng.execute(
            f"SELECT * FROM hybrid_topk_bulk('{indexes['text']}', "
            f"'{indexes['ivfpq']}', 'bad', 3)"
        )

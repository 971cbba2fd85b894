"""TF-IDF keyword extraction (text.tfidf_keywords): full DuckDB mirror
on the real corpus, stopword-cap semantics, and rank determinism."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from entangledb_spark.operators.text import tfidf_keywords


def test_duckdb_mirror_real_corpus(spark, sf_dir):
    got = {
        (r.doc_id, r.rank): (r.token, r.tf, r.df, r.score)
        for r in tfidf_keywords(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    truth = {
        (d, rk): (tok, tf, df, sc)
        for d, tok, tf, df, sc, rk in con.execute(
            r"""
            WITH n AS (SELECT count(*) AS n_docs FROM documents),
            toks AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
              FROM documents
            ),
            tf AS (
              SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
            ),
            dfr AS (
              SELECT token, count(*) AS df FROM tf GROUP BY token
            ),
            scored AS (
              SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
                     floor(CAST(tf.tf * (ln((n.n_docs + 1.0) / (dfr.df + 1.0)) + 1.0)
                           AS DOUBLE) * 10000 + 0.5) / 10000 AS score
              FROM tf JOIN dfr USING (token) CROSS JOIN n
              WHERE dfr.df <= 0.5 * n.n_docs
            ),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY score DESC, token) AS rank
              FROM scored
            )
            SELECT doc_id, token, tf, df, score, rank FROM ranked WHERE rank <= 5
            """
        ).fetchall()
    }
    assert len(got) > 0 and got == truth


def test_stopword_cap_drops_ubiquitous_tokens(spark):
    docs = spark.createDataFrame(
        [
            (0, "common common alpha beta"),
            (1, "common gamma delta"),
            (2, "common epsilon zeta"),
            (3, "common eta theta"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, top_k=10, doc_freq_cap=0.5).collect()
    toks = {r.token for r in out}
    # 'common' is in 4/4 docs (> 0.5*4) -> never a keyword, even with the
    # highest tf in doc 0
    assert "common" not in toks
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert {r.token for r in by_doc[0]} == {"alpha", "beta"}
    # ranks dense from 1, ties broken lexicographically (equal tf/df)
    r0 = sorted(by_doc[0], key=lambda r: r.rank)
    assert [r.rank for r in r0] == [1, 2]
    assert [r.token for r in r0] == ["alpha", "beta"]


def test_single_source_scan(spark, sf_dir):
    """The n_docs scalar must not cost an extra corpus scan: tf is
    checkpointed once and all three consumer branches (tf rows, df, N)
    read the checkpoint — the executed plan contains zero parquet scans
    (the one real scan happens inside the checkpoint materialization)."""
    from entangledb_spark.operators.text import tfidf_keywords

    df = tfidf_keywords(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    df.collect()
    final = (
        df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    )
    assert final.count("Scan parquet") == 0, final
    assert final.count("ExistingRDD") >= 2, final

"""MinHash family parameters + the DuckDB gate-oracle builder — a LEAF
module (imports nothing from this package) so both operators/dedup.py
(the operators) and operators/text.py (the q66 gate host, whose oracle
string is composed at import time) can share one source of truth without
a circular import (dedup imports text for `fingerprint`).
"""

from __future__ import annotations

MINHASH_PERMS = 16  # number of seeded hash permutations
LSH_BANDS = 4  # 4 bands × 4 rows — candidates need 1 identical band
SHINGLE_N = 3  # word-shingle width

# Permutation family (a·x + b) mod P. P MUST exceed the 30-bit hash
# universe: with P below it the mod never wraps and (a·x+b) is monotonic
# in x — every "permutation" then selects the same argmin shingle and the
# signature degenerates to a function of one shingle (observed:
# est_jaccard=1.0 on pairs with exact≈0.01 before this fix). Mersenne
# 2^31−1 exceeds the 30-bit shingle universe (hash family stays
# injective-capable) while a·x+b ≫ P guarantees wraparound.
MINHASH_P = (1 << 31) - 1
MINHASH_AB = [
    ((2654435761 * (k + 1)) & 0x3FFFFFFF | 1, (40503 * (k + 7) ** 2) & 0x3FFFFFFF)
    for k in range(MINHASH_PERMS)
]


def minhash_gate_oracle_ctes() -> str:
    """The DuckDB re-derivation of dedup.minhash_gate_summary, composed
    FROM the same constants so the two engines can never drift. Returns
    CTE text (no trailing comma) expecting a `documents` relation;
    yields mhs(doc_id, sig) and mpart(doc_id, n)."""
    perms = ",\n           ".join(
        f"list_aggregate(list_transform(B, h -> ({a} * h + {b}) % {MINHASH_P}), 'min')"
        for a, b in MINHASH_AB
    )
    rpb = MINHASH_PERMS // LSH_BANDS
    bands_vals = ", ".join(f"({i})" for i in range(LSH_BANDS))
    return f"""
    mtk AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
      FROM documents
    ),
    msh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= {SHINGLE_N} THEN list_transform(
                    range(1, len(tk) - {SHINGLE_N - 2}),
                    i -> ('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 8))::BIGINT
                         % {1 << 30})
                  -- coalesce: DuckDB's array_to_string([]) is NULL,
                  -- Spark's concat_ws is '' — zero-token docs must hash ''
                  ELSE [('0x' || substr(md5(coalesce(array_to_string(tk, ' '), '')), 1, 8))::BIGINT
                        % {1 << 30}] END AS B
      FROM mtk
    ),
    mhs AS (
      SELECT doc_id,
             [{perms}] AS sig
      FROM msh
    ),
    mbd AS (
      SELECT doc_id, bb.b AS band_idx,
             array_to_string(sig[(bb.b*{rpb}+1):((bb.b+1)*{rpb})], ',') AS band_key
      FROM mhs CROSS JOIN (VALUES {bands_vals}) AS bb(b)
    ),
    mmatch AS (
      SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      FROM mbd a JOIN mbd b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           AND a.doc_id != b.doc_id
    ),
    mpart AS (
      SELECT da AS doc_id, count(DISTINCT db) AS n FROM mmatch GROUP BY da
    ),
    -- connected components over the candidate-pair subgraph as recursive
    -- label propagation: every label a vertex can reach spreads along the
    -- (symmetric) mmatch edges; UNION dedups so the recursion terminates,
    -- and min(label) per vertex is exactly the component-minimum id the
    -- Spark connected_components operator converges to
    mlab AS (
      SELECT DISTINCT da AS id, da AS label FROM mmatch
      UNION
      SELECT m.db, mlab.label FROM mmatch m JOIN mlab ON mlab.id = m.da
    ),
    mcc AS (
      SELECT id AS doc_id, min(label) AS cc FROM mlab GROUP BY id
    )"""


def minhash_pairs_oracle_sql() -> str:
    """Full DuckDB oracle for the q62 gate (round 10: the gate query is
    re-keyed onto the md5 twin primitive — see dedup.minhash_lsh_pairs —
    so the driver can hash-match the ENTIRE pair pipeline instead of
    recording a rows-only row): candidate pairs from the banded join,
    est_jaccard = fraction of equal signature components, exact_jaccard
    over the distinct 30-bit shingle-hash sets (list_intersect dedupes,
    |A∪B| = |A|+|B|-|A∩B| — the same identity Spark's
    array_intersect/array_union sizes compute)."""
    p = MINHASH_PERMS
    return (
        "WITH RECURSIVE "
        + minhash_gate_oracle_ctes()
        + f""",
    mcand AS (SELECT da AS doc_a, db AS doc_b FROM mmatch WHERE da < db),
    msets AS (SELECT doc_id, list_distinct(B) AS s FROM msh)
    SELECT c.doc_a, c.doc_b,
           r4(CAST(list_sum(list_transform(range(1, {p + 1}),
                i -> CASE WHEN ha.sig[i] = hb.sig[i] THEN 1 ELSE 0 END))
              AS DOUBLE) / {p}) AS est_jaccard,
           r4(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))))
             AS exact_jaccard
    FROM mcand c
    JOIN mhs ha ON ha.doc_id = c.doc_a
    JOIN mhs hb ON hb.doc_id = c.doc_b
    JOIN msets sa ON sa.doc_id = c.doc_a
    JOIN msets sb ON sb.doc_id = c.doc_b
    """
    )


def minhash_clusters_oracle_sql() -> str:
    """Full DuckDB oracle for the q67 gate (round 10): duplicate clusters
    over the md5-twin candidate-pair graph — recursive-CTE label
    propagation to the fixpoint (mlab/mcc in minhash_gate_oracle_ctes),
    then one GROUP BY per component. min(label) per vertex is exactly
    the component minimum dedup.connected_components converges to."""
    return (
        "WITH RECURSIVE "
        + minhash_gate_oracle_ctes()
        + """
    SELECT CAST(cc AS BIGINT) AS cluster_id,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS keep_doc
    FROM mcc GROUP BY cc HAVING count(*) > 1
    """
    )


SIMHASH_GATE_BITS = 60  # 15 md5 hex chars < 2^60 — BIGINT-safe on both engines
SIMHASH_GATE_BANDS = 4


def simhash_fingerprint_oracle_sql() -> str:
    """Full DuckDB oracle for the q63 gate (round 10: re-keyed onto the
    md5 60-bit twin primitive — see dedup.simhash_fingerprints): per-doc
    fingerprint from the shared vote/sign math plus the four 15-bit
    bands. Zero-token / NULL-text docs vanish from the vote CTE (unnest
    of empty) and coalesce to fingerprint 0 — exactly what Spark's empty
    vote array produces."""
    bits = SIMHASH_GATE_BITS
    width = bits // SIMHASH_GATE_BANDS
    mask = (1 << width) - 1
    band_cols = ",\n           ".join(
        f"CAST((coalesce(f.fp, 0) >> {bits - width * (j + 1)}) & {mask} AS BIGINT)"
        f" AS {name}"
        for j, name in enumerate(("band_a", "band_b", "band_c", "band_d"))
    )
    return (
        "WITH "
        + simhash_gate_oracle_ctes()
        + f"""
    SELECT d.doc_id,
           CAST(coalesce(f.fp, 0) AS BIGINT) AS simhash,
           {band_cols}
    FROM documents d LEFT JOIN sfp f ON f.doc_id = d.doc_id
    """
    )


def simhash_gate_oracle_ctes() -> str:
    """DuckDB re-derivation of dedup.simhash_gate_summary: per-token
    60-bit md5 hash, per-bit +-1 votes (one GROUP BY with 60 sum-CASE
    columns — a single pass over the exploded token hashes), sign bits
    packed into the fingerprint, 4 x 15-bit band partner counts. Returns
    CTE text (no trailing comma) yielding sfp(doc_id, fp) and
    spart(doc_id, n)."""
    bits = SIMHASH_GATE_BITS
    width = bits // SIMHASH_GATE_BANDS
    votes = ",\n             ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    fpsum = "\n               + ".join(
        f"CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(bits)
    )
    bands_vals = ", ".join(f"({i})" for i in range(SIMHASH_GATE_BANDS))
    return f"""
    stk AS (
      SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk
      FROM documents
    ),
    sth AS (
      SELECT doc_id,
             unnest(list_transform(tk, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)) AS h
      FROM stk
    ),
    svt AS (
      SELECT doc_id,
             {votes}
      FROM sth GROUP BY doc_id
    ),
    sfp AS (
      SELECT doc_id,
             CAST({fpsum} AS BIGINT) AS fp
      FROM svt
    ),
    sbd AS (
      SELECT doc_id, bb.b AS band_idx,
             (fp >> ({bits} - {width} * (bb.b + 1))) & {(1 << width) - 1} AS band_key
      FROM sfp CROSS JOIN (VALUES {bands_vals}) AS bb(b)
    ),
    spart AS (
      SELECT a.doc_id, count(DISTINCT b.doc_id) AS n
      FROM sbd a JOIN sbd b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           AND a.doc_id != b.doc_id
      GROUP BY a.doc_id
    )"""

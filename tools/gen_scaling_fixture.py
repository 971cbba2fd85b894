#!/usr/bin/env python
"""Generate a LARGER instance of the bench fixture schema for scaling runs.

/root/testdata is read-only and capped at sf0.1 (~17 MB), where the suite is
driver-bound (the r11 scaling block showed 8-core ≈ 32-core). This writes a
deterministic, schema-identical fixture at any multiple of sf0.1's row counts
so core-count scaling of the EXECUTOR work can be measured (guide §1 —
measure at a size where the thing you claim to optimize is actually visible).

The data is synthesized to match the sf0.1 distributions (same vocab, date
ranges, key fan-outs, cluster structure) but is NOT oracle-checked — it is a
performance fixture, not a correctness fixture. Never point the driver's
correctness run at it.

Usage: python tools/gen_scaling_fixture.py <out_dir> [mult]
  mult: row multiple of sf0.1 (default 10 → "sf1").
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

# sf0.1 row counts (the unit this generator multiplies).
BASE = {
    "region": 5,
    "nation": 25,
    "supplier": 1_000,
    "customer": 15_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}

VOCAB = (
    "small join filter order key stream line query value big window table "
    "spark a data batch part column sort fast scan hash slow group agg row "
    "merge customer the of"
).split()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]
PART_ADJ = ["large", "small", "ivory", "azure", "burnished", "polished"]
PART_NOUN = ["ring", "cog", "panel", "sprocket", "widget", "gear"]
DAY_US = 86_400_000_000


def _ts_col(days_from, days_to, n, rng, origin="1995-01-01"):
    base = np.datetime64(origin, "us")
    span = (days_to - days_from) * DAY_US
    off = days_from * DAY_US + (rng.random(n) * span).astype(np.int64)
    return base + off.astype("timedelta64[us]")


def _day_col(days_from, days_to, n, rng, origin="1995-01-01"):
    base = np.datetime64(origin, "us")
    d = rng.integers(days_from, days_to, n) * DAY_US
    return base + d.astype("timedelta64[us]")


def write(out_dir: str, mult: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n = {t: c * mult if t not in ("region", "nation") else c for t, c in BASE.items()}

    pq.write_table(
        pa.table(
            {"r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS}
        ),
        f"{out_dir}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": np.arange(25, dtype=np.int32),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": (np.arange(25) % 5).astype(np.int32),
            }
        ),
        f"{out_dir}/nation.parquet",
    )

    k = n["supplier"]
    pq.write_table(
        pa.table(
            {
                "s_suppkey": np.arange(k),
                "s_name": [f"Supplier#{i:09d}" for i in range(k)],
                "s_nationkey": rng.integers(0, 25, k).astype(np.int32),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, k), 2),
            }
        ),
        f"{out_dir}/supplier.parquet",
    )

    k = n["customer"]
    pq.write_table(
        pa.table(
            {
                "c_custkey": np.arange(k),
                "c_name": [f"Customer#{i:09d}" for i in range(k)],
                "c_nationkey": rng.integers(0, 25, k).astype(np.int32),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, k), 2),
                "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, k)],
            }
        ),
        f"{out_dir}/customer.parquet",
    )

    k = n["part"]
    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), k)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), k)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": np.arange(k),
                "p_name": np.char.add(np.char.add(adj, " "), noun),
                "p_brand": np.array([f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)])[
                    rng.integers(0, 25, k)
                ],
                "p_type": np.char.add("TYPE_", rng.integers(0, 6, k).astype(str)),
                "p_size": rng.integers(1, 51, k).astype(np.int32),
                "p_retailprice": np.round(rng.uniform(900, 2000, k), 2),
            }
        ),
        f"{out_dir}/part.parquet",
    )

    k = n["orders"]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(k),
                "o_custkey": rng.integers(0, n["customer"], k),
                "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, k)],
                "o_totalprice": np.round(rng.uniform(1000, 500000, k), 2),
                "o_orderdate": _day_col(0, 2400, k, rng),
                "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, k)],
            }
        ),
        f"{out_dir}/orders.parquet",
    )

    k = n["lineitem"]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": np.sort(rng.integers(0, n["orders"], k)),
                "l_partkey": rng.integers(0, n["part"], k),
                "l_suppkey": rng.integers(0, n["supplier"], k),
                "l_linenumber": rng.integers(1, 8, k).astype(np.int32),
                "l_quantity": rng.integers(1, 51, k).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, k), 2),
                "l_discount": np.round(rng.integers(0, 11, k) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, k) / 100.0, 2),
                "l_returnflag": np.array(["N", "R", "A"])[rng.integers(0, 3, k)],
                "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, k)],
                "l_shipdate": _day_col(1, 2500, k, rng),
            }
        ),
        f"{out_dir}/lineitem.parquet",
    )

    k = n["events"]
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(k),
                "ts": np.sort(_ts_col(0, 30, k, rng, origin="2024-01-01")),
                "user_id": rng.integers(0, 15 * mult, k) * 100,
                "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, k)],
                "value": np.round(rng.uniform(0, 500, k), 3),
                "props": np.char.add(
                    np.char.add('{"k": ', rng.integers(0, 100, k).astype(str)), "}"
                ),
            }
        ),
        f"{out_dir}/events.parquet",
    )

    # documents: zipf-ish draws over the sf0.1 vocab, 8-100 tokens, with the
    # same ~0.16% exact-duplicate rate the real fixture carries.
    k = n["documents"]
    vocab = np.array(VOCAB)
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 0.7
    weights /= weights.sum()
    lengths = rng.integers(8, 101, k)
    toks = rng.choice(len(vocab), size=(k, 100), p=weights)
    texts = [" ".join(vocab[toks[i, : lengths[i]]]) + " " for i in range(k)]
    dup_idx = rng.integers(0, k, max(1, k // 625))
    for j, src in enumerate(dup_idx):
        texts[(src + 1 + j) % k] = texts[src]
    langs = np.array(["en", "zh", "es", "fr", "de"])[
        rng.choice(5, k, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(k),
                "text": texts,
                "lang": langs,
                "source": np.char.add("src", (np.arange(k) % 20).astype(str)),
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        f"{out_dir}/documents.parquet",
    )

    # embeddings: 10 gaussian clusters in 64-dim float32.
    k = n["embeddings"]
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, k)
    vecs = (centers[labels] + rng.normal(0, 0.35, (k, 64))).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(k),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1)), 64
                ).cast(pa.list_(pa.float32())),
                "label": labels.astype(np.int32),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    manifest = {"seed": SEED, "mult": mult, "rows": n}
    with open(f"{out_dir}/MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(json.dumps(manifest))


if __name__ == "__main__":
    out = sys.argv[1]
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    write(out, mult)

#!/usr/bin/env python
"""Interleaved A/B with per-visit warmup — the ab_bench.py mechanics, plus
``WARMUP`` untimed reps after every tree swap so queries with per-process
caches (q71's ANN index build, q62's persisted signatures) are measured at
their bench semantics (build-once/probe-many; bench.py runs warmup reps for
the same reason). Visits alternate A,B,A,B,... so machine drift (this box
shows noisy-neighbor CPU steal) hits both trees equally; best-of-all-reps
per tree is compared, mirroring the bench's best-of-N.

Usage:
  python tools/ab_query.py TREE_A TREE_B q71_ann_scalable [...]
Env: SPARK_GRAFT_SF_DIR, AB_ROUNDS (default 4), AB_REPS (default 3),
AB_WARMUP (default 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))
REPS = int(os.environ.get("AB_REPS", "3"))
WARMUP = int(os.environ.get("AB_WARMUP", "1"))


def load_tree(tree: str):
    for mod in [m for m in sys.modules if m.split(".")[0] == "entangledb_spark"]:
        del sys.modules[mod]
    while sys.path and sys.path[0].startswith("/root/repo"):
        sys.path.pop(0)
    sys.path.insert(0, tree)
    import entangledb_spark.registry as registry  # noqa: PLC0415

    registry.load_all()
    return registry


def _steal_jiffies() -> int:
    """Cumulative hypervisor steal time — this box is a VM with bursty
    noisy-neighbor CPU steal (observed: multi-thousand-jiffy storms that
    triple query times while the engine is blameless). Recording the
    per-rep steal delta lets the summary report a best-of-clean-reps
    comparison instead of blending storm reps into the signal."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def time_noop(build_df) -> tuple[float, int]:
    s0 = _steal_jiffies()
    t0 = time.perf_counter()
    build_df().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3), _steal_jiffies() - s0


def main() -> None:
    tree_a, tree_b = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    queries = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    reg = load_tree(tree_a)
    from entangledb_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("ab-query")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, list[tuple[float, int]]]] = {
        q: {tree_a: [], tree_b: []} for q in queries
    }
    for rnd in range(ROUNDS):
        for tree in (tree_a, tree_b):
            reg = load_tree(tree)
            for q in queries:
                fn = reg.QUERIES[q]
                for _ in range(WARMUP):
                    time_noop(lambda: fn(spark, sf_dir))
                for _ in range(REPS):
                    t, steal = time_noop(lambda: fn(spark, sf_dir))
                    results[q][tree].append((t, steal))
                    print(
                        f"  r{rnd} {os.path.basename(tree)} {q}: {t:.3f}s"
                        f" (steal {steal})",
                        file=sys.stderr,
                    )

    summary = {}
    for q in queries:
        a, b = results[q][tree_a], results[q][tree_b]
        # best over reps with the least hypervisor interference: keep the
        # cleanest half of each side's reps (by steal), then take the min
        clean_a = sorted(t for t, _ in sorted(a, key=lambda r: r[1])[: max(1, len(a) // 2)])
        clean_b = sorted(t for t, _ in sorted(b, key=lambda r: r[1])[: max(1, len(b) // 2)])
        summary[q] = {
            "a_best": min(t for t, _ in a), "b_best": min(t for t, _ in b),
            "a_best_clean": clean_a[0], "b_best_clean": clean_b[0],
            "a_reps": a, "b_reps": b,
            "delta_pct": round(
                (min(t for t, _ in b) - min(t for t, _ in a))
                / min(t for t, _ in a) * 100, 1,
            ),
            "delta_pct_clean": round(
                (clean_b[0] - clean_a[0]) / clean_a[0] * 100, 1
            ),
        }
    print(json.dumps({"tree_a": tree_a, "tree_b": tree_b, "sf_dir": sf_dir,
                      "rounds": ROUNDS, "reps": REPS, "warmup": WARMUP,
                      "queries": summary}))


if __name__ == "__main__":
    main()

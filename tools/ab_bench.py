#!/usr/bin/env python
"""Interleaved like-for-like A/B of two repo trees on selected bench queries.

The q93 precedent (bench.py EXPECTED_REGRESSIONS note): when the artifact
taxonomy flags a >15% regression whose code paths did not change, the only
trustworthy follow-up is running BOTH trees' implementations alternately in
ONE Spark session on the same machine state — every rep of tree A is
bracketed by reps of tree B, so page-cache / JVM / CPU-governor drift hits
both sides equally and the remaining delta is attributable to the code.

Usage:
  python tools/ab_bench.py TREE_A TREE_B q17_join_star q30_windows ...

Mechanics: the two trees are plain checkouts of the same pure-Python
package; between reps we purge entangledb_spark* from sys.modules, swap the
tree onto sys.path[0], and re-import the registry. PySpark itself (and the
JVM) stays loaded — exactly the shared state we want held constant.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROUNDS = 4


def load_tree(tree: str):
    for mod in [m for m in sys.modules if m.split(".")[0] == "entangledb_spark"]:
        del sys.modules[mod]
    while sys.path and sys.path[0].startswith("/root/repo"):
        sys.path.pop(0)
    sys.path.insert(0, tree)
    import entangledb_spark.registry as registry  # noqa: PLC0415

    registry.load_all()
    return registry


def time_noop(build_df) -> float:
    t0 = time.perf_counter()
    build_df().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    tree_a, tree_b = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    queries = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    reg = load_tree(tree_a)
    from entangledb_spark.session import get_spark  # noqa: PLC0415

    spark = get_spark("ab-bench")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, list[float]]] = {
        q: {tree_a: [], tree_b: []} for q in queries
    }
    for rnd in range(ROUNDS + 1):  # round 0 = untimed warmup of BOTH trees
        for tree in (tree_a, tree_b):
            reg = load_tree(tree)
            for q in queries:
                fn = reg.QUERIES[q]
                t = time_noop(lambda: fn(spark, sf_dir))
                if rnd > 0:
                    results[q][tree].append(t)
                    print(f"  r{rnd} {os.path.basename(tree)} {q}: {t:.3f}s",
                          file=sys.stderr)

    summary = {}
    for q in queries:
        a, b = results[q][tree_a], results[q][tree_b]
        summary[q] = {
            "a_best": min(a), "b_best": min(b),
            "a_reps": a, "b_reps": b,
            "delta_pct": round((min(b) - min(a)) / min(a) * 100, 1),
        }
    print(json.dumps({"tree_a": tree_a, "tree_b": tree_b, "sf_dir": sf_dir,
                      "rounds": ROUNDS, "queries": summary}))


if __name__ == "__main__":
    main()

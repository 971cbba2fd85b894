#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: e.g. "before" or "after" (required)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PLANS_TAG (default r11).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entangledb_spark import registry  # noqa: E402
from entangledb_spark.session import get_spark  # noqa: E402

registry.load_all()


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or list(registry.QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PLANS_TAG", "r11")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("entangledb-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = registry.QUERIES[name]
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building plan: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()

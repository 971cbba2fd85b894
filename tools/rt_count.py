#!/usr/bin/env python
"""Count py4j round-trips per query BUILD (construction, before any action).

Load-independent instrumentation: wraps py4j's ClientServerConnection
send_command to count driver->JVM round-trips issued while the registry
query function assembles its DataFrame. Used to find construction chatter
(guide §5: the driver should do almost no data work).

Usage: python tools/rt_count.py [qname ...]   (default: headline set)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entangledb_spark import registry  # noqa: E402
from entangledb_spark.session import get_spark  # noqa: E402

registry.load_all()

COUNT = {"n": 0}


def _patch_py4j() -> None:
    from py4j import clientserver, java_gateway

    for cls in (clientserver.ClientServerConnection, java_gateway.GatewayConnection):
        orig = cls.send_command

        def wrapped(self, *a, _orig=orig, **kw):
            COUNT["n"] += 1
            return _orig(self, *a, **kw)

        cls.send_command = wrapped


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("entangledb-rtcount")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    names = sys.argv[1:] or bench.HEADLINE
    # session warmup (registers table views, events conversion, index builds)
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    registry.table(spark, sf_dir, "events").limit(1).write.format("noop").mode(
        "overwrite"
    ).save()
    _patch_py4j()
    total = 0
    print(f"{'query':<36} {'build_RT':>9} {'build_s':>8} {'exec_s':>8}")
    for name in names:
        fn = registry.QUERIES[name]
        # one untimed warm rep (index builds, codegen)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        COUNT["n"] = 0
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        tb = time.perf_counter() - t0
        n = COUNT["n"]
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        te = time.perf_counter() - t1
        total += n
        print(f"{name:<36} {n:>9} {tb:>8.3f} {te:>8.3f}")
    print(f"{'TOTAL':<36} {total:>9}")


if __name__ == "__main__":
    main()

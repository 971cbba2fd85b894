#!/usr/bin/env python
"""Per-query profiling harness (round 11 optimization instrumentation).

For each named query: run warm-ups, then one timed rep inside its own job
group, and print the Spark job/stage breakdown (job count, per-stage task
count and total/max task time) from the status tracker. This answers the
guide-§1 questions the bench line cannot: how many jobs a single rep
launches (driver round-trips), which stage holds the time, and whether a
stage is a one-task serial bottleneck.

Usage: python tools/profile_query.py q71_ann_scalable [q93_span_dedup ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entangledb_spark import registry  # noqa: E402
from entangledb_spark.session import get_spark  # noqa: E402

registry.load_all()


def profile(spark, sf_dir: str, name: str, warmup: int = 2) -> None:
    fn = registry.QUERIES[name]
    for _ in range(warmup):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc = spark.sparkContext
    group = f"profile-{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    st = sc.statusTracker()
    job_ids = sorted(st.getJobIdsForGroup(group))
    print(f"\n=== {name}: wall {wall:.3f}s, {len(job_ids)} job(s) ===")
    for jid in job_ids:
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        print(f"  job {jid} [{ji.status}]")
        for sid in sorted(ji.stageIds):
            si = st.getStageInfo(sid)
            if si is None or si.numTasks == 0:
                continue
            print(
                f"    stage {sid}: {si.numTasks} tasks, "
                f"{si.numCompletedTasks} done, name={si.name[:90]}"
            )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("entangledb-profile")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(registry.QUERIES)
    # session warmup
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    registry.table(spark, sf_dir, "events").limit(1).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        profile(spark, sf_dir, name)


if __name__ == "__main__":
    main()

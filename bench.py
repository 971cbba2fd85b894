#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Execution is measured with the noop sink (full distributed execution, no
driver-side collect), after a JVM/session warmup query. Each query is run
$SPARK_GRAFT_BENCH_REPS times (default 3) and the BEST time is reported:
single-shot timings on ~1s queries drift ±0.2-0.5s with JVM warmup/codegen
state across sessions, which round 2 showed is indistinguishable from real
regressions — best-of-N is the stable round-over-round signal. Since round
6 the artifact also records every rep ("rep_times") and the per-query
max-min ("spread"): a >15% round-over-round slowdown is reported as a
regression only when its absolute delta exceeds the measured spread,
otherwise it lands in "noise_gt_15pct".
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from entangledb_spark import registry  # noqa: E402
from entangledb_spark.session import get_spark  # noqa: E402

registry.load_all()

# Headline set: one per operator family — scan/agg, joins (hash + star),
# top-k, window, streaming-window, text, dedup (exact + MinHash-LSH),
# ANN (brute-force + indexed-LSH/IVF: q71's first rep builds the
# persistent index, later reps hit the per-process cache, so best-of-N
# reports the build-once/probe-many serving cost). q61 stays out: it is
# the deliberately brute-force sampled VALIDATOR whose production
# replacement is q62 — benchmarking it as a headline would advertise a
# plan shape the engine exists to avoid.
# Known, deliberate cost changes this round: a query listed here is
# reported under "expected_regressions" (with its reason) instead of
# "regressions_gt_15pct" — the slowdown is a scope change, not a plan
# regression. Prune entries once a round's BENCH_r*.json reflects them.
EXPECTED_REGRESSIONS: dict[str, str] = {
    # (q50's round-4 winnowing scope growth is reflected in BENCH_r04 —
    # entry pruned per the policy above)
}

HEADLINE = [
    "q01_pricing_summary",
    "q02_scan_filter_project",
    "q12_join_inner_hash",
    "q13_join_outer",
    "q17_join_star",
    "q19_agg_groupby_having",
    "q23_order_limit_offset",
    "q30_windows",
    "q33_dialect_join_topk",
    "q40_events_tumbling_window",
    "q42_events_sessionize",
    "q43_tpch_q3_shipping_priority",
    "q44_tpch_q6_forecast_revenue",
    "q45_tpch_q10_returned_items",
    "q50_text_suite",
    "q60_dedup_exact",
    "q62_dedup_minhash_lsh",
    "q70_ann_bruteforce_topk",
    "q71_ann_scalable",
    "q81_quality_repetition",
    "q93_span_dedup",
    "q94_asof_join",
    "q95_range_join",
    "q96_vocabulary",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("entangledb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: spin up executors/codegen paths outside the timed region, and
    # trigger the one-time ns→µs events conversion (sources/parquet_io.py) so
    # a cold cache doesn't bill data-prep time to the first events query.
    registry.QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    registry.table(spark, sf_dir, "events").limit(1).write.format("noop").mode(
        "overwrite"
    ).save()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    for name in HEADLINE:
        ts: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(ts)
        rep_times[name] = ts

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # every rep, so a reader can judge dispersion; "spread" is the
        # per-query max-min of this run's reps — the noise band used to
        # classify regressions below (VERDICT r5 #2: point estimates made
        # noise vs. regression formally undecidable from the artifact)
        "rep_times": rep_times,
        "spread": {q: round(max(ts) - min(ts), 3) for q, ts in rep_times.items()},
        "sf": sf,
    }

    # Round-over-round self-report. A >15% best-of-N slowdown vs the
    # newest BENCH_r*.json is flagged as a REGRESSION only when the
    # absolute delta also exceeds the measured rep spread (this run's,
    # and the previous artifact's when it recorded one) — deltas inside
    # the noise band land in "noise_gt_15pct" instead, so a 69 ms q40
    # wobble self-classifies without a human diffing the artifacts.
    prev = _latest_prev_bench()
    if prev is not None:
        prev_q = prev.get("queries", {})
        prev_spread = prev.get("spread", {})
        delta = {
            q: round((t - prev_q[q]) / prev_q[q], 3)
            for q, t in timings.items()
            if q in prev_q and prev_q[q] > 0
        }
        out["delta_vs_prev"] = delta
        noise_band = {
            q: max(out["spread"].get(q, 0.0), prev_spread.get(q, 0.0))
            for q in delta
        }
        slow = {
            q: d
            for q, d in delta.items()
            if d > 0.15 and q not in EXPECTED_REGRESSIONS
        }
        out["regressions_gt_15pct"] = sorted(
            q for q in slow if timings[q] - prev_q[q] > noise_band[q]
        )
        noise = sorted(q for q in slow if timings[q] - prev_q[q] <= noise_band[q])
        if noise:
            out["noise_gt_15pct"] = noise
        expected = {
            q: EXPECTED_REGRESSIONS[q]
            for q, d in delta.items()
            if d > 0.15 and q in EXPECTED_REGRESSIONS
        }
        if expected:
            out["expected_regressions"] = expected
    print(json.dumps(out))


def _latest_prev_bench() -> dict | None:
    """Newest BENCH_r*.json next to this script, if any."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not paths:
        return None
    try:
        with open(paths[-1]) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    # the round driver wraps the printed JSON line under "parsed"
    return d.get("parsed", d)


if __name__ == "__main__":
    main()

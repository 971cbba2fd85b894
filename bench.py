#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Execution is measured with the noop sink (full distributed execution, no
driver-side collect), after a JVM/session warmup query. Each query runs
$SPARK_GRAFT_BENCH_WARMUP untimed warm-up reps (default 1 — absorbs codegen
/page-cache/one-time index-build cost so the timed spread measures
steady-state variance, not cold-start) and then
$SPARK_GRAFT_BENCH_REPS timed reps (default 3); the BEST timed rep is reported:
single-shot timings on ~1s queries drift ±0.2-0.5s with JVM warmup/codegen
state across sessions, which round 2 showed is indistinguishable from real
regressions — best-of-N is the stable round-over-round signal.

ARTIFACT-SIZE CONTRACT (round-6 lesson): the round driver captures only the
last ~2 KB of output, and round 6's line — grown by per-rep detail — overran
that window, leaving BENCH_r06.json unparseable. The printed line is now
kept compact by construction:
  - "spread" and "delta_vs_prev" are ARRAYS aligned with the key order of
    "queries" (JSON objects preserve insertion order; we emit HEADLINE
    order), not per-query dicts — half the bytes at equal information;
  - per-rep timings and every diagnostic live in a SIDECAR file
    (docs/bench_reps_r{NN}.json, path echoed in the line as "detail");
  - _render_line() enforces a hard byte budget, degrading gracefully
    (name lists -> counts, then dropping delta/spread arrays — the sidecar
    always keeps the full versions) so the line can NEVER outgrow the
    driver's capture window. tests/test_bench_artifact.py pins the budget.

SENTINEL (round-6 regression diagnosis): round 6 flagged q33/q43 (+19-21%)
as regressions although no code they execute changed, alongside a block of
untouched relational queries drifting up 16-35% "in noise" — the artifact
could not separate machine/JVM-state drift from per-query regressions. The
suite now times a FIXED-COST engine-independent sentinel (sum over a 200M
spark.range — no files, no Python, plan identical every round) before and
after the headline loop. Its best time rides the printed line ("sentinel");
round-over-round sentinel drift measures session/machine overhead, and a
>15% query slowdown whose delta disappears after sentinel scaling is
classified "env_gt_15pct" (environment), not a regression.

IO SENTINEL (round-11, from the r10 regression postmortem): BENCH_r10
flagged q17/q30/q50 as REAL +17-24% regressions on a same-CPU-speed machine
(sentinel_ratio 1.015). The round-11 interleaved like-for-like A/B — r9
tree vs r10 tree alternating in ONE session, best-of-4, the q93 precedent
(tools/ab_bench.py; result in docs/bench_ab_r10_regressions.json) — showed
the code-attributable deltas were −1.8% / −4.8% / +2.2%: all three flags
were ENVIRONMENT, specifically a page-cache/IO dimension the pure-CPU range
sentinel is blind to (every query got monotonically faster across the
interleaved rounds as the cache warmed; the CPU sentinel moved 1.5%). The
suite therefore now also times an IO sentinel — a fixed full-column scan of
the largest fixture file ("sentinel_io" on the line) — and the taxonomy
classifies a slowdown as env when EITHER sentinel's scaling explains it.
The sidecar additionally records loadavg and /proc/meminfo page-cache state
so cross-session artifact comparisons carry their machine context.
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

# Printed-line byte budget: the driver keeps the last ~2048 chars of output;
# stay comfortably inside so the whole line (it is the LAST line) survives.
LINE_BYTE_BUDGET = 1900

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
    # round 9's q93 entry (contamination-elided text joined the gate) is
    # retired: BENCH_r09 and r10 both reflect the new scope (2.48s/2.41s,
    # delta negative), so the declaration served its purpose. Nothing is
    # declared for round 11 — the r10 flags (q17/q30/q50) were shown to be
    # environment by the interleaved A/B, not scope changes (see module
    # docstring, IO SENTINEL).
}

# Per-query EXTRA untimed warm-up reps on top of the global ``warmup``:
# q50's winnowing-HOF-heavy fused map kept paying a first-TIMED-rep cost
# the single global warm-up rep did not absorb (docs/bench_reps_r08.json:
# spread 0.668s vs 0.02-0.45s for every other query — a residual re-JIT).
# Ignored when warmup=0 (an explicit cold-timing run stays cold).
EXTRA_WARMUP: dict[str, int] = {"q50_text_suite": 2}

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


def _time_noop(build_df) -> float:
    """Time BUILD + EXECUTE: ``build_df`` is a thunk so that eager
    driver-side work inside query construction (q71's centroid
    fit/index build, DSIR's distribution collects) stays inside the
    timed window — rounds <= 6 timed construction too, and excluding it
    would both skew round-over-round deltas and hide regressions in
    eagerly-collected build work (round-7 review finding)."""
    t0 = time.perf_counter()
    build_df().write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _sentinel_df(spark):
    """Fixed-cost, engine-independent probe: 200M-row range sum, 32-way.

    No file I/O, no Python boundary, no dependence on any operator in this
    repo — its plan is byte-identical every round, so its timing moves only
    with JVM/codegen/machine state. That makes it the yardstick separating
    'the session is slower today' from 'this query's plan regressed'."""
    return spark.range(0, 200_000_000, 1, 32).selectExpr("sum(id % 7) AS s")


def _io_sentinel_df(spark, sf_dir: str):
    """Fixed IO-bound probe: full ALL-COLUMN scan of the largest fixture
    file (per-column count(col) forces every column to decode; no shuffle,
    near-zero CPU per value). Its plan is identical every round at a given
    sf, and its cost is dominated by parquet column IO + decompression, so
    its round-over-round ratio tracks the page-cache/disk dimension the CPU
    sentinel cannot see (the r10 postmortem: three queries flagged +17-24%
    "real" while the CPU sentinel read 1.015x — all environment under the
    interleaved A/B)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return df.agg(*[F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)])


def _machine_state() -> dict:
    """Loadavg + page-cache context for the sidecar — the machine state a
    cross-session artifact comparison needs to carry (round-10 verdict:
    committed sidecar vs driver run differed by more than within-run spread
    with no recorded explanation)."""
    state: dict = {}
    try:
        state["loadavg"] = list(os.getloadavg())
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            mem = dict(
                (k.strip(), v.strip())
                for k, _, v in (line.partition(":") for line in f)
            )
        for k in ("MemAvailable", "Cached", "Buffers"):
            if k in mem:
                state[f"meminfo_{k.lower()}"] = mem[k]
    except OSError:
        pass
    return state


def measure(spark, sf_dir: str, reps: int, warmup: int = 1):
    """Run sentinel + headline suite; return (timings, rep_times, sentinel).

    ``warmup`` untimed reps run per query before the timed ones (default 1;
    $SPARK_GRAFT_BENCH_WARMUP): the first execution of a query routinely
    costs 2-5x (codegen, page-cache fill, q71's one-time index build) and
    lands in the TIMED reps' spread, inflating the noise band that the
    regression taxonomy compares deltas against — round 7's q71 +1.5s scope
    cost hid inside a 12.4s first-rep spread exactly this way. The warm-up
    rep absorbs the one-time costs so the timed spread measures steady-state
    variance only; best-of-N semantics are unchanged (min already discarded
    the cold rep — the warm-up just keeps it out of the spread).

    ``sentinel`` = {"start": [...], "end": [...], "best": min-of-all,
    "io_start": [...], "io_end": [...], "io_best": ..., "machine": {...}} —
    both probes measured immediately before and immediately after the
    headline loop so in-session drift is visible too (the r10 postmortem's
    smoking gun was exactly start-vs-end sentinel asymmetry)."""
    n_probe = min(reps, 3)
    sent_start = [_time_noop(lambda: _sentinel_df(spark)) for _ in range(n_probe)]
    io_start = [_time_noop(lambda: _io_sentinel_df(spark, sf_dir)) for _ in range(n_probe)]
    machine = _machine_state()
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        n_warm = warmup + EXTRA_WARMUP.get(name, 0) if warmup > 0 else 0
        for _ in range(n_warm):
            _time_noop(lambda: fn(spark, sf_dir))
        ts = [_time_noop(lambda: fn(spark, sf_dir)) for _ in range(reps)]
        timings[name] = min(ts)
        rep_times[name] = ts
    sent_end = [_time_noop(lambda: _sentinel_df(spark)) for _ in range(n_probe)]
    io_end = [_time_noop(lambda: _io_sentinel_df(spark, sf_dir)) for _ in range(n_probe)]
    sentinel = {
        "start": sent_start,
        "end": sent_end,
        "best": min(sent_start + sent_end),
        "io_start": io_start,
        "io_end": io_end,
        "io_best": min(io_start + io_end),
        "machine": machine,
    }
    return timings, rep_times, sentinel


def build_output(timings, rep_times, sentinel, prev, sf, detail_path=None):
    """Assemble (printed-line dict, sidecar dict). Pure — unit-testable.

    Regression taxonomy for a >15% best-of-N slowdown vs the previous
    artifact (each query lands in exactly one bucket):
      - expected_regressions: declared scope changes (EXPECTED_REGRESSIONS);
      - env_gt_15pct: the slowdown vanishes once this round's times are
        rescaled by EITHER sentinel's ratio — CPU ("sentinel") or IO
        ("sentinel_io", round 11) — session/machine drift, not a plan
        change; requires both artifacts to carry that sentinel;
      - regressions_gt_15pct: absolute delta exceeds the measured rep
        spread of BOTH runs even after sentinel scaling — treat as real;
      - noise_gt_15pct: delta within the spread band — rep-to-rep noise.
    """
    total = round(sum(timings.values()), 3)
    spread = {q: round(max(ts) - min(ts), 3) for q, ts in rep_times.items()}
    out = {
        "metric": "headline_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # arrays aligned with the key order of "queries" (HEADLINE order);
        # dict forms live in the sidecar
        "spread": [spread[q] for q in timings],
        "sf": sf,
        "sentinel": sentinel["best"],
    }
    if sentinel.get("io_best") is not None:
        out["sentinel_io"] = sentinel["io_best"]
    sidecar = {
        "rep_times": rep_times,
        "spread_by_query": spread,
        "sentinel": sentinel,
        "headline_order": list(timings),
    }

    if prev is not None:
        prev_q = prev.get("queries", {})
        prev_spread = _spread_dict(prev)
        delta = {
            q: round((t - prev_q[q]) / prev_q[q], 3)
            for q, t in timings.items()
            if q in prev_q and prev_q[q] > 0
        }
        # null (not 0.0) for queries absent from the previous artifact —
        # a reader must be able to tell "new query, no baseline" from
        # "no change" (round-7 review finding)
        out["delta_vs_prev"] = [delta.get(q) for q in timings]
        sidecar["delta_by_query"] = delta
        # sentinel-based environment scaling (both rounds must carry one);
        # CPU and IO sentinels each contribute a candidate scaling ratio —
        # a slowdown EITHER explains is machine state, not a plan change
        env = None
        if sentinel["best"] > 0 and isinstance(prev.get("sentinel"), (int, float)):
            if prev["sentinel"] > 0:
                env = round(sentinel["best"] / prev["sentinel"], 3)
                out["sentinel_ratio_vs_prev"] = env
        env_io = None
        io_best = sentinel.get("io_best")
        if (
            isinstance(io_best, (int, float))
            and io_best > 0
            and isinstance(prev.get("sentinel_io"), (int, float))
            and prev["sentinel_io"] > 0
        ):
            env_io = round(io_best / prev["sentinel_io"], 3)
            out["sentinel_io_ratio_vs_prev"] = env_io
        ratios = [r for r in (env, env_io) if r is not None and r > 1.0]
        noise_band = {
            q: max(spread.get(q, 0.0), prev_spread.get(q, 0.0)) for q in delta
        }
        slow = {
            q: d for q, d in delta.items() if d > 0.15 and q not in EXPECTED_REGRESSIONS
        }
        env_cls, real, noise = [], [], []
        for q in sorted(slow):
            abs_delta = timings[q] - prev_q[q]
            if abs_delta <= noise_band[q]:
                noise.append(q)
            elif any(
                (timings[q] / r - prev_q[q]) <= noise_band[q] for r in ratios
            ):
                env_cls.append(q)
            else:
                real.append(q)
        out["regressions_gt_15pct"] = real
        if env_cls:
            out["env_gt_15pct"] = env_cls
        if noise:
            out["noise_gt_15pct"] = noise
        expected = {
            q: EXPECTED_REGRESSIONS[q]
            for q, d in delta.items()
            if d > 0.15 and q in EXPECTED_REGRESSIONS
        }
        if expected:
            out["expected_regressions"] = expected
        sidecar["classification"] = {
            "regressions_gt_15pct": real,
            "env_gt_15pct": env_cls,
            "noise_gt_15pct": noise,
            "noise_band": noise_band,
            "sentinel_ratio_vs_prev": env,
            "sentinel_io_ratio_vs_prev": env_io,
        }
    if detail_path:
        out["detail"] = detail_path
    return out, sidecar


def _render_line(out: dict, budget: int = LINE_BYTE_BUDGET) -> str:
    """Serialize the printed line, degrading gracefully under ``budget``.

    Trim order (information the sidecar always retains in full):
    name lists -> counts, then drop delta_vs_prev, then spread. The final
    fallback (never reachable with <=40 headline queries) drops detail."""
    out = dict(out)
    line = json.dumps(out)
    for key in ("noise_gt_15pct", "env_gt_15pct", "regressions_gt_15pct"):
        if len(line) <= budget:
            break
        if isinstance(out.get(key), list):
            out[key + "_n"] = len(out.pop(key))
            line = json.dumps(out)
    for key in ("delta_vs_prev", "spread", "detail"):
        if len(line) <= budget:
            break
        out.pop(key, None)
        line = json.dumps(out)
    return line


def _spread_dict(prev: dict) -> dict:
    """Per-query spread from a previous artifact, whichever form it used:
    round-6 wrote a dict; round-7+ writes an array aligned to "queries"."""
    s = prev.get("spread")
    if isinstance(s, dict):
        return s
    if isinstance(s, list):
        return dict(zip(prev.get("queries", {}), s))
    return {}


def _latest_prev_bench() -> dict | None:
    """Newest readable BENCH_r*.json record next to this script.

    An artifact whose "parsed" is null (round 6's line overran the driver's
    capture window) is represented by its offline reconstruction
    (docs/bench_rNN_reconstructed.json, rebuilt from the previous round's
    record and the intact delta_vs_prev in the truncated tail); artifacts
    with neither are skipped."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    # sort by the PARSED round number, not the raw path: lexicographic order
    # breaks when the round count gains a digit (BENCH_r99 > BENCH_r100)
    paths = sorted(
        glob.glob(os.path.join(here, "BENCH_r*.json")),
        key=lambda p: (
            int(m.group(1)) if (m := re.search(r"BENCH_r(\d+)\.json$", p)) else -1
        ),
        reverse=True,
    )
    for path in paths:
        try:
            with open(path) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = d.get("parsed", d if "queries" in d else None)
        if parsed is not None:
            return parsed
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rec = os.path.join(
                here, "docs", f"bench_r{m.group(1)}_reconstructed.json"
            )
            try:
                with open(rec) as f:
                    return json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
    return None


def _next_round() -> int:
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


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
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    timings, rep_times, sentinel = measure(spark, sf_dir, reps, warmup=warmup)

    here = os.path.dirname(os.path.abspath(__file__))
    # the bare round-numbered sidecar is the DRIVER's artifact (always an
    # sf0.1 run); ad-hoc runs at another sf get an sf-suffixed name so a
    # local sf0.01 smoke can never clobber the official record
    sf_tag = "" if sf == 0.1 else f"_sf{sf:g}"
    detail_rel = f"docs/bench_reps_r{_next_round():02d}{sf_tag}.json"
    # Never clobber an existing (typically committed) round sidecar: later
    # runs in the same round land on a +timestamped name that .gitignore
    # hides, so an ad-hoc or driver bench run leaves the tree clean (the
    # r11 driver run overwrote the committed bench_reps_r11.json — VERDICT
    # item 7). The canonical name is only taken by the FIRST run of a
    # round; the round's official sidecar is committed deliberately.
    if os.path.exists(os.path.join(here, detail_rel)):
        detail_rel = (
            f"docs/bench_reps_r{_next_round():02d}{sf_tag}"
            f"+{time.strftime('%Y%m%dT%H%M%S')}.{os.getpid()}.json"
        )
    out, sidecar = build_output(
        timings, rep_times, sentinel, _latest_prev_bench(), sf, detail_path=detail_rel
    )
    line = _render_line(out)
    sidecar["printed_line"] = line
    sidecar["line_bytes"] = len(line)
    try:
        os.makedirs(os.path.join(here, "docs"), exist_ok=True)
        with open(os.path.join(here, detail_rel), "w") as f:
            json.dump(sidecar, f, indent=1)
    except OSError:
        pass  # the printed line must still go out even if docs/ is unwritable
    print(line)


if __name__ == "__main__":
    main()

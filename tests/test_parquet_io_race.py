"""Two-process chaos test for the ns→µs conversion rename race
(sources/parquet_io.py::_ensure_us_copy).

Two OS processes — each with its own SparkSession and a SHARED fresh
TMPDIR — hit ``read_parquet_any`` on the same INT64 TIMESTAMP(NANOS)
parquet at the same moment (a file-based barrier makes the overlap
deterministic, JVM startup jitter notwithstanding). The loser's
``os.rename(tmp, dest)`` must fail (dest exists, non-empty dir), fall
back to the winner's copy, and clean up its tmp dir. Required outcome:

- both processes read IDENTICAL rows (count + order-insensitive hash);
- exactly ONE converted copy survives in the cache root;
- no orphaned ``*.tmp-*`` directories remain.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

N_ROWS = 10_000

READER = r"""
import glob, json, os, sys, time
sys.path.insert(0, __REPO__)
src, barrier_dir, who = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"us-race-{who}")
    .config("spark.driver.memory", "1g")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("FATAL")
# barrier: announce readiness, then wait for the parent's GO flag so both
# processes enter the conversion simultaneously
open(os.path.join(barrier_dir, f"ready-{who}"), "w").close()
while not os.path.exists(os.path.join(barrier_dir, "go")):
    time.sleep(0.01)
from entangledb_spark.sources.parquet_io import read_parquet_any
df = read_parquet_any(spark, src)
row = df.selectExpr(
    "count(*) AS n",
    "bit_xor(xxhash64(event_id, cast(ts AS string), value)) AS h",
    "min(cast(ts AS string)) AS lo",
    "max(cast(ts AS string)) AS hi",
).collect()[0]
print(json.dumps({"n": row.n, "h": row.h, "lo": row.lo, "hi": row.hi}))
"""


def test_two_process_us_conversion_race(tmp_path):
    import entangledb_spark

    repo_root = entangledb_spark.__file__.rsplit("/entangledb_spark/", 1)[0]
    # synthesize an INT64 TIMESTAMP(NANOS) parquet (fixtures are µs now)
    src = str(tmp_path / "events_ns.parquet")
    ns = pa.array(
        [1_700_000_000_000_000_000 + i * 1_003_000_007 for i in range(N_ROWS)],
        type=pa.timestamp("ns"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(N_ROWS), type=pa.int64()),
                "ts": ns,
                "value": pa.array([i / 7.0 for i in range(N_ROWS)]),
            }
        ),
        src,
    )
    cache_root = tmp_path / "tmpdir"
    barrier = tmp_path / "barrier"
    cache_root.mkdir(), barrier.mkdir()
    env = {**os.environ, "TMPDIR": str(cache_root)}
    script = READER.replace("__REPO__", repr(repo_root))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, src, str(barrier), who],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            env=env,
        )
        for who in ("a", "b")
    ]
    # release both once both JVMs are up
    deadline = time.time() + 120
    while time.time() < deadline and not all(
        (barrier / f"ready-{w}").exists() for w in ("a", "b")
    ):
        time.sleep(0.05)
    (barrier / "go").touch()
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        assert p.returncode == 0, out
        results.append(json.loads(out.strip().splitlines()[-1]))

    # both processes saw identical, µs-exact data
    assert results[0] == results[1]
    assert results[0]["n"] == N_ROWS
    # ns→µs truncation: 1_700_000_000_000_000_000 ns == 2023-11-14T22:13:20
    assert results[0]["lo"].startswith("2023-11-14 22:13:20")

    # exactly one surviving conversion, no orphaned tmp dirs
    cache = cache_root / "entangledb-us-cache"
    entries = sorted(os.listdir(cache))
    assert len(entries) == 1, entries
    assert not entries[0].count(".tmp-"), entries
    assert (cache / entries[0] / "_SUCCESS").exists()

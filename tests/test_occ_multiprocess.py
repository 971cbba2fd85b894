"""Multi-process OCC stress test for the CURRENT-pointer commit protocol
(reference resumes transactions across nodes via src/storage/mvcc.rs:
124-127; our analog is the manifest CAS — creating v{N}.json atomically).

Two OS processes race commits against the same catalog directory. Every
process must eventually win each of its commits exactly once, the won
versions must form a disjoint cover of 1..N, and no manifest may be lost
or overwritten. No SparkSession involved — the commit protocol is pure
filesystem, which is exactly what runs on the metastore at cluster scale.
"""

from __future__ import annotations

import json
import subprocess
import sys

COMMITS_PER_WRITER = 25
N_WRITERS = 3

WRITER = r"""
import json, random, sys, time
sys.path.insert(0, __REPO__)
from entangledb_spark.sources.catalog import ConflictError, SnapshotCatalog

base, writer_id, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
cat = SnapshotCatalog(None, base)  # publish/manifest never touch Spark
won = []
for i in range(n):
    while True:
        v0 = cat.current_version()
        m = cat.manifest(v0)
        m["tables"][f"t_{writer_id}_{i}"] = {"columns": [], "data": None}
        try:
            won.append(cat.publish(m, expected_version=v0))
            break
        except ConflictError:
            time.sleep(random.random() * 0.005)  # backoff, re-read, retry
print(json.dumps(won))
"""


def test_two_process_commit_race(tmp_path):
    import entangledb_spark

    repo_root = entangledb_spark.__file__.rsplit("/entangledb_spark/", 1)[0]
    base = str(tmp_path / "db")
    # parent initializes the catalog dir once (v0)
    from entangledb_spark.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(None, base)
    script = WRITER.replace("__REPO__", repr(repo_root))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, base, f"w{i}", str(COMMITS_PER_WRITER)],
            stdout=subprocess.PIPE,
            text=True,
        )
        for i in range(N_WRITERS)
    ]
    wins: list[list[int]] = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        wins.append(json.loads(out))

    total = N_WRITERS * COMMITS_PER_WRITER
    all_wins = [v for w in wins for v in w]
    # every version won exactly once, covering 1..total with no gaps/dupes
    assert sorted(all_wins) == list(range(1, total + 1))
    assert cat.current_version() == total
    # no lost updates: the final manifest contains every writer's tables
    final = cat.manifest(total)
    for i in range(N_WRITERS):
        for j in range(COMMITS_PER_WRITER):
            assert f"t_w{i}_{j}" in final["tables"], f"lost update t_w{i}_{j}"

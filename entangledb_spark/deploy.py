"""Ship the package to executor Python workers.

Any operator that cloudpickles a module-level function (mapInPandas,
applyInPandasWithState) serializes it BY REFERENCE to this package — so the
worker interpreter must be able to `import entangledb_spark`. That holds
when the driver runs from the repo root, but not from an arbitrary cwd (and
on a real cluster, not at all unless the package is installed on every
node). `ensure_shipped` zips the package once per SparkContext and
distributes it with addPyFile — the same mechanism spark-submit --py-files
uses, working identically in local mode and on a 1000-executor cluster.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_entangledb_spark_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, zip_path = tempfile.mkstemp(prefix="entangledb_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "entangledb_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _FLAG, True)

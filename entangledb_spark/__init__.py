"""entangledb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TypicalDefender/entangleDB.

The reference (/root/reference, Rust) is a toy distributed SQL database:
SQL session layer over a Raft-replicated MVCC key/value store. This package
re-expresses its *query semantics* (see SURVEY.md §1-§4) Spark-first:

- the SQL dialect front-end (``plans/``: lexer → parser → AST → planner)
  compiles onto the DataFrame API so Catalyst owns all optimization
  (predicate pushdown, column pruning, join selection — SURVEY §4.1 maps
  every reference optimizer rule to a built-in Catalyst rule);
- storage is snapshot-versioned Parquet (``sources/``), which gives both
  transactional DML (INSERT/UPDATE/DELETE publish a new version) and
  ``AS OF SYSTEM TIME n`` time travel, replacing the reference's MVCC
  (/root/reference/src/storage/mvcc.rs);
- constraints (PK/UNIQUE/FK/NOT NULL/1024-byte strings —
  /root/reference/src/sql/schema.rs:138-156) are enforced as distributed
  validation passes in the writer path (``constraints.py``);
- beyond-parity training-data-pipeline operators live in ``operators/``
  (dedup, similarity search, text analysis, multimodal) and
  ``streaming/`` (Structured Streaming over the events table).

Everything here is built on public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

from entangledb_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"

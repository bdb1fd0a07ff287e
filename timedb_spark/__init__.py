"""timedb_spark — a PySpark-native engine with the query and
data-processing capabilities of rebase-energy/timedb.

The reference (timedb) is a stateless ClickHouse client for 3-dimensional
time series (valid_time / knowledge_time / change_time). This package
re-expresses the same data model and query semantics Spark-first:

- bitemporal reads as declarative DataFrame transforms (Catalyst-optimized,
  partial-aggregable ``max_by`` instead of engine-specific ``argMax``);
- an append-only partitioned-parquet store mirroring the reference's
  ``(retention, month(valid_time))`` partitioning and TTL semantics;
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) built on the same engine.

Reference parity map: see SURVEY.md §2; per-function docstrings cite
reference file:line.
"""

from timedb_spark.client import TimeDB, WriteResult
from timedb_spark.schema import RETENTION_TIERS
from timedb_spark.session import get_spark

__all__ = ["RETENTION_TIERS", "TimeDB", "WriteResult", "get_spark"]

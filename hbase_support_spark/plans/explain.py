"""Plan inspection helpers — the 'did Catalyst do what we designed
for' feedback loop (SURVEY.md §4).

Used by tests/test_plans.py to assert the physical properties the
100-TB design depends on: filters pushed to the Parquet scan, columns
pruned, broadcast joins where dims are small, whole-stage codegen
coverage, and absence of accidental cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> bool:
    """True if the scan node reports a non-empty PushedFilters list."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and "[]" not in line.split("PushedFilters", 1)[1][:4]:
            return True
    return False


def read_schema_columns(df: DataFrame, table_hint: str | None = None) -> list[str]:
    """Column names in the (first matching) Parquet ReadSchema —
    verifies column pruning reached the reader."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and (table_hint is None or table_hint in plan):
            schema = line.split("ReadSchema:", 1)[1].strip()
            inner = schema[schema.find("<") + 1 : schema.rfind(">")]
            return [f.split(":")[0] for f in inner.split(",") if f]
    return []


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_cartesian(df: DataFrame) -> bool:
    return "CartesianProduct" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans in the *executed* plan (AQE only
    finalizes stages — and their codegen markers — at runtime, and
    only on the exact plan tree that ran, hence collect() on df)."""
    df.collect()
    tree = df._jdf.queryExecution().executedPlan().toString()
    # '*(N) ' prefixes mark operators fused into codegen stage N
    stages = {
        line.split("*(", 1)[1].split(")", 1)[0]
        for line in tree.splitlines()
        if "*(" in line
    }
    return len(stages)

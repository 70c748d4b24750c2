"""Plan-audit helpers: turn `.explain("formatted")` into assertions.

Used by tests/test_plans.py to pin the physical properties the 100 TB
design point depends on: filters pushed to the parquet scan, column
pruning before Arrow boundaries, broadcast joins for small dims, and
no Exchange in the narrow extract path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_exchange(df: DataFrame) -> bool:
    return "Exchange" in physical_plan(df)


def broadcast_join_count(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters: [...] section(s) of the scan nodes."""
    plan = physical_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "PushedFilters" in l)


def read_schema(df: DataFrame) -> str:
    plan = physical_plan(df)
    return "\n".join(l.strip() for l in plan.splitlines() if "ReadSchema" in l)


def whole_stage_codegen_subtrees(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (explain mode 'codegen';
    the AQE 'formatted' plan hides codegen annotations pre-execution)."""
    import re

    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0

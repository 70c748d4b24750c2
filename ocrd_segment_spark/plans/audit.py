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


def unpartitioned_window_inputs(df: DataFrame) -> list[str]:
    """The 'Input [...]' line of every Window node WITHOUT a partition
    spec (= a single-partition global sort of its input). In the
    formatted plan a partitioned Window's Arguments carries three
    bracketed lists ([functions], [partition], [order]); a global one
    only two. Scale audits assert that any such window's input is a
    bounded side (vocabulary / per-bucket counts), never the corpus."""
    import re

    lines = physical_plan(df).splitlines()
    out = []
    for i, line in enumerate(lines):
        # anchor the node name: "(5) WindowGroupLimit" (the Spark 4
        # partial-top-k node a rank<=k filter compiles to) also starts
        # with "Window" but has a two-list Arguments shape that would
        # false-positive as a global window
        if re.match(r"\(\d+\) (Window|WindowInPandas)$", line.strip()):
            inp = args = ""
            for j in range(i + 1, min(i + 6, len(lines))):
                s = lines[j].strip()
                if s.startswith("Input"):
                    inp = s
                elif s.startswith("Arguments"):
                    args = s
            if len(re.findall(r"\], \[", args)) < 2:
                out.append(inp)
    return out


def whole_stage_codegen_subtrees(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (explain mode 'codegen';
    the AQE 'formatted' plan hides codegen annotations pre-execution)."""
    import re

    plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange NODES. The formatted plan mentions each node
    twice (tree line + detail header) — counting the detail headers
    counts nodes exactly once."""
    import re

    return len(
        re.findall(r"^\(\d+\) Exchange", physical_plan(df), flags=re.M)
    )

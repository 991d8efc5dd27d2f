"""Physical-plan quality assertions.

The reference has no planner (SURVEY.md §4); on Spark the plan IS the
performance contract, so tests assert plan *shape*, not just results:
shuffle counts (every Exchange is a full network pass over 100 TB),
scan-level column pruning, and where the Python boundary sits.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan
    (AQE may later coalesce them, but each is a logical full shuffle).
    Broadcast exchanges are excluded — they ship only the small side.
    Counts formatted-mode detail headers so tree lines aren't
    double-counted; `BroadcastExchange` is a distinct operator name and
    never matches."""
    plan = physical_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, re.MULTILINE))


def udf_stage_count(df: DataFrame) -> int:
    """Number of Python/Arrow evaluation operators. The extraction job
    must have exactly one (the fused sniff→route→extract batch UDF)."""
    plan = physical_plan(df)
    return len(
        re.findall(
            r"^\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas)\b",
            plan,
            re.MULTILINE,
        )
    )


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read at the (first) parquet scan — verifies
    column pruning reached the source (ReadSchema in the plan)."""
    plan = physical_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    cols = []
    for field in m.group(1).split(","):
        name = field.split(":")[0].strip()
        if name:
            cols.append(name)
    return cols

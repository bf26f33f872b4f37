"""Physical-plan inspection helpers — the feedback loop for the
scale-first rules (pushdown reached the scan? join broadcast? codegen
span wide?). Used by tests and the bench's plan-hygiene checks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node in the plan."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def has_broadcast_join(df: DataFrame) -> bool:
    text = explain_str(df)
    return "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # codegen'd operators print as `*(n) Op` in simple mode; under AQE
    # the static simple plan hides them, but formatted mode tags nodes
    # with `[codegen id : n]`
    simple = explain_str(df, "simple")
    if re.search(r"\*\(\d+\)", simple) or "WholeStageCodegen" in simple:
        return True
    return "codegen id" in explain_str(df, "formatted")

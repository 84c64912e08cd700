"""Plan introspection helpers used by tests and tuning loops."""

from __future__ import annotations

from ..core import DataFrame


def _executed(df: DataFrame) -> str:
    return df.df._jdf.queryExecution().executedPlan().toString()


def plan_summary(df: DataFrame) -> dict:
    """Counts of the plan features we tune for."""
    plan = _executed(df)
    final = plan.split("== Initial Plan ==")[0]
    return {
        "shuffles": final.count("Exchange hashpartitioning")
        + final.count("Exchange rangepartitioning"),
        "broadcast_joins": final.count("BroadcastHashJoin"),
        "sort_merge_joins": final.count("SortMergeJoin"),
        "python_stages": final.count("EvalPython"),
        "has_pushed_filters": "PushedFilters: [" in final
        and "PushedFilters: []" not in final,
    }


def assert_pushdown(df: DataFrame, column: str):
    plan = _executed(df)
    if f"({column}" not in plan.split("PushedFilters")[-1]:
        raise AssertionError(
            f"filter on {column} not pushed to scan:\n{plan[-2000:]}"
        )

from .hints import broadcast_small, repartition_by, salt_skewed_join
from .explain import plan_summary, assert_pushdown

__all__ = [
    "broadcast_small",
    "repartition_by",
    "salt_skewed_join",
    "plan_summary",
    "assert_pushdown",
]

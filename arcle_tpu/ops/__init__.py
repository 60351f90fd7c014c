from .groups import G, OBJ, precompute_selection, answers_match
from .table import (
    OpTable, raw_table, arc_table, o2arc_table,
    transition, transition_deferred, step, step_deferred, finish_flood,
    dense_reward,
)

__all__ = [
    "G", "OBJ", "precompute_selection", "answers_match",
    "OpTable", "raw_table", "arc_table", "o2arc_table",
    "transition", "step", "dense_reward",
]

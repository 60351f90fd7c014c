from .state import EnvState, Action, init_state, empty_state, make_action
from .geometry import (
    bbox, inside_dims, shift2d, window_mask, place_patch,
    bbox_selection, point_selection, row_col_iota,
)
from .floodfill import connected_component, flood_region

__all__ = [
    "EnvState", "Action", "init_state", "empty_state", "make_action",
    "bbox", "inside_dims", "shift2d", "window_mask", "place_patch",
    "bbox_selection", "point_selection", "row_col_iota",
    "connected_component", "flood_region",
]

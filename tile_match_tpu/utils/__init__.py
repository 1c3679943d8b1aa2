"""Analysis & debug utilities."""

from .state_counts import compute_num_states, is_valid_states, get_tabular_obs
from .print_board_diffs import format_boards, highlight_board_diff

__all__ = [
    "compute_num_states",
    "is_valid_states",
    "get_tabular_obs",
    "format_boards",
    "highlight_board_diff",
]

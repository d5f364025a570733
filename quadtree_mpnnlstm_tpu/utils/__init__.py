from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding
from quadtree_mpnnlstm_tpu.utils.dates import int_to_datetime, round_to_day, day_of_year
from quadtree_mpnnlstm_tpu.utils.params import get_n_params

__all__ = [
    "add_positional_encoding",
    "int_to_datetime",
    "round_to_day",
    "day_of_year",
    "get_n_params",
]

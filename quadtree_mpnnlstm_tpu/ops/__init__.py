from quadtree_mpnnlstm_tpu.ops.segment import (
    segment_sum_nodes,
    scatter_to_dst,
    edge_softmax,
    safe_div,
)

__all__ = [
    "segment_sum_nodes",
    "scatter_to_dst",
    "edge_softmax",
    "safe_div",
]

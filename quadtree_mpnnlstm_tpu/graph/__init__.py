from quadtree_mpnnlstm_tpu.graph.state import GraphTensors, flatten, unflatten
from quadtree_mpnnlstm_tpu.graph.quadtree import decompose_levels, pixel_nodes_from_levels
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph, pixelwise_graph
from quadtree_mpnnlstm_tpu.graph.static import (
    create_static_heterogeneous_graph,
    create_static_homogeneous_graph,
)

__all__ = [
    "GraphTensors",
    "flatten",
    "unflatten",
    "decompose_levels",
    "pixel_nodes_from_levels",
    "image_to_graph",
    "pixelwise_graph",
    "create_static_heterogeneous_graph",
    "create_static_homogeneous_graph",
]

"""quadtree_mpnnlstm_tpu — TPU-native re-build of Quadtree-MPNNLSTM.

A JAX / XLA / Pallas framework for spatiotemporal forecasting on adaptive
quadtree meshes: each image is decomposed into a variable-resolution graph,
a graph-convolutional LSTM seq2seq rolls the field forward, with optional
per-step remeshing — all as one statically-shaped jit-compiled program.

Capability parity target: zach-gousseau/Quadtree-MPNNLSTM (see SURVEY.md).
Design is TPU-first (static padded graph capacities, segment-sum message
passing, lax.scan recurrence, shard_map data parallelism); it is NOT a
translation of the reference's torch/PyG code.
"""

__version__ = "0.1.0"

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig, TrainConfig

__all__ = [
    "GraphConfig",
    "ModelConfig",
    "TrainConfig",
    "__version__",
]

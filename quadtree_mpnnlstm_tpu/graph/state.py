"""Padded, statically-shaped graph state.

The reference stores the mesh as a PyG ``Data`` plus a dense N×P pixel↔node
matrix rebuilt on the host each remesh (ref: model/graph_functions.py:23-33,
:555-587, :636). On TPU that dense matmul and the host round-trip are the two
big sins. Here the mesh is a pytree of fixed-capacity arrays:

* ``pixel_node`` — int32 (P,) node id per pixel; ``n_max`` is the invalid
  sentinel. This replaces the sparse/dense mapping matrix.
* ``counts`` — pixels per node (the reference's ``n_pixels_per_node``).
* edge list padded to ``e_max`` with a validity mask, sorted by destination
  so segment reductions can assert sorted indices.

``flatten`` (pixel→node mean pooling, ref: graph_functions.py:391-419)
becomes a single ``segment_sum``; ``unflatten`` (node→pixel scatter,
ref: graph_functions.py:451-468) becomes a gather. Both are differentiable,
NaN-free even in padded lanes, and shape-static so they can live inside
``lax.scan`` bodies (per-step remeshing).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GraphTensors:
    """Fixed-capacity graph: node mapping + adjacency (+ optional node data)."""

    # -- pixel <-> node mapping ---------------------------------------------
    pixel_node: jnp.ndarray  # (P,) int32 in [0, n_max]; n_max = invalid
    counts: jnp.ndarray      # (n_max,) float32 pixels per node (0 for padding)
    n_nodes: jnp.ndarray     # () int32 true node count (may exceed n_max => overflow)
    node_valid: jnp.ndarray  # (n_max,) bool

    # -- adjacency ------------------------------------------------------------
    edge_src: jnp.ndarray    # (e_max,) int32 (sentinel n_max where invalid)
    edge_dst: jnp.ndarray    # (e_max,) int32, sorted ascending incl. sentinels
    edge_valid: jnp.ndarray  # (e_max,) bool
    edge_attr: jnp.ndarray   # (e_max, edge_dim) float32, zero where invalid
    n_edges: jnp.ndarray     # () int32

    # -- geometry --------------------------------------------------------------
    node_xy: jnp.ndarray     # (n_max, 2) physical (x, y) of node centroids

    # -- source-sorted edge view (for scatter-free gather adjoints) ----------
    src_perm: jnp.ndarray    # (e_max,) int32 permutation sorting edges by src
    src_sorted: jnp.ndarray  # (e_max,) int32 src ids in sorted order

    # cached D^{-1/2} A D^{-1/2} coefficient per edge (graph-constant; used
    # by every GCN/Cheb conv — recomputing it per conv cost ~20% of a train
    # step on the v5e profile)
    sym_coeff: jnp.ndarray = None  # (e_max,)

    # capacity-overflow counter: nodes past n_max + edges past e_max +
    # SpMM window misses (exact zero when nothing was dropped). Surfaced
    # so undersized caps degrade loudly, not silently.
    overflow: jnp.ndarray = None  # () int32

    # per-node-tile windows for the fused Pallas SpMM (ops/pallas_spmm.py);
    # built when the config selects aggregation="pallas"
    agg_meta: jnp.ndarray = None  # (T, 2) int32

    # per-tile attention windows for the fused Pallas attention kernel
    # (ops/pallas_attn.py); built when aggregation="pallas" and the config
    # requests attention windows (attn_windows=True)
    attn_meta: jnp.ndarray = None

    # per-direction D^{-1/2}AD^{-1/2} stencil planes for the dense grid
    # backend (ops/grid.py); built when aggregation="grid" (pixelwise only)
    grid_coeff: jnp.ndarray = None  # (D, rows, cols) f32
    # per-direction constant (bearing, distance) edge attributes for the
    # grid backend's attention convs (every direction-d edge is identical)
    grid_attr: jnp.ndarray = None   # (D, edge_dim) f32

    # static per-node degree cap enabling CSR reductions; 0 disables
    max_degree: int = struct.field(pytree_node=False, default=0)

    # static aggregation backend descriptor: (name, nt, eb, sw)
    agg: tuple = struct.field(pytree_node=False, default=("xla", 0, 0, 0))

    # static dtype for aggregation message payloads ("float32"/"bfloat16")
    msg_dtype: str = struct.field(pytree_node=False, default="float32")

    # identity pixel↔node mapping (node id = raster pixel index, masked
    # pixels invalid): flatten/unflatten become reshapes (grid backend)
    mapping_identity: bool = struct.field(pytree_node=False, default=False)

    # grid backend: route attention convs through the fused Pallas stencil
    # kernel (ops/pallas_grid_attn.py) instead of the XLA shift/softmax
    # chain (GraphConfig.grid_attn)
    grid_attn_fused: bool = struct.field(pytree_node=False, default=False)

    @property
    def n_max(self) -> int:
        return self.counts.shape[0]

    @property
    def num_pixels(self) -> int:
        return self.pixel_node.shape[0]

    @property
    def e_max(self) -> int:
        return self.edge_src.shape[0]


def flatten(img: jnp.ndarray, graph: GraphTensors) -> jnp.ndarray:
    """Pixel→node mean pooling.

    Args:
      img: (T, rows, cols, C) image stack.
      graph: mesh with P = rows*cols pixels.
    Returns:
      (T, n_max, C) node features; padded node rows are exactly zero.

    Parity: ref graph_functions.py:391-419 (``img @ mapping.T /
    n_pixels_per_node`` dense matmul) — same means, computed as one
    segment-sum over pixels. Masked pixels carry the sentinel id and fall
    into a discard bucket.
    """
    from quadtree_mpnnlstm_tpu.ops.segment import _use_pallas, pallas_segment_sum

    t, rows, cols, c = img.shape
    p = rows * cols
    n_max = graph.n_max
    if graph.mapping_identity:
        # identity mapping: each valid node IS its pixel (counts = 1) —
        # pooling is a reshape + mask, no segment reduction
        flat = img.reshape(t, p, c)
        return jnp.where(graph.node_valid[None, :, None], flat,
                         jnp.zeros((), img.dtype))
    flat = img.reshape(t, p, c).transpose(1, 0, 2).reshape(p, t * c)
    if _use_pallas():
        summed = pallas_segment_sum(flat, graph.pixel_node, n_max)
    else:
        summed = jax.ops.segment_sum(
            flat, graph.pixel_node, num_segments=n_max + 1
        )[:n_max]
    # divide in the promoted dtype (counts are f32), return in img's dtype so
    # a bfloat16 compute region is not silently upcast
    mean = (summed / jnp.maximum(graph.counts, 1.0)[:, None]).astype(img.dtype)
    return mean.reshape(n_max, t, c).transpose(1, 0, 2)


def unflatten(
    data: jnp.ndarray,
    graph: GraphTensors,
    image_shape: Tuple[int, int],
    fill: float = 0.0,
) -> jnp.ndarray:
    """Node→pixel scatter: paint each pixel with its node's value.

    Args:
      data: (..., n_max, C) node features.
      image_shape: (rows, cols).
      fill: value for invalid (masked) pixels. The reference's dense-matmul
        path writes 0 there, the pixelwise path writes NaN
        (ref: graph_functions.py:451-468); default matches the former.
    Returns:
      (..., rows, cols, C).
    """
    rows, cols = image_shape
    n_max = data.shape[-2]
    if graph.mapping_identity:
        img = jnp.where(
            graph.node_valid[:, None], data, jnp.asarray(fill, data.dtype)
        )
        return img.reshape(data.shape[:-2] + (rows, cols, data.shape[-1]))
    # clamp-gather + mask instead of concatenating a sentinel row: the
    # concat materialises a full copy of ``data`` per call (measured ~10%
    # of the decoder-scan DMA time when unflattening H/C every remesh)
    idx = jnp.minimum(graph.pixel_node, n_max - 1)
    img = jnp.take(data, idx, axis=-2)
    valid = (graph.pixel_node < n_max)[:, None]
    img = jnp.where(valid, img, jnp.asarray(fill, data.dtype))
    return img.reshape(data.shape[:-2] + (rows, cols, data.shape[-1]))


def flatten_nb(img: jnp.ndarray, graph: GraphTensors) -> jnp.ndarray:
    """Pixel→node mean pooling in the batch-middle node layout.

    Args:
      img: (rows, cols, B, C) — batch rides *between* the pixel grid and the
        feature axis, so the node axis stays axis 0 downstream (the layout
        shared-mesh batched training keeps every node tensor in; see
        models/seq2seq.py batched paths).
    Returns:
      (n_max, B, C) node features; padded node rows are exactly zero.
    """
    rows, cols, b, c = img.shape
    p = rows * cols
    n_max = graph.n_max
    flat = img.reshape(p, b, c)
    if graph.mapping_identity:
        return jnp.where(graph.node_valid[:, None, None], flat,
                         jnp.zeros((), img.dtype))
    summed = jax.ops.segment_sum(
        flat.reshape(p, b * c), graph.pixel_node, num_segments=n_max + 1
    )[:n_max]
    mean = (summed / jnp.maximum(graph.counts, 1.0)[:, None]).astype(img.dtype)
    return mean.reshape(n_max, b, c)


def unflatten_nb(
    data: jnp.ndarray,
    graph: GraphTensors,
    image_shape: Tuple[int, int],
    fill: float = 0.0,
) -> jnp.ndarray:
    """Node→pixel scatter for batch-middle node tensors.

    Args:
      data: (n_max, B, C) node features (node axis 0 — the shared-mesh
        batched layout; :func:`unflatten` gathers along axis -2 instead).
    Returns:
      (rows, cols, B, C).
    """
    rows, cols = image_shape
    n_max = data.shape[0]
    b, c = data.shape[1], data.shape[2]
    if graph.mapping_identity:
        img = jnp.where(
            graph.node_valid[:, None, None], data,
            jnp.asarray(fill, data.dtype),
        )
        return img.reshape(rows, cols, b, c)
    idx = jnp.minimum(graph.pixel_node, n_max - 1)
    img = jnp.take(data, idx, axis=0)
    valid = (graph.pixel_node < n_max)[:, None, None]
    img = jnp.where(valid, img, jnp.asarray(fill, data.dtype))
    return img.reshape(rows, cols, b, c)


def grouped_mean(arr: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Label-wise means of a 1-D array; -1 labels are excluded.

    Parity: ref graph_functions.py:421-441 (bincount formulation). Output
    length is ``max_label + 1`` inferred statically from the label dtype
    range — callers pass ``num_groups`` via :func:`grouped_mean_n` when the
    group count is known (required under jit)."""
    labels = jnp.asarray(labels)
    n = int(labels.max()) + 1  # concrete only outside jit (parity helper)
    return grouped_mean_n(arr, labels, n)


def grouped_mean_n(arr: jnp.ndarray, labels: jnp.ndarray, num_groups: int):
    """jit-safe grouped mean with a static group count."""
    from quadtree_mpnnlstm_tpu.ops.segment import safe_div, segment_sum_nodes

    labels = jnp.where(labels < 0, num_groups, labels)
    sums = segment_sum_nodes(arr.astype(jnp.float32), labels, num_groups)
    cnts = segment_sum_nodes(jnp.ones_like(arr, jnp.float32), labels, num_groups)
    return safe_div(sums, cnts)


def grouped_mean_along_axis_2d(arr, labels, axes):
    """Apply :func:`grouped_mean` along two axes (ref graph_functions.py:444-448)."""
    import numpy as np

    a = np.apply_along_axis(
        lambda v: np.asarray(grouped_mean(v, labels)), axes[0], np.asarray(arr)
    )
    return np.apply_along_axis(
        lambda v: np.asarray(grouped_mean(v, labels)), axes[1], a
    )

"""Preset (static) meshes built once at startup.

Parity: ref model/graph_functions.py:683-737. These run a single jit'd build
on device and are reused every sample (ref call site: ice_exp.py:127-130 →
seq2seq.py:288-294).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph.adjacency import edge_attributes, source_sorted_view
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.state import GraphTensors
from quadtree_mpnnlstm_tpu.ops.segment import segment_sum_nodes
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def create_static_heterogeneous_graph(
    cfg: GraphConfig,
    mask: Optional[jnp.ndarray] = None,
    high_interest_region: Optional[jnp.ndarray] = None,
) -> GraphTensors:
    """Fixed mesh, denser near mask/HIR boundaries.

    Quadtree with ``thresh=+inf`` on a zero image: cells split only where
    they overlap the mask or high-interest region
    (ref: graph_functions.py:683-699).
    """
    cfg = cfg.replace(thresh=float("inf"))
    arr = jnp.zeros((1, *cfg.image_shape, 1), jnp.float32)
    arr = add_positional_encoding(arr)
    graph, _ = image_to_graph(
        arr, cfg, mask=mask, high_interest_region=high_interest_region
    )
    return graph


def create_static_homogeneous_graph(
    cfg: GraphConfig,
    mask: jnp.ndarray,
) -> GraphTensors:
    """Uniform mesh with fully-masked cells removed.

    Build an unmasked heterogeneous mesh, drop nodes whose pixels are all
    masked, and renumber the survivors 0..n (ref:
    graph_functions.py:707-737). Note the reference keeps masked pixels
    inside partially-masked cells mapped to their node (the mapping was
    built without the mask) — preserved here.
    """
    base = create_static_heterogeneous_graph(cfg, mask=None)
    n_max = cfg.n_max

    # Unmasked pixel count per node; zero ⇒ delete (ref: get_nan_nodes :701).
    keep_pix = (~mask.astype(bool)).reshape(-1).astype(jnp.float32)
    unmasked = segment_sum_nodes(keep_pix, base.pixel_node, n_max)
    keep = (unmasked > 0) & base.node_valid

    new_of_old = jnp.cumsum(keep.astype(jnp.int32)) - 1  # monotone relabel
    n_nodes = jnp.sum(keep).astype(jnp.int32)

    # Remap pixels; pixels of deleted nodes become invalid.
    keep_pad = jnp.concatenate([keep, jnp.zeros((1,), bool)])
    new_pad = jnp.concatenate([new_of_old, jnp.full((1,), n_max, jnp.int32)])
    pixel_node = jnp.where(
        keep_pad[base.pixel_node], new_pad[base.pixel_node], n_max
    )

    # Compact per-node arrays into the new numbering.
    slot = jnp.where(keep, new_of_old, n_max)  # deleted → dropped
    counts = jnp.zeros((n_max,), base.counts.dtype).at[slot].set(
        base.counts, mode="drop"
    )
    node_xy = jnp.zeros((n_max, 2), base.node_xy.dtype).at[slot].set(
        base.node_xy, mode="drop"
    )
    node_valid = jnp.arange(n_max) < n_nodes

    # Remap edges; edges touching a deleted node become invalid (sentinel
    # id n_max). Re-sort so the dst-major order with sentinels last — the
    # invariant segment reductions rely on — is restored.
    e_keep = (
        base.edge_valid
        & keep_pad[base.edge_src]
        & keep_pad[base.edge_dst]
    )
    edge_src = jnp.where(e_keep, new_pad[base.edge_src], n_max)
    edge_dst = jnp.where(e_keep, new_pad[base.edge_dst], n_max)
    edge_dst, edge_src = jax.lax.sort((edge_dst, edge_src), num_keys=2)
    e_keep = edge_dst < n_max
    edge_attr = edge_attributes(edge_src, edge_dst, e_keep, node_xy, cfg)
    n_edges = jnp.sum(e_keep).astype(jnp.int32)
    src_sorted, src_perm = source_sorted_view(edge_src)

    out = GraphTensors(
        pixel_node=pixel_node,
        counts=counts,
        n_nodes=n_nodes,
        node_valid=node_valid,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_valid=e_keep,
        edge_attr=edge_attr,
        n_edges=n_edges,
        node_xy=node_xy,
        src_perm=src_perm,
        src_sorted=src_sorted,
        max_degree=cfg.max_degree,
        sym_coeff=None,
    )
    from quadtree_mpnnlstm_tpu.models.conv import compute_sym_norm

    return out.replace(sym_coeff=compute_sym_norm(out))

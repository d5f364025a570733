"""Vectorised adjacency extraction with padded edge capacity.

The reference walks every pixel in Python, collecting neighbour labels into
a dict (ref: model/graph_functions.py:261-356) — an O(P) host loop per
remesh. Here all candidate directed pairs come from array shifts (4 or 8
directions), are deduplicated with one on-device lexicographic sort, and are
compacted into a fixed ``e_max``-slot edge list.

Reference semantics preserved:
  * edges are directed and symmetric by construction (each pixel pair is
    discovered from both sides);
  * a multi-pixel cell yields a self-loop (adjacent same-label pixels), a
    singleton cell does not — the reference's commented-out self-loop
    removal (ref: graph_functions.py:329-333);
  * edge attributes are (bearing, distance) between node centroids when
    ``use_edge_attrs`` else distance alone (ref: graph_functions.py:347-353,
    :358-370).

The output is sorted by (dst, src) so segment reductions over destinations
can use ``indices_are_sorted=True``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph.state import GraphTensors

_SHIFTS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
_SHIFTS_8 = _SHIFTS_4 + ((-1, -1), (1, -1), (-1, 1), (1, 1))


def _shifted(nid: jnp.ndarray, dr: int, dc: int, sentinel: int) -> jnp.ndarray:
    """Neighbour id image; out-of-bounds rows/cols become ``sentinel``."""
    out = jnp.roll(nid, shift=(-dr, -dc), axis=(0, 1))
    rows, cols = nid.shape
    r = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ok = (r + dr >= 0) & (r + dr < rows) & (c + dc >= 0) & (c + dc < cols)
    return jnp.where(ok, out, sentinel)


def build_adjacency(
    node_img: jnp.ndarray,
    node_xy: jnp.ndarray,
    cfg: GraphConfig,
    dedup: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Edges from a (rows, cols) node-id image (sentinel = cfg.n_max).

    Args:
      node_img: per-pixel node ids.
      node_xy: (n_max, 2) node centroid positions for edge attributes.
      dedup: pixel-wise meshes have all-unique pairs, so the sort can be
        skipped (ref fast path: graph_functions.py:471-503).

    Returns:
      (edge_src, edge_dst, edge_valid, edge_attr, n_edges), capacity e_max.
    """
    n_max = cfg.n_max
    sent = n_max  # invalid node id
    shifts = _SHIFTS_8 if cfg.edges_at_corners else _SHIFTS_4

    srcs, dsts = [], []
    for dr, dc in shifts:
        srcs.append(node_img.reshape(-1))
        dsts.append(_shifted(node_img, dr, dc, sent).reshape(-1))
    src = jnp.concatenate(srcs)
    dst = jnp.concatenate(dsts)

    valid = (src < n_max) & (dst < n_max)
    # Invalid pairs sort to the end.
    src_s = jnp.where(valid, src, n_max + 1)
    dst_s = jnp.where(valid, dst, n_max + 1)

    if dedup:
        dst_s, src_s = lax.sort((dst_s, src_s), num_keys=2)
        prev_dst = jnp.concatenate([jnp.full((1,), -1, dst_s.dtype), dst_s[:-1]])
        prev_src = jnp.concatenate([jnp.full((1,), -1, src_s.dtype), src_s[:-1]])
        fresh = (dst_s != prev_dst) | (src_s != prev_src)
        keep = fresh & (dst_s < n_max)
    else:
        # Pairs are already unique (pixelwise mesh); stable-sort by dst so
        # segment aggregation over destinations stays sorted.
        dst_s, src_s = lax.sort((dst_s, src_s), num_keys=1)
        keep = dst_s < n_max

    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_edges = jnp.sum(keep).astype(jnp.int32)

    # Invalid slots carry the sentinel node id n_max: the edge list stays
    # sorted by dst end-to-end, so segment reductions can assert sorted
    # indices, and sentinel messages fall into the dropped n_max bucket.
    e_max = cfg.e_max
    slot = jnp.where(keep & (pos < e_max), pos, e_max)  # e_max slots get dropped
    sent_fill = jnp.full((e_max,), n_max, jnp.int32)
    edge_src = sent_fill.at[slot].set(src_s, mode="drop")
    edge_dst = sent_fill.at[slot].set(dst_s, mode="drop")
    edge_valid = jnp.zeros((e_max,), bool).at[slot].set(keep, mode="drop")

    edge_attr = edge_attributes(edge_src, edge_dst, edge_valid, node_xy, cfg)
    # Keep the raw count so capacity overflow (edges dropped past e_max) is
    # observable by the builder's overflow counter, not silently clamped.
    n_edges_raw = n_edges
    n_edges = jnp.minimum(n_edges, e_max)
    src_sorted, src_perm = source_sorted_view(edge_src)
    return (edge_src, edge_dst, edge_valid, edge_attr, n_edges, src_perm,
            src_sorted, n_edges_raw)


def source_sorted_view(edge_src: jnp.ndarray):
    """(src_sorted, src_perm): the edge permutation ordered by source id
    (sentinels last). Gives gathers-by-src a CSR adjoint (ops/csr.py)."""
    iota = jnp.arange(edge_src.shape[0], dtype=jnp.int32)
    src_sorted, src_perm = lax.sort((edge_src, iota), num_keys=1)
    return src_sorted, src_perm


def edge_attributes(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_valid: jnp.ndarray,
    node_xy: jnp.ndarray,
    cfg: GraphConfig,
) -> jnp.ndarray:
    """(bearing, distance) or (distance,) per edge (ref: graph_functions.py:358-370)."""
    xy = jnp.concatenate([node_xy, jnp.zeros((1, 2), node_xy.dtype)], axis=0)
    sx, sy = xy[edge_src, 0], xy[edge_src, 1]
    dx_, dy_ = xy[edge_dst, 0], xy[edge_dst, 1]
    ddx = sx - dx_
    ddy = sy - dy_
    dist = jnp.sqrt(ddx * ddx + ddy * ddy)
    if cfg.use_edge_attrs:
        two_pi = 2.0 * jnp.pi
        bearing = jnp.mod(jnp.arctan2(ddx, ddy), two_pi) / two_pi
        attr = jnp.stack([bearing, dist], axis=-1)
    else:
        attr = dist[:, None]
    return attr * edge_valid[:, None].astype(attr.dtype)

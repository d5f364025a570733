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
    src_view: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Edges from a (rows, cols) node-id image (sentinel = cfg.n_max).

    Args:
      node_img: per-pixel node ids.
      node_xy: (n_max, 2) node centroid positions for edge attributes.
      dedup: pixel-wise meshes have all-unique pairs, so the sort can be
        skipped (ref fast path: graph_functions.py:471-503).
      src_view: also build the src-sorted permutation (a second e_max-sized
        sort) — only needed when the edge list survives the build
        (GraphConfig.carry_edges); attention-window configs discard it, and
        inside the 90-step remeshing scan that sort is pure waste.

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
    if src_view:
        src_sorted, src_perm = source_sorted_view(edge_src)
    else:
        src_sorted = jnp.full((e_max,), n_max, jnp.int32)
        src_perm = jnp.zeros((e_max,), jnp.int32)
    return (edge_src, edge_dst, edge_valid, edge_attr, n_edges, src_perm,
            src_sorted, n_edges_raw)


def build_adjacency_canonical(
    node_img: jnp.ndarray,
    level: jnp.ndarray,
    node_xy: jnp.ndarray,
    cfg: GraphConfig,
    src_view: bool = True,
):
    """Sort-free adjacency for quadtree meshes (``GraphConfig.adjacency="csum"``).

    The "sort" path dedups 4P shifted pixel pairs with a lexicographic
    (dst, src) sort — the dominant remesh cost inside the 90-step decoder
    scan at ice scale. This formulation needs no sort:

    * **Canonical emission.** Two distinct cells A→B that share a boundary
      are emitted exactly once, from the boundary pixel pair at the start
      of the shared span: for horizontal neighbours the pixel in row
      ``max(top_A, top_B)``, for vertical ones the pixel in column
      ``max(left_A, left_B)`` (cells are axis-aligned rectangles — clipped
      squares — so the pair is unique by construction). A multi-pixel cell
      emits one self-loop from its anchor pixel (reference keeps exactly
      one, ref graph_functions.py:329-333); singletons emit none.
    * **Counting scatter.** Per-destination degrees come from segment
      sums; exclusive cumsums give each destination a contiguous slot
      range, and each edge's rank within its (destination, direction)
      group is a column/row prefix-sum difference — so edges land
      dst-grouped (what segment reductions and attention windows need)
      without ever sorting.

    Same edge *set* as ``build_adjacency(dedup=True)``; the within-
    destination order differs (group-major instead of src-ascending),
    which no consumer depends on. 4-neighbour meshes only.

    Args:
      node_img: (rows, cols) per-pixel node ids (sentinel = n_max).
      level: (rows, cols) per-pixel quadtree level (decompose_levels).
    """
    assert not cfg.edges_at_corners, "csum adjacency is 4-neighbour only"
    rows, cols = node_img.shape
    n_max = cfg.n_max
    e_max = cfg.e_max
    g = cfg.max_grid_size

    size = (g >> level).astype(jnp.int32)
    r = lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    ar = jnp.bitwise_and(r, ~(size - 1))
    ac = jnp.bitwise_and(c, ~(size - 1))
    w = jnp.minimum(ac + size, cols) - ac  # clipped cell width
    valid = node_img < n_max

    def shift(img, dr, dc, fill):
        out = jnp.roll(img, (-dr, -dc), (0, 1))
        ok = (r + dr >= 0) & (r + dr < rows) & (c + dc >= 0) & (c + dc < cols)
        return jnp.where(ok, out, fill)

    def excl_cumsum(x, axis):
        cum = jnp.cumsum(x.astype(jnp.int32), axis=axis)
        return cum - x.astype(jnp.int32)

    # Group 0: self-loops. A multi-pixel cell's anchor pixel emits (u, u)
    # once; width-1 (right-clipped) cells fall back to the vertical pair.
    same_right = shift(node_img, 0, 1, n_max) == node_img
    same_down = shift(node_img, 1, 0, n_max) == node_img
    at_anchor = (r == ar) & (c == ac)
    self_canon = valid & at_anchor & (same_right | ((w == 1) & same_down))
    groups = [(self_canon, node_img, jnp.zeros_like(node_img))]

    for dr, dc in _SHIFTS_4:
        nq = shift(node_img, dr, dc, n_max)
        pair_ok = valid & (nq < n_max) & (nq != node_img)
        if dr == 0:  # horizontal boundary: span starts at max of tops
            arq = shift(ar, dr, dc, 0)
            canon = pair_ok & (r == jnp.maximum(ar, arq))
            base = jnp.take_along_axis(
                excl_cumsum(canon, 0), arq, axis=0
            )
            rank = excl_cumsum(canon, 0) - base
        else:  # vertical boundary: span starts at max of lefts
            acq = shift(ac, dr, dc, 0)
            canon = pair_ok & (c == jnp.maximum(ac, acq))
            base = jnp.take_along_axis(
                excl_cumsum(canon, 1), acq, axis=1
            )
            rank = excl_cumsum(canon, 1) - base
        groups.append((canon, nq, rank))

    # Per-destination degrees -> contiguous dst-grouped slot ranges.
    def deg_of(canon, dst):
        ids = jnp.where(canon, dst, n_max).reshape(-1)
        return jax.ops.segment_sum(
            canon.astype(jnp.int32).reshape(-1), ids, num_segments=n_max + 1
        )[:n_max]

    degs = [deg_of(canon, dst) for canon, dst, _ in groups]
    deg_total = sum(degs)
    offsets = jnp.cumsum(deg_total) - deg_total  # exclusive, per dst
    n_edges_raw = jnp.sum(deg_total).astype(jnp.int32)

    sent_fill = jnp.full((e_max,), n_max, jnp.int32)
    edge_src = sent_fill
    edge_dst = sent_fill
    edge_valid = jnp.zeros((e_max,), bool)

    group_base = offsets
    src_flat = node_img.reshape(-1)
    for (canon, dst, rank), deg in zip(groups, degs):
        dst_flat = dst.reshape(-1)
        canon_flat = canon.reshape(-1)
        dst_safe = jnp.minimum(dst_flat, n_max - 1)
        slot = jnp.take(group_base, dst_safe) + rank.reshape(-1)
        slot = jnp.where(canon_flat & (slot < e_max), slot, e_max)
        edge_src = edge_src.at[slot].set(src_flat, mode="drop")
        edge_dst = edge_dst.at[slot].set(dst_flat, mode="drop")
        edge_valid = edge_valid.at[slot].set(canon_flat, mode="drop")
        group_base = group_base + deg

    edge_attr = edge_attributes(edge_src, edge_dst, edge_valid, node_xy, cfg)
    n_edges = jnp.minimum(n_edges_raw, e_max)
    if src_view:
        src_sorted, src_perm = source_sorted_view(edge_src)
    else:
        src_sorted = sent_fill
        src_perm = jnp.zeros((e_max,), jnp.int32)
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

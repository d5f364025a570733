"""Quadtree decomposition as a fixed-depth tensor program.

The reference decomposes with a Python ``while stack`` loop plus Numba
2-D reductions, forcing a device→host round-trip per sample and per remesh
step (ref: model/graph_functions.py:145-259, :119-143, :636). That is
incompatible with XLA. The TPU-native formulation computes, for every level
ℓ (cell size ``max_grid_size >> ℓ``), the split decision of *all* cells at
once via ``lax.reduce_window``, then resolves each pixel's cell as the
largest cell in its ancestor chain that does not split:

    level(p) = min{ℓ : not split[ℓ][cell_ℓ(p)]}

which is exact because a cell stops the recursion iff it is the first
non-splitting cell on the root→pixel path. Node ids are then assigned in
raster order of cell top-left corners via a cumulative sum — a canonical
relabelling of the reference's DFS ordering (models are permutation
invariant over node ids; tests compare partitions).

Semantics preserved from the reference:
  * criterion window spans ``[x-padding, x+size+1+padding)`` — note the
    ``+1`` overhang beyond the cell (ref: graph_functions.py:211, :222-225);
  * cells overlapping the mask or the high-interest region always split
    (ref: graph_functions.py:239-246);
  * masked pixels end at size 1 and are labelled invalid
    (ref: graph_functions.py:215-219);
  * image is edge-padded up to a multiple of ``max_grid_size``
    (ref: graph_functions.py:186-190); mask/HIR are *not* edge-padded
    (out-of-range mask windows clamp, ref: graph_functions.py:239).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.ops.segment import segment_sum_nodes

_NEG = -jnp.inf
_POS = jnp.inf


def _window_reduce(arr: jnp.ndarray, size: int, padding: int, op: str) -> jnp.ndarray:
    """Per-cell reduction over the [anchor-p, anchor+size+1+p) window.

    Output (H/size, W/size); out-of-range parts of the window contribute the
    reduction identity (same effect as the reference's slice clamping).
    """
    w = size + 1 + 2 * padding
    pad = ((padding, padding + 1), (padding, padding + 1))
    if op == "max":
        return lax.reduce_window(arr, _NEG, lax.max, (w, w), (size, size), pad)
    if op == "min":
        return lax.reduce_window(arr, _POS, lax.min, (w, w), (size, size), pad)
    if op == "any":
        return lax.reduce_window(arr, False, jnp.logical_or, (w, w), (size, size), pad)
    raise ValueError(op)


def _split_criterion(cell_max, cell_min, thresh: float, condition: str):
    if condition == "max_larger_than":
        return cell_max > thresh
    if condition == "max_smaller_than":
        return cell_max < thresh
    if condition == "min_larger_than":
        return cell_min > thresh
    if condition == "min_smaller_than":
        return cell_min < thresh
    raise ValueError(condition)


def decompose_levels(
    img: jnp.ndarray,
    cfg: GraphConfig,
    mask: Optional[jnp.ndarray] = None,
    high_interest_region: Optional[jnp.ndarray] = None,
    transform_func: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Per-pixel quadtree level.

    Args:
      img: (rows, cols) float field driving the split criterion (the caller
        passes channel 0 max-reduced over timesteps, ref:
        graph_functions.py:632).
      mask: (rows, cols) bool, True = invalid pixel.
      high_interest_region: (rows, cols) bool, True = always split.
      transform_func: applied to the (edge-padded) criteria image
        (ref: graph_functions.py:194).

    Returns:
      (rows, cols) int32 in [0, depth]; ``depth`` means a 1-pixel cell.
    """
    rows, cols = cfg.image_shape
    hp, wp = cfg.padded_shape
    g = cfg.max_grid_size

    imgp = jnp.pad(img, ((0, hp - rows), (0, wp - cols)), mode="edge")
    crit_img = transform_func(imgp) if transform_func is not None else imgp
    crit_img = crit_img.astype(jnp.float32)

    maskp = None
    if mask is not None:
        maskp = jnp.pad(mask.astype(bool), ((0, hp - rows), (0, wp - cols)))
    hirp = None
    if high_interest_region is not None:
        hirp = jnp.pad(
            high_interest_region.astype(bool), ((0, hp - rows), (0, wp - cols))
        )

    depth = cfg.depth
    level = jnp.full((hp, wp), depth, dtype=jnp.int32)

    # Deepest→shallowest so the final value is the *smallest* non-splitting
    # level on each pixel's ancestor chain.
    for lvl in range(depth - 1, -1, -1):
        size = g >> lvl
        needs_max = cfg.condition.startswith("max")
        cell_max = (
            _window_reduce(crit_img, size, cfg.padding, "max") if needs_max else None
        )
        cell_min = (
            _window_reduce(crit_img, size, cfg.padding, "min") if not needs_max else None
        )
        split = _split_criterion(cell_max, cell_min, cfg.thresh, cfg.condition)
        if maskp is not None:
            split = split | _window_reduce(maskp, size, cfg.padding, "any")
        if hirp is not None:
            split = split | _window_reduce(hirp, size, cfg.padding, "any")
        split_pix = jnp.repeat(jnp.repeat(split, size, axis=0), size, axis=1)
        level = jnp.where(split_pix, level, jnp.int32(lvl))

    level = level[:rows, :cols]
    if cfg.node_budget:
        level = _apply_node_budget(level, cfg, mask)
    return level


def _apply_node_budget(
    level: jnp.ndarray, cfg: GraphConfig, mask: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """Coarsen the mesh to respect ``cfg.node_budget`` (TPU-native capacity
    control; no reference counterpart — the reference's meshes are
    unbounded dynamic shapes).

    Picks the largest refinement cutoff L* whose capped mesh
    ``level' = min(level, L*)`` has ≤ budget nodes and applies it. Capping
    is partition-consistent: a size-(g≫L) aligned block either lies wholly
    inside a bigger (≤ L) cell — in which case every pixel in it keeps that
    cell — or contains only deeper pixels, all of which are capped to the
    block. So, unlike a node-capacity overflow (which silently drops the
    raster tail of the mesh), the budget degrades gracefully: the finest
    cells coarsen one level at a time, everywhere at once.

    Mask-forced splits are preserved: a capped block that would contain a
    masked pixel is exempt from capping (its pixels keep their original,
    mask-forced levels) — otherwise the block's anchor pixel could be
    masked, no node would be emitted for it, and its unmasked pixels would
    map to a stale or negative node id. L* selection counts the leaders of
    the *exempted* capped map, so the budget bound accounts for the
    mask-forced singletons it cannot coarsen; if those alone exceed the
    budget, the floor is cap 0 with exemptions (reference parity — masks
    always force singletons, ref graph_functions.py:215-219, :239).
    """
    rows, cols = level.shape
    g = cfg.max_grid_size
    depth = cfg.depth
    hp, wp = cfg.padded_shape
    invalid = (
        mask.astype(bool)
        if mask is not None
        else jnp.zeros((rows, cols), dtype=bool)
    )
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)

    def capped_level(cap: int) -> jnp.ndarray:
        lv = jnp.minimum(level, cap)
        if mask is not None and cap < depth:
            # Exempt size-(g>>cap) aligned blocks that overlap the mask:
            # their pixels keep the original (mask-forced) levels. This is
            # partition-consistent — any original cell intersecting such a
            # block is contained in it (a larger cell covering the block
            # would overlap the mask and have been force-split already).
            size = g >> cap
            invp = jnp.pad(invalid, ((0, hp - rows), (0, wp - cols)))
            ov = lax.reduce_window(
                invp, False, jnp.logical_or, (size, size), (size, size),
                "VALID",
            )
            ov_pix = jnp.repeat(jnp.repeat(ov, size, axis=0), size, axis=1)
            lv = jnp.where(ov_pix[:rows, :cols], level, lv)
        return lv

    def n_nodes_at(lv: jnp.ndarray) -> jnp.ndarray:
        size = (g >> lv).astype(jnp.int32)
        leader = (
            (r == jnp.bitwise_and(r, ~(size - 1)))
            & (c == jnp.bitwise_and(c, ~(size - 1)))
            & ~invalid
        )
        return jnp.sum(leader.astype(jnp.int32))

    levels = jnp.stack([capped_level(cap) for cap in range(depth + 1)])
    counts = jnp.stack([n_nodes_at(levels[i]) for i in range(depth + 1)])
    fits = counts <= cfg.node_budget
    # largest cap that fits; cap 0 (base grid) is the floor either way
    cap_star = jnp.max(jnp.where(fits, jnp.arange(depth + 1), 0))
    return jnp.take(levels, cap_star, axis=0)


def pixel_nodes_from_levels(
    level: jnp.ndarray,
    cfg: GraphConfig,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Canonical node ids from the per-pixel level map.

    Cells are numbered in raster order of their top-left (anchor) pixel.
    Masked pixels — always singletons, see module docstring — get the
    invalid sentinel ``n_max``.

    Returns:
      (pixel_node (P,) int32, n_nodes () int32, counts (n_max,) float32).
    """
    rows, cols = cfg.image_shape
    n_max = cfg.n_max

    size = (cfg.max_grid_size >> level).astype(jnp.int32)  # per-pixel cell size
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    anchor_r = jnp.bitwise_and(r, ~(size - 1))
    anchor_c = jnp.bitwise_and(c, ~(size - 1))

    invalid = (
        mask.astype(bool)
        if mask is not None
        else jnp.zeros((rows, cols), dtype=bool)
    )
    leader = (r == anchor_r) & (c == anchor_c) & ~invalid

    cum = jnp.cumsum(leader.reshape(-1).astype(jnp.int32))
    n_nodes = cum[-1]

    anchor_flat = (anchor_r * cols + anchor_c).reshape(-1)
    node_id = cum[anchor_flat] - 1
    node_id = jnp.where(invalid.reshape(-1), n_max, node_id)
    node_id = jnp.where(node_id >= n_max, n_max, node_id)  # capacity overflow guard

    counts = segment_sum_nodes(
        jnp.ones_like(node_id, dtype=jnp.float32), node_id, n_max
    )
    return node_id, n_nodes, counts

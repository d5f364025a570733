"""Dense stencil aggregation for pixelwise meshes (``aggregation="grid"``).

The reference's committed flagship config runs the quadtree OFF
(``thresh=-inf``, ref ice_exp.py:145): every valid pixel is a node and the
mesh is a regular 4-neighbour grid (ref graph_functions.py:471-539). On TPU
the idiomatic formulation of message passing over a regular grid is not a
sparse gather/scatter at all — it is a **stencil**: for each of the 4 (or
8) directions, the neighbour feature plane is a shifted copy of the node
plane, so

    (Â z)[r, c] = Σ_d coeff_d[r, c] · z[r - dr_d, c - dc_d]

is a handful of shifts + fused multiply-adds: zero scatters, zero gathers,
fully differentiable by XLA autodiff, bandwidth-bound at HBM speed. Edge
attributes are per-direction *constants* (node positions are
positional-encoding channels × resolution, ref graph_functions.py:657, so
every edge of direction d has the same (bearing, distance)), which also
collapses attention-conv edge projections into D small vectors.

Node ids in this mode are the raster **identity** mapping (node id = pixel
index, masked pixels invalid) so ``flatten``/``unflatten`` are reshapes —
see GraphTensors.mapping_identity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Same direction order as graph/adjacency.py so semantics line up.
SHIFTS_4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
SHIFTS_8 = SHIFTS_4 + ((-1, -1), (1, -1), (-1, 1), (1, 1))


def shifts_for(edges_at_corners: bool) -> Tuple[Tuple[int, int], ...]:
    return SHIFTS_8 if edges_at_corners else SHIFTS_4


def shift_in(zg: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Plane of incoming-neighbour values for direction (dr, dc):
    ``out[r, c] = zg[r - dr, c - dc]``, zero outside the grid.

    ``zg`` is (rows, cols, ...); static shifts lower to pad+slice (no
    dynamic gather).
    """
    pad = [(max(dr, 0), max(-dr, 0)), (max(dc, 0), max(-dc, 0))]
    pad += [(0, 0)] * (zg.ndim - 2)
    rows, cols = zg.shape[:2]
    z = jnp.pad(zg, pad)
    return z[
        max(-dr, 0) : max(-dr, 0) + rows, max(-dc, 0) : max(-dc, 0) + cols
    ]


def neighbor_valid(valid: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """(rows, cols) bool: pixel (r, c) has a valid neighbour at
    (r - dr, c - dc) — i.e. an incoming edge of direction (dr, dc)."""
    return shift_in(valid, dr, dc) & valid


def dir_attrs(edges_at_corners: bool, resolution: float) -> np.ndarray:
    """(D, 2) per-direction (bearing, distance) edge attributes.

    Parity: ref graph_functions.py:358-370 — for the edge src→dst,
    ddx = x_src - x_dst = -dc·res, ddy = -dr·res; bearing is atan2(ddx,
    ddy) normalised to [0, 1); positions are pixel col/row × resolution
    (exact for the pixelwise mesh: posenc channel × size × res = index ×
    res, graph/build.py _node_positions).
    """
    shifts = shifts_for(edges_at_corners)
    out = np.zeros((len(shifts), 2), np.float32)
    for i, (dr, dc) in enumerate(shifts):
        ddx = -dc * resolution
        ddy = -dr * resolution
        out[i, 0] = np.mod(np.arctan2(ddx, ddy), 2 * np.pi) / (2 * np.pi)
        out[i, 1] = resolution * float(np.hypot(dr, dc))
    return out


def grid_sym_coeff(
    valid: jnp.ndarray, edges_at_corners: bool, resolution: float
) -> jnp.ndarray:
    """(D, rows, cols) D^{-1/2} A D^{-1/2} stencil coefficient planes.

    Matches models/conv.compute_sym_norm on the pixelwise edge list: edge
    weight = centroid distance, deg[n] = Σ incoming weights, coeff_e =
    dinv[dst] · w · dinv[src]; zero where either endpoint is invalid.
    """
    shifts = shifts_for(edges_at_corners)
    attrs = dir_attrs(edges_at_corners, resolution)
    deg = jnp.zeros(valid.shape, jnp.float32)
    for i, (dr, dc) in enumerate(shifts):
        deg = deg + attrs[i, 1] * neighbor_valid(valid, dr, dc).astype(
            jnp.float32
        )
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    planes = []
    for i, (dr, dc) in enumerate(shifts):
        nb = neighbor_valid(valid, dr, dc)
        planes.append(
            jnp.where(nb, attrs[i, 1] * dinv * shift_in(dinv, dr, dc), 0.0)
        )
    return jnp.stack(planes)


def grid_a_mul(z: jnp.ndarray, graph) -> jnp.ndarray:
    """``Â z`` over the identity-mapped grid: D shifted fused
    multiply-adds (the GCN/Cheb aggregation, dispatched from conv.a_mul)."""
    _, rows, cols, ndirs = graph.agg
    shifts = shifts_for(ndirs == 8)
    f = z.shape[-1]
    zg = z.reshape(rows, cols, f)
    coeff = graph.grid_coeff.astype(z.dtype)
    out = jnp.zeros_like(zg)
    for i, (dr, dc) in enumerate(shifts):
        out = out + coeff[i][..., None] * shift_in(zg, dr, dc)
    return out.reshape(rows * cols, f)

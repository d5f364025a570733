"""CSR (sorted-edge) segment reductions — scatter-free in both directions.

XLA lowers segment reductions to scatter, which a TPU profile shows running
~50× below HBM bandwidth (7 ms per (16·8k,4,16)→(16·2k,4,16) scatter in the
train step). But the graph builders emit edge lists **sorted by destination
with sentinel padding** (graph/adjacency.py), which makes every node's
incoming messages a contiguous row range — a CSR layout without building
one:

  forward:   out[n]  = Σ_{e ∈ [start[n], end[n])} msg[e]   (ranged gather+sum)
  backward:  d msg[e] = g[dst[e]]                           (plain gather)

The adjoint is a gather because each message feeds exactly one node. Row
offsets come from one vectorised ``searchsorted`` (binary search — no
scatter). The only requirement is a static per-node degree cap
``max_degree``; the quadtree bound is 4·max_grid_size + O(1)
(a size-s cell has ≤ s neighbours per side, + corners + self-loop).

This replaces torch-scatter's CUDA segment kernels (SURVEY.md §2.2) with a
formulation XLA compiles to pure gathers — the TPU-native answer.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _offsets(edge_dst: jnp.ndarray, n_max: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start, end) row ranges per node from the dst-sorted edge list."""
    bounds = jnp.searchsorted(edge_dst, jnp.arange(n_max + 1, dtype=edge_dst.dtype))
    return bounds[:-1], bounds[1:]


def _csr_sum_impl(messages, edge_dst, n_max, max_degree):
    e = edge_dst.shape[0]
    start, end = _offsets(edge_dst, n_max)
    idx = start[:, None] + jnp.arange(max_degree, dtype=start.dtype)[None, :]
    valid = idx < end[:, None]
    idx = jnp.minimum(idx, e - 1)
    rows = jnp.take(messages, idx.reshape(-1), axis=0)
    rows = rows.reshape((n_max, max_degree) + messages.shape[1:])
    mask = valid.reshape((n_max, max_degree) + (1,) * (messages.ndim - 1))
    return jnp.sum(jnp.where(mask, rows, 0), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def csr_segment_sum(
    messages: jnp.ndarray,
    edge_dst: jnp.ndarray,
    n_max: int,
    max_degree: int,
) -> jnp.ndarray:
    """Sum messages (E, ...) into (n_max, ...) by the SORTED ids ``edge_dst``
    (sentinel ``n_max`` lanes fall outside every range and are dropped).
    Nodes with more than ``max_degree`` incoming edges are truncated —
    callers must size the cap from the mesh bound
    (``GraphConfig.degree_bound``); the graph builder counts any truncated
    edges into ``GraphTensors.overflow`` (graph/build.py) so an undersized
    cap is loud, like every other capacity knob."""
    return _csr_sum_impl(messages, edge_dst, n_max, max_degree)


def _csr_sum_fwd(messages, edge_dst, n_max, max_degree):
    return _csr_sum_impl(messages, edge_dst, n_max, max_degree), edge_dst


def _csr_sum_bwd(n_max, max_degree, edge_dst, g):
    zero = jnp.zeros((1,) + g.shape[1:], g.dtype)
    g_pad = jnp.concatenate([g, zero], axis=0)
    d_msg = jnp.take(g_pad, jnp.minimum(edge_dst, n_max), axis=0)
    return (d_msg, None)


csr_segment_sum.defvjp(_csr_sum_fwd, _csr_sum_bwd)


def csr_segment_max(
    logits: jnp.ndarray,
    edge_dst: jnp.ndarray,
    n_max: int,
    max_degree: int,
    fill: float = -1e30,
) -> jnp.ndarray:
    """Per-node max of (E, ...) logits (for masked edge softmax; callers
    stop-gradient the result, so no custom adjoint is needed)."""
    e = edge_dst.shape[0]
    start, end = _offsets(edge_dst, n_max)
    idx = start[:, None] + jnp.arange(max_degree, dtype=start.dtype)[None, :]
    valid = idx < end[:, None]
    idx = jnp.minimum(idx, e - 1)
    rows = jnp.take(logits, idx.reshape(-1), axis=0)
    rows = rows.reshape((n_max, max_degree) + logits.shape[1:])
    mask = valid.reshape((n_max, max_degree) + (1,) * (logits.ndim - 1))
    return jnp.max(jnp.where(mask, rows, fill), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gather_src_csr(
    x: jnp.ndarray,
    edge_src: jnp.ndarray,
    src_perm: jnp.ndarray,
    src_sorted: jnp.ndarray,
    n_max: int,
    max_degree: int,
) -> jnp.ndarray:
    """``x[edge_src]`` whose backward is a CSR segment sum over the
    *source*-sorted edge view instead of a scatter.

    ``src_perm``/``src_sorted`` are the per-graph edge permutation that
    sorts by source (built once per remesh, graph/adjacency.py). The
    symmetric mesh has equal in/out degree bounds, so the same
    ``max_degree`` applies."""
    return jnp.take(x, jnp.minimum(edge_src, x.shape[0] - 1), axis=0)


def _gather_src_fwd(x, edge_src, src_perm, src_sorted, n_max, max_degree):
    out = jnp.take(x, jnp.minimum(edge_src, x.shape[0] - 1), axis=0)
    return out, (src_perm, src_sorted)


def _gather_src_bwd(n_max, max_degree, res, g):
    src_perm, src_sorted = res
    g_by_src = jnp.take(g, src_perm, axis=0)
    dx = csr_segment_sum(g_by_src, src_sorted, n_max, max_degree)
    return (dx, None, None, None)


gather_src_csr.defvjp(_gather_src_fwd, _gather_src_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_dst_csr(
    x: jnp.ndarray,
    edge_dst: jnp.ndarray,
    n_max: int,
    max_degree: int,
) -> jnp.ndarray:
    """``x[edge_dst]`` (dst-sorted ids) whose backward is the CSR segment
    sum — no permutation needed since ids are already sorted."""
    return jnp.take(x, jnp.minimum(edge_dst, x.shape[0] - 1), axis=0)


def _gather_dst_fwd(x, edge_dst, n_max, max_degree):
    return jnp.take(x, jnp.minimum(edge_dst, x.shape[0] - 1), axis=0), edge_dst


def _gather_dst_bwd(n_max, max_degree, edge_dst, g):
    return (csr_segment_sum(g, edge_dst, n_max, max_degree), None)


gather_dst_csr.defvjp(_gather_dst_fwd, _gather_dst_bwd)

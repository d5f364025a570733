"""Pallas TPU kernel: segment-sum as fused one-hot × matmul.

XLA lowers ``segment_sum`` to scatter-add, which on TPU costs milliseconds
for a few thousand rows (measured ~2-5 ms for (16k,16)→(4k,16), ~200× off
bandwidth). This kernel reformulates aggregation for the MXU:

    out = onehotᵀ @ values,   onehot[e, n] = (ids[e] == n)

with the one-hot tile *generated in VMEM* per grid step (never touching
HBM) and accumulated into a resident (N, F) output block. The backward pass
is a plain row gather (``d_values[e] = g[ids[e]]``), wired via custom_vjp —
so neither direction ever emits an XLA scatter.

This is the framework's stand-in for torch-scatter's CUDA kernels
(SURVEY.md §2.2, §7.4 "Pallas segment-sum is the perf-critical kernel").

Sentinel convention: ids may contain ``n_out`` (invalid lane); those rows
match no one-hot column and are dropped, mirroring the XLA path's extra
bucket.

Numerics: with ``Precision.HIGHEST`` the MXU runs enough bf16 passes for
f32-level accuracy, but summation order differs from XLA's scatter, so
results match to ~1e-7 per op rather than bitwise. Through a *remeshing*
rollout this is amplified: a 1e-7 change near the split threshold flips a
quadtree cell and downstream values diverge macroscopically — inherent to
the model family (any two valid f32 schedules diverge the same way), not a
kernel defect. Non-remeshing paths agree exactly in practice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(ids_ref, vals_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:, 0]  # (tile_e,)
    n_out = out_ref.shape[0]
    # one-hot generated in VMEM: (tile_e, n_out)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], n_out), 1)
    onehot = (ids[:, None] == cols).astype(vals_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        onehot,
        vals_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # onehotᵀ @ vals
        preferred_element_type=out_ref.dtype,
        # One-hot entries are exact; values must not round to bf16 — the
        # sums feed a recurrent rollout where 1e-2 error compounds.
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_pallas(
    values: jnp.ndarray, ids: jnp.ndarray, n_out: int, tile_e: int = 512
) -> jnp.ndarray:
    """Sum ``values`` (E, F) rows into ``n_out`` buckets by sorted-or-not
    ``ids`` (E,); ids == n_out are dropped. Returns (n_out, F)."""
    return _fwd_impl(values, ids, n_out, tile_e)


def _fwd_impl(values, ids, n_out, tile_e):
    e, f = values.shape
    ep = _round_up(max(e, tile_e), tile_e)
    fp = _round_up(f, 128)
    np_out = _round_up(n_out, 8)
    vals_p = jnp.zeros((ep, fp), values.dtype).at[:e, :f].set(values)
    # out-of-range padding ids match no column
    ids_p = jnp.full((ep, 1), np_out + 1, jnp.int32).at[:e, 0].set(
        ids.astype(jnp.int32)
    )

    out = pl.pallas_call(
        _kernel,
        grid=(ep // tile_e,),
        in_specs=[
            pl.BlockSpec((tile_e, 1), lambda i: (i, 0)),
            pl.BlockSpec((tile_e, fp), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((np_out, fp), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((np_out, fp), values.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ids_p, vals_p)
    return out[:n_out, :f]


def _fwd(values, ids, n_out, tile_e):
    return _fwd_impl(values, ids, n_out, tile_e), ids


def _bwd(n_out, tile_e, ids, g):
    # d_values[e] = g[ids[e]]; sentinel rows get zero.
    g_pad = jnp.concatenate(
        [g, jnp.zeros((2, g.shape[1]), g.dtype)], axis=0
    )
    idx = jnp.minimum(ids, n_out)  # sentinel → zero row
    return (g_pad[idx], None)


segment_sum_pallas.defvjp(_fwd, _bwd)

"""Fused SpMM Pallas kernel: ``z ↦ Â z`` in one VMEM-resident pass.

This is the hot op of every GCN/Cheb convolution (SURVEY.md §7.4 "fused
gather + weighted-scatter"; stands in for torch-scatter/torch-sparse's CUDA
SpMM, ref requirements.txt:12-16). XLA expresses it as

    gather(z, src) → scale by coeff → scatter-add at dst

and both the dynamic row-gather and the scatter-add run far below HBM
bandwidth on TPU (~14 GB/s measured, PERF_NOTES.md). This kernel exploits
the builders' edge-list invariants instead:

  * edges are **sorted by destination** (graph/adjacency.py), so the edges
    of a 128-node tile are one contiguous window of the edge list;
  * node ids are **raster-ordered quadtree anchors**, so the *sources* of a
    node tile are spatially local — a contiguous window of node rows covers
    them;
  * ``coeff`` is zero on sentinel lanes, so padded edges contribute nothing
    and no masking is needed in the kernel.

Per node tile t the kernel runs two small MXU matmuls, entirely in VMEM:

    msg  = onehot(src − src_lo[t])  @ z[src_lo[t] : src_lo[t]+SW]   # gather
    out  = onehot(dst − t·NT)ᵀ @ (coeff ⊙ msg)                      # scatter

Window metadata (edge-window start, source-window start per tile) is a pure
function of the graph, computed once per mesh build (`spmm_tile_meta`) and
cached on ``GraphTensors.agg_meta``; window overflow (a tile with more than
``EB`` edges or a source span wider than ``SW``) is *counted* there and
surfaced through the builder's overflow diagnostics rather than silently
ignored.

Because distance edge-weights are symmetric and both edge directions are
materialised, ``Â`` is symmetric — the VJP of ``z ↦ Âz`` is the same kernel
applied to the cotangent (coeff is data-independent: node positions come
from constant positional-encoding channels, ref graph_functions.py:657).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------- metadata


def spmm_tile_meta(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    n_max: int,
    nt: int,
    eb: int,
    sw: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-node-tile windows for the fused SpMM kernel.

    Returns:
      meta: (T, 2) int32 — [edge-window start (8-aligned), source-window
        start (8-aligned)] per tile of ``nt`` nodes.
      overflow: () int32 — number of (tile, edge) assignments falling
        outside the (eb, sw) windows; nonzero means results drop edges and
        the caps must be raised (see GraphConfig.agg_*).
    """
    e = edge_dst.shape[0]
    np_ = _round_up(n_max, nt)
    t = np_ // nt
    bases = jnp.arange(t + 1, dtype=jnp.int32) * nt
    bounds = jnp.searchsorted(edge_dst, bases).astype(jnp.int32)
    starts, ends = bounds[:-1], bounds[1:]
    e0 = jnp.clip(starts & ~7, 0, max(e - eb, 0))

    # Source windows: min valid src per tile, scanned over the edge window.
    idx = jnp.minimum(e0[:, None] + jnp.arange(eb, dtype=jnp.int32), e - 1)
    src_w = jnp.take(edge_src, idx.reshape(-1)).reshape(t, eb)
    dst_w = jnp.take(edge_dst, idx.reshape(-1)).reshape(t, eb)
    in_tile = (dst_w >= bases[:-1, None]) & (dst_w < bases[1:, None])
    real = in_tile & (src_w < n_max)
    big = jnp.int32(2**30)
    src_min = jnp.min(jnp.where(real, src_w, big), axis=1)
    src_max = jnp.max(jnp.where(real, src_w, -1), axis=1)
    s0 = jnp.clip(
        jnp.where(src_min == big, 0, src_min) & ~7, 0, max(np_ - sw, 0)
    )

    edge_overflow = jnp.sum(jnp.maximum(ends - e0 - eb, 0))
    src_overflow = jnp.sum(jnp.maximum(src_max + 1 - (s0 + sw), 0))
    meta = jnp.stack([e0, s0], axis=1)
    return meta, (edge_overflow + src_overflow).astype(jnp.int32)


# ------------------------------------------------------------------ kernel


def _make_kernel(eb: int, sw: int):
    """Kernel body closed over the static window sizes (eb, sw)."""
    def kernel(meta_ref, src_ref, dst_ref, coeff_ref, z_ref, out_ref):
        nt = out_ref.shape[0]
        t = pl.program_id(0)
        e0 = meta_ref[t, 0]
        s0 = meta_ref[t, 1]

        src = src_ref[pl.ds(e0, eb), 0]
        dst = dst_ref[pl.ds(e0, eb), 0]
        cf = coeff_ref[pl.ds(e0, eb), 0]
        zwin = z_ref[pl.ds(s0, sw), :]

        cols_s = jax.lax.broadcasted_iota(jnp.int32, (eb, sw), 1)
        oh_src = (src[:, None] - s0 == cols_s).astype(zwin.dtype)
        msg = jax.lax.dot_general(
            oh_src, zwin,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        msg = msg * cf[:, None]

        cols_d = jax.lax.broadcasted_iota(jnp.int32, (eb, nt), 1)
        oh_dst = (dst[:, None] - t * nt == cols_d).astype(msg.dtype)
        out_ref[:] = jax.lax.dot_general(
            oh_dst, msg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(out_ref.dtype)

    return kernel


def _spmm_impl(z, coeff, edge_src, edge_dst, meta, n_max, nt, eb, sw):
    np_ = _round_up(n_max, nt)
    e = edge_src.shape[0]
    ep = max(_round_up(e, 8), eb)
    f = z.shape[-1]
    fp = _round_up(f, 128)

    z_p = jnp.zeros((max(np_, sw), fp), z.dtype).at[:n_max, :f].set(z[:n_max])
    pad_ids = jnp.full((ep, 1), np_ + 1, jnp.int32)
    src_p = pad_ids.at[:e, 0].set(edge_src.astype(jnp.int32))
    dst_p = pad_ids.at[:e, 0].set(edge_dst.astype(jnp.int32))
    cf_p = jnp.zeros((ep, 1), z.dtype).at[:e, 0].set(coeff.astype(z.dtype))

    t = np_ // nt
    out = pl.pallas_call(
        _make_kernel(eb, sw),
        grid=(t,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta (T, 2)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # src ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dst ids
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coeff
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z (resident)
        ],
        out_specs=pl.BlockSpec((nt, fp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, fp), z.dtype),
        interpret=jax.default_backend() == "cpu",
    )(meta, src_p, dst_p, cf_p, z_p)
    return out[:n_max, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def spmm_apply(
    z: jnp.ndarray,
    coeff: jnp.ndarray,
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    meta: jnp.ndarray,
    n_max: int,
    nt: int,
    eb: int,
    sw: int,
) -> jnp.ndarray:
    """``out[n] = Σ_{e : dst_e = n} coeff_e · z[src_e]`` — i.e. ``Â z``.

    Requires the builder invariants: ``edge_dst`` sorted ascending with
    sentinel padding, ``coeff`` zero on invalid lanes, ``meta`` from
    :func:`spmm_tile_meta` with the same (nt, eb, sw). Differentiable in
    ``z`` only (Â is constant w.r.t. model inputs: node positions are
    positional-encoding constants).
    """
    return _spmm_impl(z, coeff, edge_src, edge_dst, meta, n_max, nt, eb, sw)


def _spmm_fwd(z, coeff, edge_src, edge_dst, meta, n_max, nt, eb, sw):
    out = _spmm_impl(z, coeff, edge_src, edge_dst, meta, n_max, nt, eb, sw)
    return out, (coeff, edge_src, edge_dst, meta)


def _spmm_bwd(n_max, nt, eb, sw, res, g):
    coeff, edge_src, edge_dst, meta = res
    # Â is symmetric (both edge directions present, symmetric weights):
    # d z = Âᵀ g = Â g — the same kernel on the cotangent.
    dz = _spmm_impl(g, coeff, edge_src, edge_dst, meta, n_max, nt, eb, sw)
    return (dz, None, None, None, None)


spmm_apply.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_reference(z, coeff, edge_src, edge_dst, n_max):
    """XLA oracle for tests: gather → scale → segment-sum."""
    zs = jnp.take(z, jnp.minimum(edge_src, n_max - 1), axis=0)
    msg = coeff[:, None] * zs
    out = jax.ops.segment_sum(msg, edge_dst, num_segments=n_max + 1)
    return out[:n_max]

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
    them.

At mesh-build time (:func:`spmm_tile_meta`, cached on the graph) each node
tile's edge window is packed dense: relative source ids, relative
destination ids and coefficients, shape (T, EB). Packing rows avoids the
TPU's (·, 1) lane-padding trap — an (E, 1) VMEM operand occupies E×128
lanes — and lets the kernel run two small MXU matmuls per tile with no
dynamic edge slicing:

    oh_srcᵀ (SW, EB) = (iota_SW == src_rel)          # built in VMEM
    msg     (EB, F)  = oh_srcᵀ ᵀ· z[s0 : s0+SW]      # gather as matmul
    oh_dstᵀ (NT, EB) = (iota_NT == dst_rel) ⊙ coeff  # scatter + scale
    out     (NT, F)  = oh_dstᵀ · msg

Both one-hots are built *transposed* so only row-vector broadcasts are
needed (no in-kernel transposes/reshapes). Window overflow (a tile with
more than EB edges, or a source span wider than SW) is *counted* by the
meta builder and surfaced through ``GraphTensors.overflow`` rather than
silently ignored.

Because distance edge-weights are symmetric and both edge directions are
materialised, ``Â`` is symmetric — the VJP of ``z ↦ Âz`` is the same
kernel applied to the cotangent (Â is data-independent: node positions
come from constant positional-encoding channels, ref
graph_functions.py:657).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _s0_bound(np_: int, sw: int) -> int:
    """Largest source-window start: ≥ np_ - sw (full coverage) and
    16-aligned (Mosaic sub-32-bit dynamic-slice alignment)."""
    return _round_up(max(np_ - sw, 0), 16)


def _z_rows(np_: int, sw: int) -> int:
    """Padded z row count covering every window [s0, s0 + sw)."""
    return max(np_, _s0_bound(np_, sw) + sw)


class SpmmWindows(NamedTuple):
    """Per-node-tile packed edge windows (pytree; cached on GraphTensors)."""

    s0: jnp.ndarray       # (T, 1) int32 — source-window start (16-aligned)
    src_rel: jnp.ndarray  # (T, EB) int32 — src − s0[t]; −1 = no edge
    dst_rel: jnp.ndarray  # (T, EB) int32 — dst − t·NT; −1 = no edge
    coeff: jnp.ndarray    # (T, EB) f32 — Â coefficient per window slot


# ---------------------------------------------------------------- metadata


def spmm_tile_meta(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    coeff: jnp.ndarray,
    n_max: int,
    nt: int,
    eb: int,
    sw: int,
) -> Tuple[SpmmWindows, jnp.ndarray]:
    """Pack per-tile edge windows for the fused SpMM kernel.

    Returns (windows, overflow): ``overflow`` counts (tile, edge)
    assignments that fell outside the (eb, sw) windows — nonzero means the
    kernel would drop edges and the caps must be raised (GraphConfig.agg_*).
    """
    geo = window_geometry(edge_src, edge_dst, n_max, nt, eb, sw)
    # window metadata stays f32 even in bf16 compute mode: kernel A slices
    # rows dynamically, and sub-32-bit VMEM refs need stricter (16-row)
    # alignment Mosaic can't prove here; blocks are cast at apply time
    cf_w = jnp.take(coeff.astype(jnp.float32), geo["flat_idx"]).reshape(
        geo["src_rel"].shape
    )
    cf_w = jnp.where(geo["in_tile"], cf_w, 0.0)
    windows = SpmmWindows(
        s0=geo["s0"][:, None], src_rel=geo["src_rel"],
        dst_rel=geo["dst_rel"], coeff=cf_w,
    )
    return windows, geo["overflow"]


def window_geometry(edge_src, edge_dst, n_max, nt, eb, sw):
    """Per-node-tile edge-window geometry shared by the fused SpMM and the
    fused attention kernels (ops/pallas_attn.py).

    Returns a dict with: ``s0`` (T,) 16-aligned source-window starts,
    ``src_rel``/``dst_rel`` (T, EB) window-relative ids (−1 = dead slot),
    ``in_tile`` (T, EB) slot validity, ``flat_idx`` (T·EB,) edge-list
    indices of the packed slots, and ``overflow`` () counted window misses.
    """
    e = edge_dst.shape[0]
    np_ = _round_up(n_max, nt)
    t = np_ // nt
    bases = jnp.arange(t + 1, dtype=jnp.int32) * nt
    bounds = jnp.searchsorted(edge_dst, bases).astype(jnp.int32)
    starts, ends = bounds[:-1], bounds[1:]
    e0 = jnp.clip(starts, 0, max(e - 1, 0))

    idx = jnp.minimum(e0[:, None] + jnp.arange(eb, dtype=jnp.int32), e - 1)
    flat = idx.reshape(-1)
    src_w = jnp.take(edge_src, flat).reshape(t, eb).astype(jnp.int32)
    dst_w = jnp.take(edge_dst, flat).reshape(t, eb).astype(jnp.int32)

    in_tile = (
        (dst_w >= bases[:-1, None])
        & (dst_w < bases[1:, None])
        & (idx < ends[:, None])
    )
    real = in_tile & (src_w < n_max)
    big = jnp.int32(2**30)
    src_min = jnp.min(jnp.where(real, src_w, big), axis=1)
    src_max = jnp.max(jnp.where(real, src_w, -1), axis=1)
    # 16-aligned so the apply kernels' dynamic z-row slices are legal for
    # bf16 inputs (bf16 packs two rows per sublane; f32 only needs 8). The
    # clip bound is rounded UP to 16 — rounding down (advisor round-2
    # finding) made s0 unaligned whenever np_ - sw wasn't a multiple of
    # 16; the apply kernels pad z past np_ to keep the shifted top window
    # in range (_z_rows).
    s0 = jnp.clip(
        jnp.where(src_min == big, 0, src_min) & ~15, 0, _s0_bound(np_, sw)
    )

    src_rel = jnp.where(real, src_w - s0[:, None], -1)
    dst_rel = jnp.where(in_tile, dst_w - bases[:-1, None], -1)

    edge_overflow = jnp.sum(jnp.maximum(ends - e0 - eb, 0))
    src_overflow = jnp.sum(
        jnp.maximum(src_max + 1 - (s0 + sw), 0) * (src_max >= 0)
    )
    return dict(
        s0=s0,
        src_rel=src_rel,
        dst_rel=dst_rel,
        in_tile=in_tile,
        flat_idx=flat,
        overflow=(edge_overflow + src_overflow).astype(jnp.int32),
    )


# ----------------------------------------------------- kernel A: build Â blocks


class SpmmBlocks(NamedTuple):
    """Dense per-tile Â blocks (pytree; cached on GraphTensors.agg_meta).

    ``blocks[t]`` is the (NT, SW) dense slice of Â rows [t·NT, (t+1)·NT)
    restricted to source columns [s0[t], s0[t]+SW). Built ONCE per mesh
    (kernel A) and reused by every ``a_mul`` of that mesh (~20 per decoder
    step across gates, Chebyshev taps and head convs) — the one-hot
    expansion cost is paid per *remesh*, not per conv.

    ``live`` is the live-tile count ⌈n_nodes/NT⌉: tiles past it hold only
    padding nodes (their blocks are identically zero), so both kernels
    skip their matmuls and just write zeros — aggregation cost scales with
    the LIVE mesh, not the provisioned capacity (converged Moving-MNIST
    meshes use ~600 of 2048 slots ⇒ 5/16 tiles live).
    """

    s0: jnp.ndarray      # (T, 1) int32 — source-window start (16-aligned)
    blocks: jnp.ndarray  # (T, NT, SW) f32
    live: jnp.ndarray    # (1, 1) int32 — live-tile count


def _build_kernel(nt: int, sw: int):
    def kernel(live_ref, src_ref, dst_ref, cf_ref, out_ref):
        eb = src_ref.shape[-1]
        t = pl.program_id(0)

        @pl.when(t < live_ref[0, 0])
        def _build():
            src = src_ref[pl.ds(t, 1), :]  # (1, EB) src − s0[t]; −1 = dead
            dst = dst_ref[pl.ds(t, 1), :]  # (1, EB) dst − t·NT
            cf = cf_ref[pl.ds(t, 1), :]    # (1, EB)

            rows_d = jax.lax.broadcasted_iota(jnp.int32, (nt, eb), 0)
            oh_dst_w = jnp.where(rows_d == dst, cf, 0.0)       # (NT, EB)
            rows_s = jax.lax.broadcasted_iota(jnp.int32, (sw, eb), 0)
            oh_src_t = (rows_s == src).astype(jnp.float32)     # (SW, EB)
            out_ref[0] = jax.lax.dot_general(
                oh_dst_w, oh_src_t,
                dimension_numbers=(((1,), (1,)), ((), ())),    # (NT, SW)
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(out_ref.dtype)

        @pl.when(t >= live_ref[0, 0])
        def _dead():  # padding tiles: identically-zero blocks, no matmul
            out_ref[0] = jnp.zeros((nt, sw), out_ref.dtype)

    return kernel


def spmm_build_blocks(
    windows: SpmmWindows, nt: int, eb: int, sw: int, n_nodes=None,
    block_dtype=jnp.float32,
) -> SpmmBlocks:
    """Kernel A: densify each tile's edge window into an (NT, SW) Â block
    (one-hots live only in VMEM; entries are exact coeff sums).

    ``n_nodes`` (dynamic) bounds the live-tile count so padding tiles skip
    their matmuls in both kernels; None = treat every tile as live.
    ``block_dtype`` stores Â in the compute dtype (bf16 halves the largest
    scan-carry tensor and removes kernel B's per-call cast; entries are in
    [0, 1] so bf16 keeps ~3 significant digits).

    Â is non-differentiable by design — the reference detaches predictions
    before remeshing (ref seq2seq.py:440 ``.detach()``) and node positions
    are positional-encoding constants — so inputs are stop-gradiented here
    (the kernel has no JVP rule; spmm_apply's custom_vjp handles d/dz).
    """
    windows = jax.lax.stop_gradient(windows)
    t = windows.src_rel.shape[0]
    if n_nodes is None:
        live = jnp.full((1, 1), t, jnp.int32)
    else:
        n = jnp.clip(jnp.asarray(n_nodes, jnp.int32), 0, t * nt)
        live = ((n + nt - 1) // nt).reshape(1, 1)
    live = jax.lax.stop_gradient(live)
    blocks = pl.pallas_call(
        _build_kernel(nt, sw),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((t, eb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, eb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, eb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nt, sw), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, nt, sw), block_dtype),
        interpret=jax.default_backend() == "cpu",
    )(live, windows.src_rel, windows.dst_rel, windows.coeff)
    return SpmmBlocks(s0=windows.s0, blocks=blocks, live=live)


# ----------------------------------------------------- kernel B: apply Â·z


def _apply_kernel(sw: int, precision):
    def kernel(s0_ref, live_ref, m_ref, z_ref, out_ref):
        t = pl.program_id(0)  # (tile, f-tile) grid; f handled by BlockSpec

        @pl.when(t < live_ref[0, 0])
        def _mul():
            # meta builder aligns s0 with `& ~15`; the hint lets Mosaic
            # prove the dynamic row slice legal for sub-32-bit z (bf16
            # packs 2 rows/sublane)
            s0 = pl.multiple_of(s0_ref[t, 0], 16)
            zwin = z_ref[pl.ds(s0, sw), :]      # (SW, F)
            out_ref[:] = jnp.dot(
                m_ref[0], zwin,
                preferred_element_type=jnp.float32,
                precision=precision,
            ).astype(out_ref.dtype)

        @pl.when(t >= live_ref[0, 0])
        def _dead():  # padding tiles: Â block is zero ⇒ output is zero
            out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    return kernel


def _spmm_impl(z, meta: SpmmBlocks, n_max, nt, sw):
    t = meta.blocks.shape[0]
    np_ = t * nt
    f = z.shape[-1]
    zrows = max(_z_rows(np_, sw), sw)
    # Feature-axis tiling: z used to sit fully resident in VMEM, which
    # blows the 16 MiB scoped budget for very wide stacks (shared-mesh
    # batched gates reach F = B·2G·h·d — 2048×4096 bf16 = 16 MiB on its
    # own). Cap the per-program z block at ~6 MiB and sweep f-tiles as the
    # second grid axis; the Â block is re-fetched per f-tile (small, and
    # Mosaic overlaps the DMA with the previous tile's matmul).
    budget = 6 * 2**20
    ft = max(128, min(2048, budget // (zrows * z.dtype.itemsize)) & ~127)
    ft = min(ft, _round_up(f, 128))  # never pad past the old 128 granule
    fp = _round_up(f, ft)
    n_ft = fp // ft
    z_p = jnp.zeros((zrows, fp), z.dtype).at[:n_max, :f].set(z[:n_max])

    # bf16 operands feed the MXU natively (f32 accumulation via
    # preferred_element_type); HIGHEST is only meaningful — and only legal
    # on Mosaic — for f32 inputs.
    precision = (
        jax.lax.Precision.HIGHEST
        if z.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = pl.pallas_call(
        _apply_kernel(sw, precision),
        grid=(t, n_ft),
        in_specs=[
            pl.BlockSpec((t, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),             # s0
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),             # live tiles
            pl.BlockSpec((1, nt, sw), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # Â block
            pl.BlockSpec((zrows, ft), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),             # z f-slab
        ],
        out_specs=pl.BlockSpec((nt, ft), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((np_, fp), z.dtype),
        interpret=jax.default_backend() == "cpu",
    )(meta.s0, meta.live, meta.blocks.astype(z.dtype), z_p)
    return out[:n_max, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def spmm_apply(
    z: jnp.ndarray,
    meta: SpmmBlocks,
    n_max: int,
    nt: int,
    sw: int,
) -> jnp.ndarray:
    """``out[n] = Σ_{e : dst_e = n} coeff_e · z[src_e]`` — i.e. ``Â z``.

    ``meta`` must come from :func:`spmm_build_blocks` with the same
    (nt, sw). Differentiable in ``z`` only (Â is constant w.r.t. model
    inputs — see module docstring on symmetry).
    """
    return _spmm_impl(z, meta, n_max, nt, sw)


def _spmm_fwd(z, meta, n_max, nt, sw):
    return _spmm_impl(z, meta, n_max, nt, sw), meta


def _spmm_bwd(n_max, nt, sw, meta, g):
    # Â is symmetric → d z = Âᵀ g = Â g: the same kernel on the cotangent.
    return (_spmm_impl(g, meta, n_max, nt, sw), None)


spmm_apply.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_reference(z, coeff, edge_src, edge_dst, n_max):
    """XLA oracle for tests: gather → scale → segment-sum."""
    zs = jnp.take(z, jnp.minimum(edge_src, n_max - 1), axis=0)
    msg = coeff[:, None] * zs
    out = jax.ops.segment_sum(msg, edge_dst, num_segments=n_max + 1)
    return out[:n_max]

"""Fused Pallas stencil attention for the dense grid backend.

The committed flagship config (quadtree off, ref ice_exp.py:145,153-162)
runs TransformerConv over the regular pixel grid. The XLA lowering of
that attention (models/conv.py grid branch) materialises a family of
``(D, rows, cols, heads·d)`` intermediates per conv call — shifted
key/value planes plus the per-direction logits/softmax chain. An xplane
trace of the 224×304 flagship step shows those plane-shaped fusions and
their HBM↔VMEM copies dominate the decoder while-loop while the actual
projection matmuls cost ~3 ms/step — the step is bound by streaming
~17 MB intermediates that exist only because the chain is expressed as
separate XLA ops (docs/PERF_NOTES.md round 3).

This kernel fuses the whole aggregation — D static shifts, per-direction
edge terms, masked softmax over directions, dropout, weighted sum — into
one VMEM-resident program: q/k/v are read from HBM once and the output
written once. The q/k/v/skip *projections* stay outside in XLA (they are
MXU matmuls and nearly free).

Layout notes:
  * The grid is processed FLAT: for direction (dr, dc) the neighbour
    plane ``shift_in(z, dr, dc)`` equals a static slice of a
    ``cols``-padded flat array at offset ``dr·cols + dc`` — row shifts
    and column shifts are both 1-D slices, no 2-D window machinery.
    Column wrap-around (a ±1 column shift bleeding across a row edge)
    lands on pixels whose neighbour-validity mask is False, exactly as
    in ops/grid.neighbor_valid.
  * The program is TILED over row blocks (round-5 fix: the original
    single-block kernel kept full (P, H) planes in VMEM, which
    lane-pads H→128 and OOMs VMEM at the 224×304 flagship — every
    (68096, 32) bf16 operand window costs 16.6 MB). Each grid step
    processes ``B = r_blk·cols`` flat pixels; because the stencil halo
    is only ``w = cols+1`` flat elements, the block's padded k/v/valid
    window is reassembled in VMEM from the main block plus two tiny
    (w, ·) halo strips that are precomputed OUTSIDE the kernel as
    static slices — no overlapping block specs, no manual DMA. The
    block size is chosen by a VMEM model in :func:`_plan_blocks`.
    Flat-index arithmetic is block-invariant: ``B`` is a multiple of
    ``cols``, so ``global % cols == local % cols`` and the per-
    direction slice offsets are unchanged.
  * Per-head logit reduction and the head→channel broadcast run as
    selector matmuls ((H, heads) one-hots), never lane reshapes — the
    same trick as ops/pallas_attn.
  * The backward pass is flash-style: it replays the forward chain in
    VMEM (keeping only the windowed k/v buffers and the (B, heads)
    α planes live, never D×(B, H) shifted copies) and emits dq/dk/dv
    plus the per-direction edge-term gradient; shift adjoints are the
    opposite-offset static slices into the same windowed buffers.
    dk/dv halo spill (a block's gradient contribution to its
    neighbours' pixels) comes out as per-block (w, H) strips that are
    scatter-added outside the kernel.

Equivalence with the XLA grid chain (fwd, grads, masks, dropout with the
same keep draw, heads 1 and >1) is pinned by tests/test_grid.py.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_VMEM_LIMIT = 100 * 1024 * 1024
# target for the block planner — leave headroom under _VMEM_LIMIT for
# compiler temporaries and double buffering of the small inputs
_VMEM_BUDGET = 64 * 1024 * 1024


class GridAttnDims(NamedTuple):
    """Static geometry (hashable custom_vjp nondiff arg)."""

    rows: int
    cols: int
    heads: int
    d: int
    ndirs: int      # 4 or 8 (edges_at_corners)
    has_keep: bool  # dropout keep-scale planes supplied


def _offsets(ndirs, cols):
    """Flat-index offsets matching ops/grid.shifts_for order."""
    from quadtree_mpnnlstm_tpu.ops.grid import shifts_for

    shifts = shifts_for(ndirs == 8)
    return [dr * cols + dc for dr, dc in shifts], shifts


def _plan_blocks(dims: GridAttnDims):
    """Pick rows-per-block so the backward pass fits the VMEM budget.

    Every (B, x) f32 plane in the kernel lane-pads its minor dim to a
    multiple of 128, so plane bytes are ``B · max(128, ceil128(H)) · 4``.
    The backward keeps ~(4·D + 12) H-or-heads planes live plus the D
    dropout keep planes; one grid row contributes ``cols`` to B.
    """
    h = dims.heads * dims.d
    hpad = max(128, -(-h // 128) * 128)
    live = 5 * dims.ndirs + 14
    bytes_per_grid_row = dims.cols * hpad * 4 * live
    r_blk = max(1, min(dims.rows, _VMEM_BUDGET // bytes_per_grid_row))
    nb = -(-dims.rows // r_blk)
    r_blk = -(-dims.rows // nb)  # rebalance (e.g. 224/15 → 15 even blocks)
    # Mosaic requires a block's sublane dim (B = r_blk·cols) to be a
    # multiple of 8 unless the block covers the whole array: round
    # r_blk up so B % 8 == 0 when tiling (ice 304 / mnist 64 cols are
    # already 8-aligned; this guards odd grid widths).
    if nb > 1 and (r_blk * dims.cols) % 8:
        step = 8 // math.gcd(dims.cols, 8)
        r_blk = -(-r_blk // step) * step
        nb = -(-dims.rows // r_blk)
    return r_blk, nb


def _selectors(heads, d, dtype=jnp.float32):
    """(H, heads) one-hot: channel h belongs to head h // d."""
    h = heads * d
    ch = jax.lax.broadcasted_iota(jnp.int32, (h, heads), 0) // d
    hd = jax.lax.broadcasted_iota(jnp.int32, (h, heads), 1)
    return (ch == hd).astype(dtype)


def _col_ok(p, dc, cols):
    """(P, 1) mask: column c - dc stays inside [0, cols).

    Block-invariant: block sizes are multiples of ``cols``, so the local
    flat index is congruent to the global one mod ``cols``."""
    col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % cols
    if dc > 0:
        return (col >= dc).astype(jnp.float32)
    if dc < 0:
        return (col <= cols - 1 + dc).astype(jnp.float32)
    return jnp.ones((p, 1), jnp.float32)


def _placed(z, start, total):
    """(B, F) → (total, F) with z at row offset ``start`` (static),
    zeros elsewhere — a Mosaic-lowerable static scatter."""
    parts = []
    if start:
        parts.append(jnp.zeros((start, z.shape[1]), z.dtype))
    parts.append(z)
    rest = total - start - z.shape[0]
    if rest:
        parts.append(jnp.zeros((rest, z.shape[1]), z.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def _window(top_ref, main, bot_ref):
    """(w,F)+(B,F)+(w,F) → (B+2w, F): the padded stencil window of this
    block, reassembled in VMEM from the halo strips."""
    return jnp.concatenate(
        [top_ref[0].astype(main.dtype), main, bot_ref[0].astype(main.dtype)],
        axis=0,
    )


def _softmax_state(dims: GridAttnDims, b, q, kwin, validwin, valid, e):
    """Replay logits → masked softmax over directions for one block.

    Keeps only (B, heads)/(B, 1) planes live. Returns (alphas, nbvs) —
    lists of (B, heads) softmax weights and (B, 1) neighbour masks.
    """
    cols, heads, d = dims.cols, dims.heads, dims.d
    w = cols + 1
    scale = 1.0 / float(d) ** 0.5
    offs, shifts = _offsets(dims.ndirs, cols)
    sel = _selectors(heads, d)

    nbvs, logits = [], []
    for i, off in enumerate(offs):
        start = w - off  # z_shift[j] = z[j - off] = zwin[j + w - off]
        kj = jax.lax.slice_in_dim(kwin, start, start + b) + e[i][None, :]
        nb = (
            jax.lax.slice_in_dim(validwin, start, start + b)
            * valid
            * _col_ok(b, shifts[i][1], cols)
        )  # (B, 1)
        lg = jax.lax.dot_general(         # (B, heads) per-head reduction
            q * kj, sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits.append(jnp.where(nb > 0, lg, _NEG))
        nbvs.append(nb)

    mx = logits[0]
    for lg in logits[1:]:
        mx = jnp.maximum(mx, lg)
    exs = [
        jnp.where(nb > 0, jnp.exp(lg - mx), 0.0)
        for lg, nb in zip(logits, nbvs)
    ]
    den = exs[0]
    for ex in exs[1:]:
        den = den + ex
    den = jnp.maximum(den, 1e-30)
    return [ex / den for ex in exs], nbvs


def _fwd_kernel(dims: GridAttnDims, b):
    cols, heads, d = dims.cols, dims.heads, dims.d
    w = cols + 1
    h = heads * d
    offs, _ = _offsets(dims.ndirs, cols)

    def kernel(*refs):
        sel = _selectors(heads, d)
        if dims.has_keep:
            (q_ref, k_ref, kt_ref, kb_ref, v_ref, vt_ref, vb_ref, e_ref,
             valid_ref, vlt_ref, vlb_ref, keep_ref, out_ref) = refs
            keep = keep_ref[...].astype(jnp.float32)
        else:
            (q_ref, k_ref, kt_ref, kb_ref, v_ref, vt_ref, vb_ref, e_ref,
             valid_ref, vlt_ref, vlb_ref, out_ref) = refs
            keep = None
        q = q_ref[...].astype(jnp.float32)
        e = e_ref[...].astype(jnp.float32)
        valid = valid_ref[...].astype(jnp.float32)
        kwin = _window(kt_ref, k_ref[...].astype(jnp.float32), kb_ref)
        vwin = _window(vt_ref, v_ref[...].astype(jnp.float32), vb_ref)
        validwin = _window(vlt_ref, valid, vlb_ref)

        alphas, _ = _softmax_state(dims, b, q, kwin, validwin, valid, e)
        out = jnp.zeros((b, h), jnp.float32)
        for i, off in enumerate(offs):
            start = w - off
            vj = jax.lax.slice_in_dim(vwin, start, start + b) + e[i][None, :]
            used = alphas[i] if keep is None else alphas[i] * keep[i]
            used_chan = jax.lax.dot_general(              # (B, H)
                used, sel,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = out + used_chan * vj
        out_ref[...] = out.astype(out_ref.dtype)

    return kernel


def _bwd_kernel(dims: GridAttnDims, b):
    cols, heads, d = dims.cols, dims.heads, dims.d
    w = cols + 1
    h = heads * d
    scale = 1.0 / float(d) ** 0.5
    offs, _ = _offsets(dims.ndirs, cols)

    def kernel(*refs):
        sel = _selectors(heads, d)
        if dims.has_keep:
            (q_ref, k_ref, kt_ref, kb_ref, v_ref, vt_ref, vb_ref, e_ref,
             valid_ref, vlt_ref, vlb_ref, keep_ref, g_ref,
             dq_ref, dk_ref, dkt_ref, dkb_ref,
             dv_ref, dvt_ref, dvb_ref, de_ref) = refs
            keep = keep_ref[...].astype(jnp.float32)
        else:
            (q_ref, k_ref, kt_ref, kb_ref, v_ref, vt_ref, vb_ref, e_ref,
             valid_ref, vlt_ref, vlb_ref, g_ref,
             dq_ref, dk_ref, dkt_ref, dkb_ref,
             dv_ref, dvt_ref, dvb_ref, de_ref) = refs
            keep = None
        q = q_ref[...].astype(jnp.float32)
        e = e_ref[...].astype(jnp.float32)
        valid = valid_ref[...].astype(jnp.float32)
        kwin = _window(kt_ref, k_ref[...].astype(jnp.float32), kb_ref)
        vwin = _window(vt_ref, v_ref[...].astype(jnp.float32), vb_ref)
        validwin = _window(vlt_ref, valid, vlb_ref)
        g = g_ref[...].astype(jnp.float32)  # (B, H)

        alphas, nbvs = _softmax_state(
            dims, b, q, kwin, validwin, valid, e
        )

        # d α (pre-dropout, per head): keep·(g · vj), head-reduced
        dalphas = []
        for i, off in enumerate(offs):
            start = w - off
            vj = jax.lax.slice_in_dim(vwin, start, start + b) + e[i][None, :]
            gv = jax.lax.dot_general(                     # (B, heads)
                g * vj, sel,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dalphas.append(gv if keep is None else gv * keep[i])

        rowdot = alphas[0] * dalphas[0]
        for i in range(1, dims.ndirs):
            rowdot = rowdot + alphas[i] * dalphas[i]

        dq = jnp.zeros((b, h), jnp.float32)
        dkwin = jnp.zeros((b + 2 * w, h), jnp.float32)
        dvwin = jnp.zeros((b + 2 * w, h), jnp.float32)
        des = []
        for i, off in enumerate(offs):
            start = w - off
            kj = jax.lax.slice_in_dim(kwin, start, start + b) + e[i][None, :]
            dlog = alphas[i] * (dalphas[i] - rowdot) * scale  # (B, heads)
            dlog = jnp.where(nbvs[i] > 0, dlog, 0.0)
            dlog_chan = jax.lax.dot_general(                  # (B, H)
                dlog, sel,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dq = dq + dlog_chan * kj
            dkj = dlog_chan * q
            used = alphas[i] if keep is None else alphas[i] * keep[i]
            used_chan = jax.lax.dot_general(
                used, sel,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dvj = used_chan * g
            # kj[j] = k[j - off] + e ⇒ dk[j - off] += dkj[j]: place the
            # (B, H) contribution at static offset ``start`` in the
            # window and sum. Mosaic has no dynamic_update_slice, but
            # ``start`` is a Python int, so zero-pad + add lowers as
            # static concatenates.
            dkwin = dkwin + _placed(dkj, start, b + 2 * w)
            dvwin = dvwin + _placed(dvj, start, b + 2 * w)
            des.append(jnp.sum(dkj + dvj, axis=0))
        dq_ref[...] = dq.astype(dq_ref.dtype)
        dk_ref[...] = jax.lax.slice_in_dim(dkwin, w, w + b).astype(
            dk_ref.dtype
        )
        dkt_ref[...] = jax.lax.slice_in_dim(dkwin, 0, w)[None].astype(
            dkt_ref.dtype
        )
        dkb_ref[...] = jax.lax.slice_in_dim(dkwin, w + b, b + 2 * w)[
            None
        ].astype(dkb_ref.dtype)
        dv_ref[...] = jax.lax.slice_in_dim(dvwin, w, w + b).astype(
            dv_ref.dtype
        )
        dvt_ref[...] = jax.lax.slice_in_dim(dvwin, 0, w)[None].astype(
            dvt_ref.dtype
        )
        dvb_ref[...] = jax.lax.slice_in_dim(dvwin, w + b, b + 2 * w)[
            None
        ].astype(dvb_ref.dtype)
        de_ref[...] = jnp.stack(des)[None].astype(de_ref.dtype)

    return kernel


def _halos(z, nb, b, w):
    """Per-block stencil halo strips of the zero-padded flat array.

    ``zg = [0_w; z; 0_w]``; block i's window is ``zg[i·B : i·B+B+2w)``,
    whose first/last w rows are these strips (the middle B rows are
    exactly block i of ``z``). Static unrolled slices — nb is small.
    """
    f = z.shape[1]
    pad = jnp.zeros((w, f), z.dtype)
    zg = jnp.concatenate([pad, z, pad], axis=0)
    tops = jnp.stack(
        [jax.lax.slice_in_dim(zg, i * b, i * b + w) for i in range(nb)]
    )
    bots = jnp.stack(
        [
            jax.lax.slice_in_dim(zg, i * b + b + w, i * b + 2 * w + b)
            for i in range(nb)
        ]
    )
    return tops, bots


def _combine_halo(main, tops, bots, nb, b, w, p):
    """Scatter-add per-block dk/dv halo strips back into (P, H)."""
    f = main.shape[1]
    acc = jnp.zeros((nb * b + 2 * w, f), jnp.float32)
    acc = jax.lax.dynamic_update_slice_in_dim(
        acc, main.astype(jnp.float32), w, axis=0
    )
    for i in range(nb):
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc,
            jax.lax.dynamic_slice_in_dim(acc, i * b, w)
            + tops[i].astype(jnp.float32),
            i * b, axis=0,
        )
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc,
            jax.lax.dynamic_slice_in_dim(acc, i * b + b + w, w)
            + bots[i].astype(jnp.float32),
            i * b + b + w, axis=0,
        )
    return jax.lax.slice_in_dim(acc, w, w + p)


def _pad_p(z, ppad):
    """Zero-pad the flat node axis to the block-planned length."""
    p = z.shape[0]
    if p == ppad:
        return z
    return jnp.concatenate(
        [z, jnp.zeros((ppad - p,) + z.shape[1:], z.dtype)], axis=0
    )


def _blocked_args(q, k, v, e_dir, valid, keep, dims, nb, b):
    """Pad inputs to nb·B nodes and build halo strips + block specs."""
    w = dims.cols + 1
    ppad = nb * b
    qp = _pad_p(q, ppad)
    kp = _pad_p(k, ppad)
    vp = _pad_p(v, ppad)
    validp = _pad_p(valid, ppad)
    kt, kb = _halos(kp, nb, b, w)
    vt, vb = _halos(vp, nb, b, w)
    vlt, vlb = _halos(validp, nb, b, w)
    h = q.shape[1]

    blk = pl.BlockSpec((b, h), lambda i: (i, 0))
    strip = pl.BlockSpec((1, w, h), lambda i: (i, 0, 0))
    vblk = pl.BlockSpec((b, 1), lambda i: (i, 0))
    vstrip = pl.BlockSpec((1, w, 1), lambda i: (i, 0, 0))
    espec = pl.BlockSpec(e_dir.shape, lambda i: (0, 0))

    args = [qp, kp, kt, kb, vp, vt, vb, e_dir, validp, vlt, vlb]
    specs = [blk, blk, strip, strip, blk, strip, strip, espec, vblk,
             vstrip, vstrip]
    if dims.has_keep:
        keepp = jnp.concatenate(
            [
                keep,
                jnp.zeros(
                    (dims.ndirs, ppad - keep.shape[1], dims.heads),
                    keep.dtype,
                ),
            ],
            axis=1,
        ) if keep.shape[1] != ppad else keep
        args.append(keepp)
        specs.append(
            pl.BlockSpec((dims.ndirs, b, dims.heads), lambda i: (0, i, 0))
        )
    return args, specs, blk, strip, ppad


def _call(kernel, nb, out_shapes, out_specs, args, in_specs):
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() == "cpu",
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def grid_attn_apply(q, k, v, e_dir, valid, keep, dims: GridAttnDims):
    """Fused stencil attention over the pixel grid.

    Args:
      q/k/v: (P, heads·d) projected node features (P = rows·cols).
      e_dir: (D, heads·d) per-direction edge projections
        (``grid_attr @ we``) — zeros when the conv has no edge term.
      valid: (P, 1) float validity plane.
      keep: (D, P, heads) dropout keep-scale or None (deterministic).
      dims: static geometry; ``dims.has_keep`` must match ``keep``.

    Returns (P, heads·d) aggregated messages. Differentiable in q, k, v
    and e_dir; α is never materialised in HBM (flash-style backward).
    """
    p, h = q.shape
    r_blk, nb = _plan_blocks(dims)
    b = r_blk * dims.cols
    args, specs, blk, _, ppad = _blocked_args(
        q, k, v, e_dir, valid, keep, dims, nb, b
    )
    out_shape = jax.ShapeDtypeStruct((ppad, h), q.dtype)
    out = _call(_fwd_kernel(dims, b), nb, out_shape, blk, args, specs)
    return jax.lax.slice_in_dim(out, 0, p)


def _fwd_rule(q, k, v, e_dir, valid, keep, dims):
    return grid_attn_apply(q, k, v, e_dir, valid, keep, dims), (
        q, k, v, e_dir, valid, keep,
    )


def _bwd_rule(dims, res, g):
    q, k, v, e_dir, valid, keep = res
    p, h = q.shape
    w = dims.cols + 1
    r_blk, nb = _plan_blocks(dims)
    b = r_blk * dims.cols
    args, specs, blk, strip, ppad = _blocked_args(
        q, k, v, e_dir, valid, keep, dims, nb, b
    )
    args = args + [_pad_p(g, ppad)]
    specs = specs + [blk]
    out_shapes = [
        jax.ShapeDtypeStruct((ppad, h), q.dtype),              # dq
        # dk/dv main come out f32 so the halo scatter-add outside keeps
        # the old single-cast accumulation numerics under bf16 inputs
        jax.ShapeDtypeStruct((ppad, h), jnp.float32),          # dk main
        jax.ShapeDtypeStruct((nb, w, h), jnp.float32),         # dk top
        jax.ShapeDtypeStruct((nb, w, h), jnp.float32),         # dk bot
        jax.ShapeDtypeStruct((ppad, h), jnp.float32),          # dv main
        jax.ShapeDtypeStruct((nb, w, h), jnp.float32),         # dv top
        jax.ShapeDtypeStruct((nb, w, h), jnp.float32),         # dv bot
        jax.ShapeDtypeStruct((nb, dims.ndirs, h), jnp.float32),  # de
    ]
    fstrip = pl.BlockSpec((1, w, h), lambda i: (i, 0, 0))
    despec = pl.BlockSpec((1, dims.ndirs, h), lambda i: (i, 0, 0))
    out_specs = [blk, blk, fstrip, fstrip, blk, fstrip, fstrip, despec]
    dq, dkm, dkt, dkb, dvm, dvt, dvb, de = _call(
        _bwd_kernel(dims, b), nb, out_shapes, out_specs, args, specs
    )
    dk = _combine_halo(dkm, dkt, dkb, nb, b, w, p).astype(k.dtype)
    dv = _combine_halo(dvm, dvt, dvb, nb, b, w, p).astype(v.dtype)
    return (
        jax.lax.slice_in_dim(dq, 0, p),
        dk,
        dv,
        jnp.sum(de, axis=0).astype(e_dir.dtype),
        None,
        None,
    )


grid_attn_apply.defvjp(_fwd_rule, _bwd_rule)

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
  * Per-head logit reduction and the head→channel broadcast run as
    selector matmuls ((H, heads) one-hots), never lane reshapes — the
    same trick as ops/pallas_attn.
  * The backward pass is flash-style: it replays the forward chain in
    VMEM (keeping only the cols-padded k/v buffers and the (P, heads)
    α planes live, never D×(P, H) shifted copies) and emits dq/dk/dv
    plus the per-direction edge-term gradient; shift adjoints are the
    opposite-offset static slices into the same padded buffers.

Equivalence with the XLA grid chain (fwd, grads, masks, dropout with the
same keep draw, heads 1 and >1) is pinned by tests/test_grid.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_VMEM_LIMIT = 100 * 1024 * 1024


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


def _selectors(heads, d, dtype=jnp.float32):
    """(H, heads) one-hot: channel h belongs to head h // d."""
    h = heads * d
    ch = jax.lax.broadcasted_iota(jnp.int32, (h, heads), 0) // d
    hd = jax.lax.broadcasted_iota(jnp.int32, (h, heads), 1)
    return (ch == hd).astype(dtype)


def _col_ok(p, dc, cols):
    """(P, 1) mask: column c - dc stays inside [0, cols)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % cols
    if dc > 0:
        return (col >= dc).astype(jnp.float32)
    if dc < 0:
        return (col <= cols - 1 + dc).astype(jnp.float32)
    return jnp.ones((p, 1), jnp.float32)


def _pad_rows(z, w):
    """(P, F) → (P + 2·w, F) with a zero block of w rows on each side.

    ``w = cols + 1`` covers every stencil offset incl. the ±(cols+1)
    corner directions."""
    pad = jnp.zeros((w, z.shape[1]), z.dtype)
    return jnp.concatenate([pad, z, pad], axis=0)


def _softmax_state(dims: GridAttnDims, q, kpad, validpad, valid, e):
    """Replay logits → masked softmax over directions.

    Keeps only (P, heads)/(P, 1) planes live. Returns (alphas, nbvs) —
    lists of (P, heads) softmax weights and (P, 1) neighbour masks.
    """
    cols, heads, d = dims.cols, dims.heads, dims.d
    p = dims.rows * cols
    w = cols + 1
    scale = 1.0 / float(d) ** 0.5
    offs, shifts = _offsets(dims.ndirs, cols)
    sel = _selectors(heads, d)

    nbvs, logits = [], []
    for i, off in enumerate(offs):
        start = w - off  # z_shift[j] = z[j - off] = zpad[j + w - off]
        kj = jax.lax.slice_in_dim(kpad, start, start + p) + e[i][None, :]
        nb = (
            jax.lax.slice_in_dim(validpad, start, start + p)
            * valid
            * _col_ok(p, shifts[i][1], cols)
        )  # (P, 1)
        lg = jax.lax.dot_general(         # (P, heads) per-head reduction
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


def _fwd_kernel(dims: GridAttnDims):
    cols, heads, d = dims.cols, dims.heads, dims.d
    p = dims.rows * cols
    w = cols + 1
    h = heads * d
    offs, _ = _offsets(dims.ndirs, cols)

    def kernel(*refs):
        sel = _selectors(heads, d)
        if dims.has_keep:
            q_ref, k_ref, v_ref, e_ref, valid_ref, keep_ref, out_ref = refs
            keep = keep_ref[...].astype(jnp.float32)
        else:
            q_ref, k_ref, v_ref, e_ref, valid_ref, out_ref = refs
            keep = None
        q = q_ref[...].astype(jnp.float32)
        e = e_ref[...].astype(jnp.float32)
        valid = valid_ref[...].astype(jnp.float32)
        kpad = _pad_rows(k_ref[...].astype(jnp.float32), w)
        vpad = _pad_rows(v_ref[...].astype(jnp.float32), w)
        validpad = _pad_rows(valid, w)

        alphas, _ = _softmax_state(dims, q, kpad, validpad, valid, e)
        out = jnp.zeros((p, h), jnp.float32)
        for i, off in enumerate(offs):
            start = w - off
            vj = jax.lax.slice_in_dim(vpad, start, start + p) + e[i][None, :]
            used = alphas[i] if keep is None else alphas[i] * keep[i]
            used_chan = jax.lax.dot_general(              # (P, H)
                used, sel,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = out + used_chan * vj
        out_ref[...] = out.astype(out_ref.dtype)

    return kernel


def _bwd_kernel(dims: GridAttnDims):
    cols, heads, d = dims.cols, dims.heads, dims.d
    p = dims.rows * cols
    w = cols + 1
    h = heads * d
    scale = 1.0 / float(d) ** 0.5
    offs, _ = _offsets(dims.ndirs, cols)

    def kernel(*refs):
        sel = _selectors(heads, d)
        if dims.has_keep:
            (q_ref, k_ref, v_ref, e_ref, valid_ref, keep_ref, g_ref,
             dq_ref, dk_ref, dv_ref, de_ref) = refs
            keep = keep_ref[...].astype(jnp.float32)
        else:
            (q_ref, k_ref, v_ref, e_ref, valid_ref, g_ref,
             dq_ref, dk_ref, dv_ref, de_ref) = refs
            keep = None
        q = q_ref[...].astype(jnp.float32)
        e = e_ref[...].astype(jnp.float32)
        valid = valid_ref[...].astype(jnp.float32)
        kpad = _pad_rows(k_ref[...].astype(jnp.float32), w)
        vpad = _pad_rows(v_ref[...].astype(jnp.float32), w)
        validpad = _pad_rows(valid, w)
        g = g_ref[...].astype(jnp.float32)  # (P, H)

        alphas, nbvs = _softmax_state(dims, q, kpad, validpad, valid, e)

        # d α (pre-dropout, per head): keep·(g · vj), head-reduced
        dalphas = []
        for i, off in enumerate(offs):
            start = w - off
            vj = jax.lax.slice_in_dim(vpad, start, start + p) + e[i][None, :]
            gv = jax.lax.dot_general(                     # (P, heads)
                g * vj, sel,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dalphas.append(gv if keep is None else gv * keep[i])

        rowdot = alphas[0] * dalphas[0]
        for i in range(1, dims.ndirs):
            rowdot = rowdot + alphas[i] * dalphas[i]

        dq = jnp.zeros((p, h), jnp.float32)
        dkpad = jnp.zeros((p + 2 * w, h), jnp.float32)
        dvpad = jnp.zeros((p + 2 * w, h), jnp.float32)
        des = []
        for i, off in enumerate(offs):
            start = w - off
            kj = jax.lax.slice_in_dim(kpad, start, start + p) + e[i][None, :]
            dlog = alphas[i] * (dalphas[i] - rowdot) * scale  # (P, heads)
            dlog = jnp.where(nbvs[i] > 0, dlog, 0.0)
            dlog_chan = jax.lax.dot_general(                  # (P, H)
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
            # kj[j] = k[j - off] + e ⇒ dk[j - off] += dkj[j]: accumulate
            # into the padded buffer at the same static window the
            # forward slice read from
            dkpad = jax.lax.dynamic_update_slice_in_dim(
                dkpad,
                jax.lax.dynamic_slice_in_dim(dkpad, start, p) + dkj,
                start, axis=0,
            )
            dvpad = jax.lax.dynamic_update_slice_in_dim(
                dvpad,
                jax.lax.dynamic_slice_in_dim(dvpad, start, p) + dvj,
                start, axis=0,
            )
            des.append(jnp.sum(dkj + dvj, axis=0))
        dq_ref[...] = dq.astype(dq_ref.dtype)
        dk_ref[...] = jax.lax.slice_in_dim(dkpad, w, w + p).astype(
            dk_ref.dtype
        )
        dv_ref[...] = jax.lax.slice_in_dim(dvpad, w, w + p).astype(
            dv_ref.dtype
        )
        de_ref[...] = jnp.stack(des).astype(de_ref.dtype)

    return kernel


def _call(kernel, dims: GridAttnDims, out_shapes, args):
    specs = [
        pl.BlockSpec(a.shape, lambda *_, nd=a.ndim: (0,) * nd)
        for a in args
    ]
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=specs,
        out_specs=jax.tree.map(
            lambda s: pl.BlockSpec(
                s.shape, lambda *_, nd=len(s.shape): (0,) * nd
            ),
            out_shapes,
        ),
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
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    args = [q, k, v, e_dir, valid] + ([keep] if dims.has_keep else [])
    return _call(_fwd_kernel(dims), dims, out_shape, args)


def _fwd_rule(q, k, v, e_dir, valid, keep, dims):
    return grid_attn_apply(q, k, v, e_dir, valid, keep, dims), (
        q, k, v, e_dir, valid, keep,
    )


def _bwd_rule(dims, res, g):
    q, k, v, e_dir, valid, keep = res
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
        jax.ShapeDtypeStruct(e_dir.shape, jnp.float32),
    ]
    args = [q, k, v, e_dir, valid] + ([keep] if dims.has_keep else [])
    dq, dk, dv, de = _call(
        _bwd_kernel(dims), dims, out_shapes, args + [g]
    )
    return dq, dk, dv, de.astype(e_dir.dtype), None, None


grid_attn_apply.defvjp(_fwd_rule, _bwd_rule)

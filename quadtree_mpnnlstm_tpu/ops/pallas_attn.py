"""Fused Pallas attention aggregation for quadtree meshes.

TransformerConv is the conv the reference's flagship actually ships
(ref ice_exp.py:153-162, model/model.py:51), and its XLA lowering —
gather q/k/v per edge → edge-softmax (segment max + segment sum) →
scatter-add — is the per-edge irregular-op pattern measured ~50× below
HBM bandwidth on v5e (docs/PERF_NOTES.md). This kernel fuses the whole
chain per 128-node destination tile using the same dst-sorted contiguous
edge windows as the fused SpMM (ops/pallas_spmm.window_geometry):

    e    (HD, EB) = Wₑᵀ · attrᵀ              # per-window edge projection
    kj   (HD, EB) = k[s0:s0+SW]ᵀ · oh_src + e # gather as matmul
    qe   (HD, EB) = q_tileᵀ · oh_dst
    lg_h (1, EB)  = sel_hᵀ · (qe ⊙ kj) / √d   # per-head logits
    P_h  (NT, EB) = rowwise masked softmax of lg_h over dst-match columns
    out  (NT, HD) = Σ_h (P_h ⊙ keep) · (vj ⊙ head_h)ᵀ

Everything is laid out **edges-on-lanes** ((HD, EB) operands), so no
transposes or reshapes are ever materialised — gathers/scatters become
one-hot matmuls on the MXU and the edge softmax becomes a row-wise
masked softmax of an (NT, EB) matrix in VMEM. The backward pass is a
second kernel in the same layout (flash-attention style recompute): dq
accumulates block-aligned per tile; dk/dv come out as per-tile source
windows combined by one segment-sum outside; dWₑ as per-tile (A, HD)
contributions summed outside. Dropout is a per-window keep-scale matrix
generated outside with the layer's flax RNG.

Window capacity misses are counted by the meta builder into
``GraphTensors.overflow`` (never silent), like every other capacity knob.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quadtree_mpnnlstm_tpu.ops.pallas_spmm import (
    _round_up,
    _z_rows,
    window_geometry,
)

_NEG = -1e30

# The default scoped-VMEM budget is 16 MB; the fused-gate configurations
# (heads_total up to 24, EB/SW up to 2048) legitimately use more of the
# chip's 128 MB VMEM for their working mats, so raise the cap for these
# kernels (the Mosaic allocator still errors loudly if a config exceeds
# physical VMEM).
_VMEM_LIMIT = 100 * 1024 * 1024


class AttnMeta(NamedTuple):
    """Per-mesh attention windows (pytree; cached on GraphTensors)."""

    s0: jnp.ndarray       # (T, 1) int32 — 16-aligned source-window starts
    src_rel: jnp.ndarray  # (T, EB) int32 — src − s0[t]; −1 = dead slot
    dst_rel: jnp.ndarray  # (T, EB) int32 — dst − t·NT; −1 = dead slot
    attr_t: jnp.ndarray   # (T, A, EB) f32 — edge attrs, transposed per tile
    live: jnp.ndarray     # (1, 1) int32 — live-tile count


class AttnDims(NamedTuple):
    """Static kernel geometry (hashable custom_vjp nondiff arg)."""

    n_max: int
    nt: int
    eb: int
    sw: int
    heads: int
    d: int


def attn_tile_meta(
    edge_src, edge_dst, edge_attr, n_max, nt, eb, sw, n_nodes=None
):
    """Pack per-tile windows for the fused attention kernel.

    Returns (AttnMeta, overflow). ``edge_attr`` is (E, A) — bearing and
    distance (ref graph_functions.py:347-353)."""
    geo = window_geometry(edge_src, edge_dst, n_max, nt, eb, sw)
    t = geo["src_rel"].shape[0]
    a = edge_attr.shape[-1]
    attr_w = jnp.take(
        edge_attr.astype(jnp.float32), geo["flat_idx"], axis=0
    ).reshape(t, eb, a)
    attr_w = jnp.where(geo["in_tile"][..., None], attr_w, 0.0)
    if n_nodes is None:
        live = jnp.full((1, 1), t, jnp.int32)
    else:
        n = jnp.clip(jnp.asarray(n_nodes, jnp.int32), 0, t * nt)
        live = ((n + nt - 1) // nt).reshape(1, 1)
    meta = AttnMeta(
        s0=geo["s0"][:, None],
        src_rel=geo["src_rel"],
        dst_rel=geo["dst_rel"],
        attr_t=attr_w.transpose(0, 2, 1),  # (T, A, EB): edges on lanes
        live=live,
    )
    return meta, geo["overflow"]


def _head_selectors(heads, d, hdp, dtype=jnp.float32):
    """In-kernel helpers: row index → head id comparisons."""
    row_head = jax.lax.broadcasted_iota(jnp.int32, (hdp, 1), 0) // d
    return row_head  # (HDP, 1); rows ≥ heads*d map past every head


def _fwd_kernel(dims: AttnDims, a: int, hdp: int, kh_rows: int):
    nt, eb, sw = dims.nt, dims.eb, dims.sw
    heads, d = dims.heads, dims.d
    scale = 1.0 / float(d) ** 0.5

    def kernel(s0_ref, live_ref, src_ref, dst_ref, keep_ref, attr_ref,
               we_ref, q_ref, k_ref, v_ref, out_ref):
        t = pl.program_id(0)

        @pl.when(t < live_ref[0, 0])
        def _():
            f32 = jnp.float32
            s0 = pl.multiple_of(s0_ref[t, 0], 16)
            src = src_ref[pl.ds(t, 1), :]            # (1, EB)
            dst = dst_ref[pl.ds(t, 1), :]            # (1, EB)
            keepmat = keep_ref[0]                    # (KH, EB)
            attr = attr_ref[0]                       # (A, EB)

            e = jax.lax.dot_general(                 # (HDP, EB)
                we_ref[:], attr,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            rows_s = jax.lax.broadcasted_iota(jnp.int32, (sw, eb), 0)
            oh_src = (rows_s == src).astype(f32)     # (SW, EB)
            kwin = k_ref[pl.ds(s0, sw), :].astype(f32)
            vwin = v_ref[pl.ds(s0, sw), :].astype(f32)
            kj = jax.lax.dot_general(                # (HDP, EB)
                kwin, oh_src,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + e
            vj = jax.lax.dot_general(
                vwin, oh_src,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + e

            rows_d = jax.lax.broadcasted_iota(jnp.int32, (nt, eb), 0)
            m_dst = rows_d == dst                    # (NT, EB)
            q_tile = q_ref[...].astype(f32)          # (NT, HDP)
            qe = jax.lax.dot_general(                # (HDP, EB)
                q_tile, m_dst.astype(f32),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            prod = qe * kj                           # (HDP, EB)

            row_head = _head_selectors(heads, d, hdp)
            out = jnp.zeros((nt, hdp), f32)
            for h in range(heads):
                mask_h = (row_head == h).astype(f32)     # (HDP, 1)
                lg = jax.lax.dot_general(                # (1, EB)
                    mask_h, prod,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ) * scale
                logits = jnp.where(m_dst, jnp.broadcast_to(lg, (nt, eb)),
                                   _NEG)
                mx = jnp.max(logits, axis=1, keepdims=True)
                p = jnp.where(m_dst, jnp.exp(logits - mx), 0.0)
                den = jnp.sum(p, axis=1, keepdims=True)
                alpha = p / jnp.maximum(den, 1e-30)
                kh = keepmat[min(h, kh_rows - 1) : min(h, kh_rows - 1) + 1, :]
                alpha = alpha * jnp.broadcast_to(kh, (nt, eb))
                out = out + jax.lax.dot_general(         # (NT, HDP)
                    alpha, vj * mask_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
            out_ref[...] = out.astype(out_ref.dtype)

        @pl.when(t >= live_ref[0, 0])
        def _dead():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    return kernel


def _bwd_kernel(dims: AttnDims, a: int, hdp: int, kh_rows: int):
    nt, eb, sw = dims.nt, dims.eb, dims.sw
    heads, d = dims.heads, dims.d
    scale = 1.0 / float(d) ** 0.5

    def kernel(s0_ref, live_ref, src_ref, dst_ref, keep_ref, attr_ref,
               we_ref, q_ref, k_ref, v_ref, g_ref,
               dq_ref, dkw_ref, dvw_ref, dwe_ref):
        t = pl.program_id(0)

        @pl.when(t < live_ref[0, 0])
        def _():
            f32 = jnp.float32
            s0 = pl.multiple_of(s0_ref[t, 0], 16)
            src = src_ref[pl.ds(t, 1), :]
            dst = dst_ref[pl.ds(t, 1), :]
            keepmat = keep_ref[0]                    # (KH, EB)
            attr = attr_ref[0]

            # ---- recompute the forward tile (flash-style)
            e = jax.lax.dot_general(
                we_ref[:], attr,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            rows_s = jax.lax.broadcasted_iota(jnp.int32, (sw, eb), 0)
            oh_src = (rows_s == src).astype(f32)
            kwin = k_ref[pl.ds(s0, sw), :].astype(f32)
            vwin = v_ref[pl.ds(s0, sw), :].astype(f32)
            kj = jax.lax.dot_general(
                kwin, oh_src,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + e
            vj = jax.lax.dot_general(
                vwin, oh_src,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) + e
            rows_d = jax.lax.broadcasted_iota(jnp.int32, (nt, eb), 0)
            m_dst = rows_d == dst
            m_dst_f = m_dst.astype(f32)
            q_tile = q_ref[...].astype(f32)
            qe = jax.lax.dot_general(
                q_tile, m_dst_f,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            prod = qe * kj

            g_tile = g_ref[...].astype(f32)          # (NT, HDP)
            row_head = _head_selectors(heads, d, hdp)
            col_head = (
                jax.lax.broadcasted_iota(jnp.int32, (1, hdp), 1) // d
            )

            dqe = jnp.zeros((hdp, eb), f32)
            dkj = jnp.zeros((hdp, eb), f32)
            dvj = jnp.zeros((hdp, eb), f32)
            for h in range(heads):
                mask_h = (row_head == h).astype(f32)
                lg = jax.lax.dot_general(
                    mask_h, prod,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ) * scale
                logits = jnp.where(m_dst, jnp.broadcast_to(lg, (nt, eb)),
                                   _NEG)
                mx = jnp.max(logits, axis=1, keepdims=True)
                p = jnp.where(m_dst, jnp.exp(logits - mx), 0.0)
                den = jnp.sum(p, axis=1, keepdims=True)
                alpha = p / jnp.maximum(den, 1e-30)  # pre-dropout softmax
                kh = keepmat[min(h, kh_rows - 1) : min(h, kh_rows - 1) + 1, :]
                keep_b = jnp.broadcast_to(kh, (nt, eb))

                g_h = g_tile * (col_head == h).astype(f32)  # zero other heads
                # d vj (head rows): Σ_n (α·keep)[n,e] g_h[n,:]
                dvj_h = jax.lax.dot_general(             # (HDP, EB)
                    g_h, alpha * keep_b,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
                dvj = dvj + dvj_h * mask_h
                # d α (pre-dropout): (g_h · vj_h)[n,e] · keep[e]
                dalpha = jax.lax.dot_general(            # (NT, EB)
                    g_h, vj * mask_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ) * keep_b
                rowdot = jnp.sum(alpha * dalpha, axis=1, keepdims=True)
                dlog = alpha * (dalpha - rowdot)         # (NT, EB)
                # each edge column has one dst row → column sum extracts it
                dlg = jnp.sum(dlog, axis=0, keepdims=True) * scale  # (1, EB)
                dlg_b = jnp.broadcast_to(dlg, (hdp, eb))
                dqe = dqe + kj * mask_h * dlg_b
                dkj = dkj + qe * mask_h * dlg_b

            de = dkj + dvj
            # dq: one dst row per edge column → oh_dst · dqeᵀ
            dq_ref[...] = jax.lax.dot_general(           # (NT, HDP)
                m_dst_f, dqe,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ).astype(dq_ref.dtype)
            dkw_ref[0] = jax.lax.dot_general(            # (SW, HDP)
                oh_src, dkj,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ).astype(dkw_ref.dtype)
            dvw_ref[0] = jax.lax.dot_general(
                oh_src, dvj,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ).astype(dvw_ref.dtype)
            dwe_ref[0] = jax.lax.dot_general(            # (A, HDP)
                attr, de,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            ).astype(dwe_ref.dtype)

        @pl.when(t >= live_ref[0, 0])
        def _dead():
            dq_ref[...] = jnp.zeros(dq_ref.shape, dq_ref.dtype)
            dkw_ref[...] = jnp.zeros(dkw_ref.shape, dkw_ref.dtype)
            dvw_ref[...] = jnp.zeros(dvw_ref.shape, dvw_ref.dtype)
            dwe_ref[...] = jnp.zeros(dwe_ref.shape, dwe_ref.dtype)

    return kernel


def _pad_feat(x, rows, hdp):
    r, f = x.shape
    out = jnp.zeros((rows, hdp), x.dtype)
    return out.at[:r, :f].set(x)


def _common_specs(dims: AttnDims, t, a, hdp, zr, kh_rows):
    nt, eb = dims.nt, dims.eb
    return [
        pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((t, eb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, eb), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, kh_rows, eb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a, eb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((a, hdp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nt, hdp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((zr, hdp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((zr, hdp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


def _norm_keep(keep, t):
    # (T, EB) → (T, 1, EB); (T, KH, EB) passes through
    if keep.ndim == 2:
        keep = keep[:, None, :]
    assert keep.shape[0] == t, keep.shape
    return keep.astype(jnp.float32)


def _attn_impl(q, k, v, we, keep, meta: AttnMeta, dims: AttnDims):
    t = meta.src_rel.shape[0]
    a = meta.attr_t.shape[1]
    hd = dims.heads * dims.d
    hdp = _round_up(hd, 16)
    np_ = t * dims.nt
    zr = max(_z_rows(np_, dims.sw), dims.sw)
    keep = _norm_keep(keep, t)
    kh_rows = keep.shape[1]

    q_p = _pad_feat(q[: dims.n_max], np_, hdp)
    k_p = _pad_feat(k[: dims.n_max], zr, hdp)
    v_p = _pad_feat(v[: dims.n_max], zr, hdp)
    we_p = jnp.zeros((a, hdp), jnp.float32).at[:, :hd].set(
        we.astype(jnp.float32)
    )

    out = pl.pallas_call(
        _fwd_kernel(dims, a, hdp, kh_rows),
        grid=(t,),
        in_specs=_common_specs(dims, t, a, hdp, zr, kh_rows),
        out_specs=pl.BlockSpec((dims.nt, hdp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((np_, hdp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        meta.s0, meta.live, meta.src_rel, meta.dst_rel,
        keep, meta.attr_t, we_p, q_p, k_p, v_p,
    )
    return out[: dims.n_max, :hd]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def attn_apply(q, k, v, we, keep, meta: AttnMeta, dims: AttnDims):
    """Fused TransformerConv aggregation over dst-sorted tile windows.

    ``q/k/v``: (n_max, heads·d) projected node features; ``we``:
    (edge_dim, heads·d) edge-projection weight; ``keep``: (T, EB) dropout
    keep-scale windows (ones when deterministic). Differentiable in q, k,
    v and we; keep and the mesh windows are constants.
    """
    return _attn_impl(q, k, v, we, keep, meta, dims)


def _attn_fwd(q, k, v, we, keep, meta, dims):
    return _attn_impl(q, k, v, we, keep, meta, dims), (q, k, v, we, keep, meta)


def _attn_bwd(dims: AttnDims, res, g):
    q, k, v, we, keep, meta = res
    t = meta.src_rel.shape[0]
    a = meta.attr_t.shape[1]
    hd = dims.heads * dims.d
    hdp = _round_up(hd, 16)
    np_ = t * dims.nt
    zr = max(_z_rows(np_, dims.sw), dims.sw)

    keep = _norm_keep(keep, t)
    kh_rows = keep.shape[1]
    q_p = _pad_feat(q[: dims.n_max], np_, hdp)
    k_p = _pad_feat(k[: dims.n_max], zr, hdp)
    v_p = _pad_feat(v[: dims.n_max], zr, hdp)
    we_p = jnp.zeros((a, hdp), jnp.float32).at[:, :hd].set(
        we.astype(jnp.float32)
    )
    g_p = _pad_feat(g.astype(q.dtype), np_, hdp)

    dq, dkw, dvw, dwe_t = pl.pallas_call(
        _bwd_kernel(dims, a, hdp, kh_rows),
        grid=(t,),
        in_specs=_common_specs(dims, t, a, hdp, zr, kh_rows)
        + [pl.BlockSpec((dims.nt, hdp), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((dims.nt, hdp), lambda i: (i, 0)),
            pl.BlockSpec((1, dims.sw, hdp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, dims.sw, hdp), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, a, hdp), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, hdp), q.dtype),
            jax.ShapeDtypeStruct((t, dims.sw, hdp), q.dtype),
            jax.ShapeDtypeStruct((t, dims.sw, hdp), q.dtype),
            jax.ShapeDtypeStruct((t, a, hdp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        meta.s0, meta.live, meta.src_rel, meta.dst_rel,
        keep, meta.attr_t, we_p, q_p, k_p, v_p, g_p,
    )

    # combine overlapping per-tile source windows: rows s0[t] + [0, SW)
    rows = (meta.s0 + jnp.arange(dims.sw, dtype=jnp.int32)[None, :]).reshape(
        -1
    )
    dk = jax.ops.segment_sum(
        dkw.reshape(t * dims.sw, hdp), rows, num_segments=zr
    )
    dv = jax.ops.segment_sum(
        dvw.reshape(t * dims.sw, hdp), rows, num_segments=zr
    )
    n, hd_in = q.shape
    dq_out = jnp.zeros_like(q).at[: dims.n_max].set(
        dq[: dims.n_max, :hd_in].astype(q.dtype)
    )
    dk_out = jnp.zeros_like(k).at[: dims.n_max].set(
        dk[: dims.n_max, :hd_in].astype(k.dtype)
    )
    dv_out = jnp.zeros_like(v).at[: dims.n_max].set(
        dv[: dims.n_max, :hd_in].astype(v.dtype)
    )
    dwe = jnp.sum(dwe_t, axis=0)[:, :hd_in].astype(we.dtype)
    return dq_out, dk_out, dv_out, dwe, None, None


attn_apply.defvjp(_attn_fwd, _attn_bwd)


def attn_reference(q, k, v, we, edge_src, edge_dst, edge_valid, edge_attr,
                   n_max, heads, d):
    """XLA oracle for tests: gather → edge-softmax → scatter (mirrors the
    TransformerConv edge-list path in models/conv.py)."""
    from quadtree_mpnnlstm_tpu.ops.segment import edge_softmax

    e = (edge_attr @ we).reshape(-1, heads, d)
    kj = jnp.take(k.reshape(-1, heads, d),
                  jnp.minimum(edge_src, n_max - 1), axis=0) + e
    vj = jnp.take(v.reshape(-1, heads, d),
                  jnp.minimum(edge_src, n_max - 1), axis=0) + e
    qi = jnp.take(q.reshape(-1, heads, d),
                  jnp.minimum(edge_dst, n_max - 1), axis=0)
    logits = jnp.sum(qi * kj, axis=-1) / jnp.sqrt(jnp.asarray(d, q.dtype))
    alpha = edge_softmax(logits, edge_dst, edge_valid, n_max)
    msg = alpha[..., None] * vj
    out = jax.ops.segment_sum(
        jnp.where(edge_valid[:, None, None], msg, 0.0),
        edge_dst, num_segments=n_max + 1,
    )[:n_max]
    return out.reshape(n_max, heads * d)

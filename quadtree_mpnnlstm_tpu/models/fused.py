"""Fused multi-gate graph convolutions.

A GConvLSTM evaluates ``conv_x_g(X) + conv_h_g(H)`` for four gates — eight
independent conv stacks per cell per timestep (ref model/model.py:394-424).
The aggregation step of GCN/Cheb is *weight-free and feature-wise linear*,
so parallel streams over the same mesh can share it by feature
concatenation:

  * Chebyshev: ``T_k(·)`` depends only on the stack input — layer 1 computes
    the K polynomial tensors ONCE on ``[X ‖ H]`` (width F_x+F_h) for all
    gates and both sides, then applies per-gate weights as einsums. The
    reference pattern costs 2·sides·gates aggregations of width d; this
    costs K-1 aggregations of width F_x+F_h.
  * GCN: per stream ``Â(z W)`` — weights first, then ONE aggregation over
    all 2·G streams concatenated.

Deeper layers keep 2·G width-d streams but still aggregate once per
Chebyshev tap instead of once per gate per side. This is the concrete form
of SURVEY.md §7.5 "all 8 gate-convolutions batch into fused matmuls"; on
the v5e profile the decoder cells' aggregation traffic drops ~6×.

Equivalence with the per-gate ``GraphConv`` stacks is proven in
tests/test_fused.py by transplanting weights.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from quadtree_mpnnlstm_tpu.graph.state import GraphTensors
from quadtree_mpnnlstm_tpu.models.conv import a_mul as a_mul_graph
from quadtree_mpnnlstm_tpu.models.conv import (
    CONVOLUTION_KWARGS,
    attr_dim,
    multi_stream_attention,
)

FUSABLE = ("GCNConv", "ChebConv")
ATTN_FUSABLE = ("TransformerConv", "MHTransformerConv")


def _glorot_batched(n_batch_axes: int):
    return nn.initializers.variance_scaling(
        1.0, "fan_avg", "uniform", in_axis=-2, out_axis=-1,
        batch_axis=tuple(range(n_batch_axes)),
    )


def _lead_bias(b: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape a (streams, width) bias for a stream-LEADING activation of
    rank ``ndim`` — (s, 1, w) per-sample, (s, 1, 1, w) batch-middle.
    (Stream-TRAILING activations broadcast ``b[None]`` natively.)"""
    return b.reshape((b.shape[0],) + (1,) * (ndim - 2) + (b.shape[-1],))


class FusedGateConvStack(nn.Module):
    """``conv_x_g(X) + conv_h_g(H)`` for ``n_gates`` gates with shared
    aggregations. Returns (n_gates, N, out_channels)."""

    convolution_type: str
    out_channels: int
    n_layers: int = 1
    n_gates: int = 4
    K: int = 3            # ChebConv filter size (ref model.py:53)
    lambda_max: float = 2.0
    dtype: Any = None     # compute dtype; f32 master params cast at use

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        h: jnp.ndarray,
        graph: GraphTensors,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert self.convolution_type in FUSABLE, self.convolution_type
        if self.dtype is not None:
            x = x.astype(self.dtype)
            h = h.astype(self.dtype)
        g, d = self.n_gates, self.out_channels

        def p(w):  # param view in the compute dtype
            return w if self.dtype is None else w.astype(self.dtype)

        def a_mul(z):  # (N, W) → Â z (backend-dispatched, conv.a_mul)
            return a_mul_graph(z, graph)

        scale = 2.0 / self.lambda_max

        def l_hat(z):
            return scale * (z - a_mul(z)) - z

        def cheb_t(z):
            """K Chebyshev tensors of z, stacked (K, N, W)."""
            ts = [z]
            if self.K > 1:
                ts.append(l_hat(z))
            for _ in range(2, self.K):
                ts.append(2.0 * l_hat(ts[-1]) - ts[-2])
            return jnp.stack(ts)

        # lead = everything between the stream axis and the feature axis:
        # (N,) per-sample, (N, B) in the batch-middle shared-mesh layout
        # (ellipsis einsums + a_mul's batch fold keep both ranks on the
        # same code path; tests/test_shared_mesh.py proves equality)
        lead = x.shape[:-1]
        if self.convolution_type == "ChebConv":
            fx, fh = x.shape[-1], h.shape[-1]
            # ---- layer 0: shared polynomials over [X ‖ H]
            t = cheb_t(jnp.concatenate([x, h], axis=-1))  # (K, *lead, fx+fh)
            wx = self.param("w_x_0", _glorot_batched(2), (g, self.K, fx, d))
            wh = self.param("w_h_0", _glorot_batched(2), (g, self.K, fh, d))
            bx = self.param("b_x_0", nn.initializers.zeros, (g, d))
            bh = self.param("b_h_0", nn.initializers.zeros, (g, d))
            nd = 2 + len(lead)  # stream-leading activation rank
            sx = jnp.einsum("k...f,gkfo->g...o", t[..., :fx], p(wx)) \
                + _lead_bias(p(bx), nd)
            sh = jnp.einsum("k...f,gkfo->g...o", t[..., fx:], p(wh)) \
                + _lead_bias(p(bh), nd)
            streams = jnp.concatenate([sx, sh], axis=0)  # (2g, *lead, d)
            # ---- deeper layers: one aggregation per tap over all streams
            for layer in range(1, self.n_layers):
                s = streams.shape[0]
                z = jnp.moveaxis(streams, 0, -2).reshape(lead + (s * d,))
                t = cheb_t(z).reshape((self.K,) + lead + (s, d))
                w = self.param(
                    f"w_{layer}", _glorot_batched(2), (s, self.K, d, d)
                )
                b = self.param(f"b_{layer}", nn.initializers.zeros, (s, d))
                streams = (
                    jnp.einsum("k...sd,skdo->s...o", t, p(w))
                    + _lead_bias(p(b), nd)
                )
        else:  # GCNConv: weights first, one aggregation over all streams
            fx, fh = x.shape[-1], h.shape[-1]
            wx = self.param("w_x_0", _glorot_batched(1), (g, fx, d))
            wh = self.param("w_h_0", _glorot_batched(1), (g, fh, d))
            bx = self.param("b_x_0", nn.initializers.zeros, (g, d))
            bh = self.param("b_h_0", nn.initializers.zeros, (g, d))
            u = jnp.concatenate(
                [
                    jnp.einsum("...f,gfo->...go", x, p(wx)),
                    jnp.einsum("...f,gfo->...go", h, p(wh)),
                ],
                axis=-2,
            )  # (*lead, 2g, d)
            agg = a_mul(u.reshape(lead + (2 * g * d,))).reshape(
                lead + (2 * g, d)
            )
            nd = agg.ndim
            streams = jnp.moveaxis(agg, -2, 0) + _lead_bias(
                jnp.concatenate([p(bx), p(bh)], 0), nd
            )
            for layer in range(1, self.n_layers):
                s = streams.shape[0]
                w = self.param(f"w_{layer}", _glorot_batched(1), (s, d, d))
                b = self.param(f"b_{layer}", nn.initializers.zeros, (s, d))
                u = jnp.einsum("s...d,sdo->...so", streams, p(w)).reshape(
                    lead + (s * d,)
                )
                streams = jnp.moveaxis(
                    a_mul(u).reshape(lead + (s, d)), -2, 0
                ) + _lead_bias(p(b), nd)

        return streams[:g] + streams[g:]  # (g, *lead, d)


class FusedAttnGateStack(nn.Module):
    """``conv_x_g(X) + conv_h_g(H)`` for ``n_gates`` gates where the conv
    is an attention type (Transformer/MHTransformer): the 2·G per-gate
    attention streams run as extra HEADS of ONE
    :func:`~quadtree_mpnnlstm_tpu.models.conv.multi_stream_attention` call
    per conv layer, instead of 2·G separate kernel launches.

    Attention coefficients are data-dependent per stream, so unlike the
    GCN/Cheb stack nothing is *shared* — but head-packing fills the MXU
    lanes (8 streams × d=16 = 128 at the bench config) and collapses the
    per-call dispatch/DMA overhead that dominated the vmapped per-gate
    layout. Per-stream semantics match ``GraphConv(TransformerConv...)``
    stacks exactly: q/k/v biases, edge projection, root-weight skip, and
    (for MHTransformerConv) per-stream head-mixing — proven by weight
    transplant in tests/test_fused.py.
    """

    convolution_type: str
    out_channels: int
    n_layers: int = 1
    n_gates: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        h: jnp.ndarray,
        graph: GraphTensors,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert self.convolution_type in ATTN_FUSABLE, self.convolution_type
        if self.dtype is not None:
            x = x.astype(self.dtype)
            h = h.astype(self.dtype)
        kwargs = CONVOLUTION_KWARGS[self.convolution_type]
        heads = kwargs.get("heads", 1)
        drop = kwargs.get("dropout", 0.0)
        mh = self.convolution_type == "MHTransformerConv"  # concat + mix
        d = self.out_channels
        g = self.n_gates
        s = 2 * g
        hd = heads * d
        skip_dim = hd if mh else d
        n = x.shape[0]
        a = attr_dim(graph)
        # batch-middle (n, B, F): samples run as extra heads of the same
        # single attention call (B·s·heads total), mesh shared
        batched = x.ndim == 3
        nb = x.shape[1] if batched else 1
        lead = x.shape[:-1]  # (n,) or (n, B)

        def p(w):
            return w if self.dtype is None else w.astype(self.dtype)

        def rng():
            if deterministic or drop == 0.0:
                return None
            return self.make_rng("dropout")

        def attn(q_all, k_all, v_all, we_all):
            we = jnp.moveaxis(we_all, 0, 1).reshape(a, s * hd)
            if batched:
                we = jnp.tile(we, (1, nb))
            out, _ = multi_stream_attention(
                q_all.reshape(n, nb * s * hd), k_all.reshape(n, nb * s * hd),
                v_all.reshape(n, nb * s * hd),
                we,
                graph, nb * s * heads, d,
                dropout=drop, deterministic=deterministic, rng=rng(),
            )
            # (n, [B·]s·heads, d) → per-stream heads: concat (MH) or mean
            out = out.reshape(lead + (s, heads, d))
            if mh:
                return out.reshape(lead + (s, hd))
            return jnp.mean(out, axis=-2)

        fx, fh = x.shape[-1], h.shape[-1]
        gb = _glorot_batched(1)
        zeros = nn.initializers.zeros

        # ---- layer 0: per-gate projections of X and of H
        def proj0(name, src, f, width):
            w = self.param(f"w_{name}_0", gb, (g, f, width))
            b = self.param(f"b_{name}_0", zeros, (g, width))
            return jnp.einsum("...f,gfo->...go", src, p(w)) + p(b)[None]

        q_all = jnp.concatenate(
            [proj0("q_x", x, fx, hd), proj0("q_h", h, fh, hd)], axis=-2
        )
        k_all = jnp.concatenate(
            [proj0("k_x", x, fx, hd), proj0("k_h", h, fh, hd)], axis=-2
        )
        v_all = jnp.concatenate(
            [proj0("v_x", x, fx, hd), proj0("v_h", h, fh, hd)], axis=-2
        )
        we_all = jnp.concatenate(
            [
                self.param("w_e_x_0", gb, (g, a, hd)),
                self.param("w_e_h_0", gb, (g, a, hd)),
            ],
            axis=0,
        ).astype(q_all.dtype)
        agg = attn(q_all, k_all, v_all, we_all)  # (n, s, skip_dim)

        # root-weight skip on the layer input (per stream)
        skip = jnp.concatenate(
            [
                jnp.einsum(
                    "...f,gfo->...go", x,
                    p(self.param("w_s_x_0", gb, (g, fx, skip_dim))),
                ) + p(self.param("b_s_x_0", zeros, (g, skip_dim)))[None],
                jnp.einsum(
                    "...f,gfo->...go", h,
                    p(self.param("w_s_h_0", gb, (g, fh, skip_dim))),
                ) + p(self.param("b_s_h_0", zeros, (g, skip_dim)))[None],
            ],
            axis=-2,
        )
        streams = agg + skip  # (n, s, skip_dim)
        if mh:  # per-stream head-mixing linear (ref model.py:26-37)
            wm = self.param("w_mix_0", gb, (s, hd, d))
            bm = self.param("b_mix_0", zeros, (s, d))
            streams = jnp.einsum("...sf,sfo->...so", streams, p(wm)) + p(bm)[None]

        # ---- deeper layers: each stream keeps its own d-wide input
        for layer in range(1, self.n_layers):
            def projL(name, width, layer=layer):
                w = self.param(f"w_{name}_{layer}", gb, (s, d, width))
                b = self.param(f"b_{name}_{layer}", zeros, (s, width))
                return jnp.einsum("...sf,sfo->...so", streams, p(w)) + p(b)[None]

            agg = attn(projL("q", hd), projL("k", hd), projL("v", hd),
                       self.param(f"w_e_{layer}", gb, (s, a, hd)).astype(
                           streams.dtype))
            skip = projL("s", skip_dim)
            nxt = agg + skip
            if mh:
                wm = self.param(f"w_mix_{layer}", gb, (s, hd, d))
                bm = self.param(f"b_mix_{layer}", zeros, (s, d))
                nxt = jnp.einsum("...sf,sfo->...so", nxt, p(wm)) + p(bm)[None]
            streams = nxt

        streams = jnp.moveaxis(streams, -2, 0)  # (s, *lead, d)
        return streams[:g] + streams[g:]        # (g, *lead, d)

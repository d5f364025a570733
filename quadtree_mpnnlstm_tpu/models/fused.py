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

FUSABLE = ("GCNConv", "ChebConv")


def _glorot_batched(n_batch_axes: int):
    return nn.initializers.variance_scaling(
        1.0, "fan_avg", "uniform", in_axis=-2, out_axis=-1,
        batch_axis=tuple(range(n_batch_axes)),
    )


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

        if self.convolution_type == "ChebConv":
            fx, fh = x.shape[-1], h.shape[-1]
            # ---- layer 0: shared polynomials over [X ‖ H]
            t = cheb_t(jnp.concatenate([x, h], axis=-1))  # (K, N, fx+fh)
            wx = self.param("w_x_0", _glorot_batched(2), (g, self.K, fx, d))
            wh = self.param("w_h_0", _glorot_batched(2), (g, self.K, fh, d))
            bx = self.param("b_x_0", nn.initializers.zeros, (g, d))
            bh = self.param("b_h_0", nn.initializers.zeros, (g, d))
            sx = jnp.einsum("knf,gkfo->gno", t[:, :, :fx], p(wx)) + p(bx)[:, None]
            sh = jnp.einsum("knf,gkfo->gno", t[:, :, fx:], p(wh)) + p(bh)[:, None]
            streams = jnp.concatenate([sx, sh], axis=0)  # (2g, N, d)
            # ---- deeper layers: one aggregation per tap over all streams
            for layer in range(1, self.n_layers):
                s, n = streams.shape[0], streams.shape[1]
                z = streams.transpose(1, 0, 2).reshape(n, s * d)
                t = cheb_t(z).reshape(self.K, n, s, d)
                w = self.param(
                    f"w_{layer}", _glorot_batched(2), (s, self.K, d, d)
                )
                b = self.param(f"b_{layer}", nn.initializers.zeros, (s, d))
                streams = (
                    jnp.einsum("knsd,skdo->sno", t, p(w)) + p(b)[:, None]
                )
        else:  # GCNConv: weights first, one aggregation over all streams
            fx, fh = x.shape[-1], h.shape[-1]
            wx = self.param("w_x_0", _glorot_batched(1), (g, fx, d))
            wh = self.param("w_h_0", _glorot_batched(1), (g, fh, d))
            bx = self.param("b_x_0", nn.initializers.zeros, (g, d))
            bh = self.param("b_h_0", nn.initializers.zeros, (g, d))
            n = x.shape[0]
            u = jnp.concatenate(
                [
                    jnp.einsum("nf,gfo->ngo", x, p(wx)),
                    jnp.einsum("nf,gfo->ngo", h, p(wh)),
                ],
                axis=1,
            )  # (N, 2g, d)
            agg = a_mul(u.reshape(n, 2 * g * d)).reshape(n, 2 * g, d)
            streams = agg.transpose(1, 0, 2) + jnp.concatenate(
                [p(bx), p(bh)], 0
            )[:, None]
            for layer in range(1, self.n_layers):
                s = streams.shape[0]
                w = self.param(f"w_{layer}", _glorot_batched(1), (s, d, d))
                b = self.param(f"b_{layer}", nn.initializers.zeros, (s, d))
                u = jnp.einsum("snd,sdo->nso", streams, p(w)).reshape(n, s * d)
                streams = (
                    a_mul(u).reshape(n, s, d).transpose(1, 0, 2)
                    + p(b)[:, None]
                )

        return streams[:g] + streams[g:]  # (g, N, d)

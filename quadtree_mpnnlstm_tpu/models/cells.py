"""Graph-convolutional recurrent cells.

Parity targets (ref model/model.py):
  * ``GConvLSTM``      — peephole graph-conv LSTM (ref :263-463). Gate g ∈
    {i, f, c, o}: ``conv_x_g(X) + conv_h_g(H) (+ w_c_g ⊙ C) + b_g``;
    peepholes and biases zero-init (ref :375-382). Returns (O, H, C) — the
    *output gate activation* is the cell's "output", consumed by the
    decoder head (ref seq2seq.py:159-161).
  * ``GConvGRU``       — Chebyshev GCRN GRU (ref :100-259).
  * ``GConvLSTMSimple``— one conv_x/conv_h pair shared by all gates, which
    therefore differ only by bias (ref :465-609); computed once here
    instead of four times.
  * ``SplitGConvLSTM`` — graph conv followed by a standard LSTM run across
    the *node* axis with a single (1, hidden) state (ref :686-724; torch
    treats the (N, F) input as an unbatched length-N sequence).
  * ``DummyLSTM``      — identity (ref :17-24).

TPU design: with GCN/Cheb convolutions the per-gate stacks run through
:class:`~quadtree_mpnnlstm_tpu.models.fused.FusedGateConvStack` (shared
aggregations, 1.8× end-to-end — SURVEY.md §7.5); other conv types use one
vmapped conv with a leading gate axis (params stacked on axis 0).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from quadtree_mpnnlstm_tpu.graph.state import GraphTensors
from quadtree_mpnnlstm_tpu.models.conv import GraphConv
from quadtree_mpnnlstm_tpu.models.fused import (
    ATTN_FUSABLE,
    FUSABLE,
    FusedAttnGateStack,
    FusedGateConvStack,
)


def gate_conv_module(
    n_gates: int, convolution_type: str, out_channels: int, n_layers: int,
    name: str, dtype=None,
):
    return nn.vmap(
        GraphConv,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(None, None, None),
        out_axes=0,
        axis_size=n_gates,
        methods=["__call__"],
    )(
        convolution_type=convolution_type,
        out_channels=out_channels,
        n_layers=n_layers,
        dtype=dtype,
        name=name,
    )


class GConvLSTM(nn.Module):
    """Peephole graph-conv LSTM (ref model/model.py:263-463).

    With GCN/Cheb convolutions the eight per-gate conv stacks run through
    :class:`FusedGateConvStack` (shared aggregations); ``fused=False``
    restores the per-gate vmapped layout (used by layout-sensitive tests).
    """

    out_channels: int
    n_conv_layers: int = 1
    convolution_type: str = "GCNConv"
    fused: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        graph: GraphTensors,
        h: jnp.ndarray,
        c: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        d = self.out_channels
        if self.fused and self.convolution_type in FUSABLE:
            g = FusedGateConvStack(
                self.convolution_type, d, self.n_conv_layers, 4,
                dtype=self.dtype, name="gates",
            )(x, h, graph, deterministic)  # (4, N, d) — gates i, f, c, o
        elif self.fused and self.convolution_type in ATTN_FUSABLE:
            g = FusedAttnGateStack(
                self.convolution_type, d, self.n_conv_layers, 4,
                dtype=self.dtype, name="gates",
            )(x, h, graph, deterministic)  # (4, N, d)
        else:
            conv_x = gate_conv_module(
                4, self.convolution_type, d, self.n_conv_layers, "conv_x",
                dtype=self.dtype,
            )
            conv_h = gate_conv_module(
                4, self.convolution_type, d, self.n_conv_layers, "conv_h",
                dtype=self.dtype,
            )
            g = conv_x(x, graph, deterministic) + conv_h(
                h, graph, deterministic
            )

        zeros = nn.initializers.zeros
        dt = g.dtype  # peepholes/biases join the gates' compute dtype
        w_ci = self.param("w_c_i", zeros, (1, d)).astype(dt)
        w_cf = self.param("w_c_f", zeros, (1, d)).astype(dt)
        w_co = self.param("w_c_o", zeros, (1, d)).astype(dt)
        b_i = self.param("b_i", zeros, (1, d)).astype(dt)
        b_f = self.param("b_f", zeros, (1, d)).astype(dt)
        b_c = self.param("b_c", zeros, (1, d)).astype(dt)
        b_o = self.param("b_o", zeros, (1, d)).astype(dt)
        c = c.astype(dt)

        i = nn.sigmoid(g[0] + w_ci * c + b_i)
        f = nn.sigmoid(g[1] + w_cf * c + b_f)
        t = jnp.tanh(g[2] + b_c)
        c_new = f * c + i * t
        o = nn.sigmoid(g[3] + w_co * c_new + b_o)
        h_new = o * jnp.tanh(c_new)
        return o, h_new, c_new


class GConvGRU(nn.Module):
    """Graph-conv GRU (ref model/model.py:100-259). Returns (H, H, C) with C
    passed through so state pytrees stay uniform across cell types."""

    out_channels: int
    n_conv_layers: int = 1
    convolution_type: str = "GCNConv"
    fused: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph, h, c, deterministic: bool = True):
        d = self.out_channels
        if self.fused and self.convolution_type in (FUSABLE + ATTN_FUSABLE):
            stack_cls = (
                FusedGateConvStack
                if self.convolution_type in FUSABLE
                else FusedAttnGateStack
            )
            zr = stack_cls(
                self.convolution_type, d, self.n_conv_layers, 2,
                dtype=self.dtype, name="gates_zr",
            )(x, h, graph, deterministic)
            z = nn.sigmoid(zr[0])
            r = nn.sigmoid(zr[1])
            cand = stack_cls(
                self.convolution_type, d, self.n_conv_layers, 1,
                dtype=self.dtype, name="gate_candidate",
            )(x, h * r.astype(h.dtype), graph, deterministic)[0]
            h_tilde = jnp.tanh(cand)
        else:
            gx = gate_conv_module(
                3, self.convolution_type, d, self.n_conv_layers, "conv_x",
                dtype=self.dtype,
            )(x, graph, deterministic)  # gates z, r, candidate
            gh = gate_conv_module(
                2, self.convolution_type, d, self.n_conv_layers, "conv_h",
                dtype=self.dtype,
            )(h, graph, deterministic)  # gates z, r
            z = nn.sigmoid(gx[0] + gh[0])
            r = nn.sigmoid(gx[1] + gh[1])
            h_cand = GraphConv(
                convolution_type=self.convolution_type,
                out_channels=d,
                n_layers=self.n_conv_layers,
                dtype=self.dtype,
                name="conv_h_candidate",
            )(h * r.astype(h.dtype), graph, deterministic=deterministic)
            h_tilde = jnp.tanh(gx[2] + h_cand)
        z = z.astype(h_tilde.dtype)
        h_new = z * h.astype(h_tilde.dtype) + (1.0 - z) * h_tilde
        return h_new, h_new, c


class GConvLSTMSimple(nn.Module):
    """Shared-conv LSTM variant (ref model/model.py:465-609): all four gates
    reuse one conv_x(X)+conv_h(H) value and differ only by bias, so the
    convolution is evaluated once."""

    out_channels: int
    n_conv_layers: int = 1
    convolution_type: str = "GCNConv"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph, h, c, deterministic: bool = True):
        d = self.out_channels
        gx = GraphConv(
            convolution_type=self.convolution_type,
            out_channels=d,
            n_layers=self.n_conv_layers,
            dtype=self.dtype,
            name="conv_x",
        )(x, graph, deterministic=deterministic)
        gh = GraphConv(
            convolution_type=self.convolution_type,
            out_channels=d,
            n_layers=self.n_conv_layers,
            dtype=self.dtype,
            name="conv_h",
        )(h, graph, deterministic=deterministic)
        g = gx + gh

        zeros = nn.initializers.zeros
        dt = g.dtype
        c = c.astype(dt)
        i = nn.sigmoid(g + self.param("b_i", zeros, (1, d)).astype(dt))
        f = nn.sigmoid(g + self.param("b_f", zeros, (1, d)).astype(dt))
        t = jnp.tanh(g + self.param("b_c", zeros, (1, d)).astype(dt))
        c_new = f * c + i * t
        o = nn.sigmoid(g + self.param("b_o", zeros, (1, d)).astype(dt))
        h_new = o * jnp.tanh(c_new)
        return o, h_new, c_new


class SplitGConvLSTM(nn.Module):
    """Graph conv feeding a standard LSTM scanned along the node axis
    (ref model/model.py:686-724; decoupled conv/recurrence ablation). The
    LSTM state is a single (hidden,) vector, stored broadcast across the
    (N, hidden) state slot so the cell is shape-compatible with the others."""

    out_channels: int
    n_conv_layers: int = 1
    convolution_type: str = "GCNConv"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph, h, c, deterministic: bool = True):
        d = self.out_channels
        xc = GraphConv(
            convolution_type=self.convolution_type,
            out_channels=d,
            n_layers=self.n_conv_layers,
            dtype=self.dtype,
            name="conv",
        )(x, graph, deterministic=deterministic)

        lstm = nn.scan(
            nn.OptimizedLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(features=d, dtype=self.dtype, name="lstm")
        # flax LSTM carry is (c, h); scan over the node axis, unbatched.
        (c_fin, h_fin), outputs = lstm((c[0], h[0]), xc)
        # state slot shape follows the input (works for both the (N, d)
        # per-sample and (N, B, d) batch-middle layouts)
        h_new = jnp.broadcast_to(h_fin, xc.shape[:-1] + (d,))
        c_new = jnp.broadcast_to(c_fin, xc.shape[:-1] + (d,))
        return outputs, h_new, c_new


class DummyLSTM(nn.Module):
    """Identity cell for ablations (ref model/model.py:17-24)."""

    out_channels: int = 0
    n_conv_layers: int = 0
    convolution_type: str = "Dummy"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph, h, c, deterministic: bool = True):
        return x, h, c


RNN_CELLS = {
    "LSTM": GConvLSTM,
    "GRU": GConvGRU,
    "SimpleLSTM": GConvLSTMSimple,
    "SplitLSTM": SplitGConvLSTM,
    "Dummy": DummyLSTM,
}

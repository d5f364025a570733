"""Non-seq2seq graph baselines.

Parity targets (ref model/model.py):
  * ``MPNNLSTM``  (:613-684) — per-frame 3×(GCN→LayerNorm→dropout) feature
    extractor, 4-layer LSTM over time, skip-concat of the input value
    channel, 2-layer MLP head, sigmoid.
  * ``MPNNLSTMI`` (:727-802) — stacked GConvLSTMs unrolled over the input
    frames, BatchNorm+MLP+sigmoid head. Documented deviation: the reference
    passes ``C=hs[1]`` into layer 0 — a latent bug acknowledged in
    SURVEY.md §2.3 — we thread ``cs[0]`` as intended.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from quadtree_mpnnlstm_tpu.graph.state import GraphTensors
from quadtree_mpnnlstm_tpu.models.cells import GConvLSTM
from quadtree_mpnnlstm_tpu.models.conv import GCNConv


class MPNNLSTM(nn.Module):
    """ref model/model.py:613-684."""

    hidden_size: int
    dropout: float = 0.1
    input_timesteps: int = 3
    output_features: int = 1
    lstm_layers: int = 4
    dtype: Any = None  # compute dtype (bf16 mixed precision when set)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (T, n_max, F)
        graph: GraphTensors,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        t_in, n, _ = x.shape
        convs = [GCNConv(self.hidden_size, name=f"convolution{i+1}",
                         dtype=self.dtype)
                 for i in range(3)]
        norms = [nn.LayerNorm(epsilon=1e-5, name=f"bn{i+1}",
                              dtype=self.dtype) for i in range(3)]
        drop = nn.Dropout(self.dropout)

        feats = []
        for t in range(t_in):
            h = x[t]
            for conv, norm in zip(convs, norms):
                h = nn.relu(conv(h, graph, deterministic))
                h = norm(h)
                h = drop(h, deterministic=deterministic)
            feats.append(h)
        seq = jnp.stack(feats)  # (T, N, hid)

        outs = seq
        h_last = None
        for layer in range(self.lstm_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype,
                                        name=f"lstm{layer}")
            scan = nn.scan(
                lambda mdl, cr, xt: mdl(cr, xt),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            zeros = jnp.zeros(
                (n, self.hidden_size),
                x.dtype if self.dtype is None else self.dtype,
            )
            (c_f, h_f), outs = scan(cell, (zeros, zeros), outs)
            h_last = h_f
        h = nn.relu(h_last)  # last layer's final hidden state (ref :668)

        skip = x[:, :, 0].T  # (N, T) input value channel (ref :670)
        h = jnp.concatenate([h, skip], axis=-1)
        h = nn.relu(nn.Dense(self.hidden_size, name="lin1",
                             dtype=self.dtype)(h))
        h = nn.Dense(self.output_features, name="lin2", dtype=self.dtype)(h)
        h = drop(h, deterministic=deterministic)
        return nn.sigmoid(h).astype(jnp.float32)


class MPNNLSTMI(nn.Module):
    """Iterative stacked-GConvLSTM baseline (ref model/model.py:727-802)."""

    hidden_size: int
    dropout: float = 0.1
    n_layers: int = 2
    convolution_type: str = "GCNConv"
    output_features: int = 1
    dtype: Any = None  # compute dtype (bf16 mixed precision when set)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (T, n_max, F)
        graph: GraphTensors,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        t_in, n, _ = x.shape
        cells = [
            GConvLSTM(
                out_channels=self.hidden_size,
                convolution_type=self.convolution_type,
                dtype=self.dtype,
                name=f"recurrent{i}",
            )
            for i in range(self.n_layers)
        ]
        state_dt = x.dtype if self.dtype is None else self.dtype
        hs = [jnp.zeros((n, self.hidden_size), state_dt)] * self.n_layers
        cs = [jnp.zeros((n, self.hidden_size), state_dt)] * self.n_layers
        for t in range(t_in):
            _, hs[0], cs[0] = cells[0](
                x[t], graph, hs[0], cs[0], deterministic
            )
            for i in range(1, self.n_layers):
                _, hs[i], cs[i] = cells[i](
                    hs[i - 1], graph, hs[i], cs[i], deterministic
                )

        h = nn.relu(hs[-1])
        # The reference uses BatchNorm1d without running stats (ref :735),
        # i.e. per-batch normalisation over the node axis.
        h = nn.BatchNorm(use_running_average=False, use_bias=True,
                         use_scale=True, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(nn.Dense(self.hidden_size, name="lin1",
                             dtype=self.dtype)(h))
        h = nn.Dense(self.output_features, name="lin2", dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.sigmoid(h).astype(jnp.float32)

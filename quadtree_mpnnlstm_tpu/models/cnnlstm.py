"""Dense CNN-LSTM baseline family.

Parity target: ref model/cnnlstm.py — ``CNNEncoder``/``CNNDecoder`` conv
stacks (:17-62), single-step ``CNNLSTM`` (:65-132) and the seq2seq
``CNNLSTMSeq2Seq`` (:135-250) used by ice_exp_cnnlstm.py. This is the
"everything static" anchor model (SURVEY.md §3.5): pure dense convs + LSTM,
no graph machinery.

Documented deviation: the committed reference reshapes feed an
(hidden·H·W)-feature sequence into an LSTM declared with ``hidden_size``
inputs and reshape its (hidden,)-sized output back to (hidden, H, W)
(ref cnnlstm.py:152, :191-194, :226-228) — shape-inconsistent as written.
We implement the architecture its comments describe (ref :109-110 "process
each spatial position with the same LSTM"): the LSTM runs per spatial
position with ``hidden`` features, positions batched — shape-consistent,
parameter-frugal, and MXU-friendly (one big batched matmul per gate).

Time loops are ``nn.scan`` with per-step remat; the decoder performs
scheduled sampling exactly like the reference (p=teacher_forcing_ratio,
uses y[t-1] for t>0, ref :204-210).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class CNNEncoder(nn.Module):
    """3×(conv → BN → relu → dropout) (ref cnnlstm.py:17-39)."""

    hidden_size: int
    kernel_size: int = 3
    dropout: float = 0.1
    dtype: Any = None  # compute dtype (bf16 mixed precision when set)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        k = (self.kernel_size, self.kernel_size)
        for i in range(3):
            x = nn.Conv(self.hidden_size, k, padding="SAME",
                        dtype=self.dtype, name=f"conv{i+1}")(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                name=f"bn{i+1}"
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class CNNDecoder(nn.Module):
    """2×(conv → BN → relu → dropout) + output conv (ref cnnlstm.py:42-62)."""

    hidden_size: int
    output_channels: int = 1
    kernel_size: int = 3
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        k = (self.kernel_size, self.kernel_size)
        for i in range(2):
            x = nn.Conv(self.hidden_size, k, padding="SAME",
                        dtype=self.dtype, name=f"conv{i+1}")(x)
            x = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype,
                name=f"bn{i+1}"
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Conv(self.output_channels, k, padding="SAME",
                       dtype=self.dtype, name="conv3")(x)


class _PositionLSTM(nn.Module):
    """LSTM over time, vectorised across spatial positions (batch = B·H·W)."""

    hidden_size: int
    n_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, seq, carry=None):
        """seq: (T, N, F). Returns (outputs (T, N, hidden), (h, c) stacked
        (n_layers, N, hidden))."""
        n = seq.shape[1]
        outs = seq
        hs, cs = [], []
        state_dt = seq.dtype if self.dtype is None else self.dtype
        for layer in range(self.n_layers):
            cell = nn.OptimizedLSTMCell(self.hidden_size, dtype=self.dtype,
                                        name=f"lstm{layer}")
            if carry is None:
                c0 = jnp.zeros((n, self.hidden_size), state_dt)
                h0 = jnp.zeros((n, self.hidden_size), state_dt)
            else:
                h0, c0 = carry[0][layer], carry[1][layer]
            scan = nn.scan(
                lambda mdl, cr, xt: mdl(cr, xt),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            (c_f, h_f), outs = scan(cell, (c0, h0), outs)
            hs.append(h_f)
            cs.append(c_f)
        return outs, (jnp.stack(hs), jnp.stack(cs))


class CNNLSTM(nn.Module):
    """Single-step CNN→LSTM→CNN model (ref cnnlstm.py:65-132)."""

    input_features: int
    hidden_size: int
    output_features: int = 1
    n_layers: int = 2
    dropout: float = 0.1
    kernel_size: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (T_in, B, rows, cols, C) → ((B, rows, cols, out), (h, c))."""
        t_in, b, rows, cols, _ = x.shape
        enc = CNNEncoder(self.hidden_size, self.kernel_size, self.dropout,
                         dtype=self.dtype, name="encoder")
        feats = jnp.stack(
            [enc(x[t], deterministic) for t in range(t_in)]
        )  # (T, B, r, c, hid)
        seq = feats.reshape(t_in, b * rows * cols, self.hidden_size)
        outs, _ = _PositionLSTM(self.hidden_size, self.n_layers,
                                dtype=self.dtype, name="lstm")(seq)
        last = outs[-1].reshape(b, rows, cols, self.hidden_size)
        dec = CNNDecoder(self.hidden_size, self.output_features,
                         self.kernel_size, self.dropout, dtype=self.dtype,
                         name="decoder")
        return nn.sigmoid(dec(last, deterministic)).astype(jnp.float32)


class CNNLSTMSeq2Seq(nn.Module):
    """Dense seq2seq baseline (ref cnnlstm.py:135-250)."""

    input_features: int
    hidden_size: int
    output_features: int = 1
    input_timesteps: int = 10
    output_timesteps: int = 90
    n_layers: int = 2
    dropout: float = 0.1
    kernel_size: int = 3
    binary: bool = False
    deterministic: bool = True
    teacher_forcing_ratio: float = 0.5  # ref :355 trains with 0.5
    dtype: Any = None  # compute dtype (bf16 mixed precision when set)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        concat_layers: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: (B, T_in, rows, cols, C) → (B, T_out, rows, cols, out)."""
        det = self.deterministic
        b, t_in, rows, cols, _ = x.shape
        n_pos = b * rows * cols
        enc = CNNEncoder(self.hidden_size, self.kernel_size, self.dropout,
                         dtype=self.dtype, name="encoder")
        enc_lstm = _PositionLSTM(self.hidden_size, self.n_layers,
                                 dtype=self.dtype, name="encoder_lstm")
        dec_lstm = _PositionLSTM(self.hidden_size, self.n_layers,
                                 dtype=self.dtype, name="decoder_lstm")
        dec = CNNDecoder(self.hidden_size, self.output_features,
                         self.kernel_size, self.dropout, dtype=self.dtype,
                         name="decoder")

        # ---- encoder
        feats = jnp.stack(
            [enc(x[:, t], det) for t in range(t_in)]
        )  # (T_in, B, r, c, hid)
        seq = feats.reshape(t_in, n_pos, self.hidden_size)
        _, (h, c) = enc_lstm(seq)

        # ---- decoder (autoregressive; scheduled sampling per ref :204-210)
        use_tf = (not det) and (y is not None) and self.teacher_forcing_ratio > 0
        frame = x[:, -1, :, :, 0:1]  # last input value channel (ref :201)
        outputs = []
        for t in range(self.output_timesteps):
            if use_tf and t > 0:
                key = self.make_rng("sampling")
                tf = jax.random.bernoulli(key, self.teacher_forcing_ratio)
                frame = jnp.where(tf, y[:, t - 1, :, :, 0:1], frame)
            df = enc(frame, det).reshape(1, n_pos, self.hidden_size)
            if concat_layers is not None:
                clim = concat_layers[:, t].reshape(1, n_pos, 1)
                df = jnp.concatenate([df, clim], axis=-1)
            outs, (h, c) = dec_lstm(df, carry=(h, c))
            spatial = outs[0].reshape(b, rows, cols, self.hidden_size)
            out = nn.sigmoid(dec(spatial, det))
            outputs.append(out)
            frame = out
        y_hat = jnp.stack(outputs, axis=1)  # (B, T_out, r, c, out)
        if mask is not None:
            y_hat = jnp.where(mask.astype(bool)[None, None, :, :, None], 0.0, y_hat)
        return y_hat.astype(jnp.float32)

"""Positional-encoding channels.

Parity target: ref model/utils.py:30-52 — appends two channels
(col_index / n_cols, row_index / n_rows) to an (n_samples, rows, cols, c)
array. The reference computes these with host numpy per call; here they are
traced jnp ops that fuse into the surrounding program.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_channels(rows: int, cols: int, dtype=jnp.float32) -> jnp.ndarray:
    """(rows, cols, 2) with channel 0 = col/cols ('ii'), channel 1 = row/rows ('jj')."""
    ii = jnp.broadcast_to(jnp.arange(cols, dtype=dtype)[None, :], (rows, cols)) / cols
    jj = jnp.broadcast_to(jnp.arange(rows, dtype=dtype)[:, None], (rows, cols)) / rows
    return jnp.stack([ii, jj], axis=-1)


def add_positional_encoding(x: jnp.ndarray) -> jnp.ndarray:
    """Append (x_pos, y_pos) channels to (..., rows, cols, c) — any number
    of leading axes (samples, batch) broadcasts the same grid."""
    assert x.ndim >= 3, f"expected (..., rows, cols, c); got {x.shape}"
    rows, cols = x.shape[-3], x.shape[-2]
    pos = positional_channels(rows, cols, dtype=x.dtype)
    pos = jnp.broadcast_to(pos, x.shape[:-1] + (2,))
    return jnp.concatenate([x, pos], axis=-1)

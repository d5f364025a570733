"""Masked losses (ref model/mpnnlstm.py:171, :246: MSE or BCE over ~mask)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _weights(y: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-pixel weights broadcastable to y (..., rows, cols, 1)."""
    if mask is None:
        return jnp.ones(y.shape[-3:-1] + (1,), y.dtype)
    return (~mask.astype(bool)).astype(y.dtype)[..., None]


def masked_mse(
    y_hat: jnp.ndarray, y: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    w = _weights(y, mask)
    num = jnp.sum(((y_hat - y) ** 2) * w)
    den = jnp.sum(jnp.broadcast_to(w, y.shape))
    return num / den


def masked_bce(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-7,
) -> jnp.ndarray:
    w = _weights(y, mask)
    p = jnp.clip(y_hat, eps, 1.0 - eps)
    ll = y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p)
    return -jnp.sum(ll * w) / jnp.sum(jnp.broadcast_to(w, y.shape))


LOSSES = {"MSE": masked_mse, "BCE": masked_bce}

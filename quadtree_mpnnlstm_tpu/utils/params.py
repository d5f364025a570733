"""Parameter counting (parity: ref model/utils.py:19-27)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_n_params(params) -> int:
    """Total number of scalars in a parameter pytree."""
    return int(
        sum(jnp.size(p) for p in jax.tree_util.tree_leaves(params))
    )

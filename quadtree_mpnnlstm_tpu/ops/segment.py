"""Masked segment primitives for padded edge lists.

These are the TPU-native stand-ins for the reference's compiled
torch-scatter / torch-sparse kernels (ref requirements.txt:12-16): message
aggregation is a masked ``segment_sum`` over a fixed-capacity edge list, and
attention normalisation is a masked, numerically-guarded edge softmax.

Invariant maintained everywhere: **no NaN/Inf is ever materialised, even in
invalid (padded) lanes** — a NaN in a masked lane would still poison
gradients through ``where``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


def safe_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """num/den with 0 where den == 0."""
    den_ok = den != 0
    return jnp.where(den_ok, num / jnp.where(den_ok, den, 1.0), 0.0)


def segment_sum_nodes(
    values: jnp.ndarray,
    ids: jnp.ndarray,
    n_max: int,
) -> jnp.ndarray:
    """Sum ``values`` (L, ...) into ``n_max`` node rows by ``ids`` (L,).

    ids may contain the sentinel ``n_max`` (dropped via an extra bucket).
    """
    out = jax.ops.segment_sum(values, ids, num_segments=n_max + 1)
    return out[:n_max]


def scatter_to_dst(
    messages: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_valid: jnp.ndarray,
    n_max: int,
    indices_sorted: bool = True,
    mask_messages: bool = False,
) -> jnp.ndarray:
    """Aggregate per-edge messages (E, ...) at destination nodes (sum).

    Graph builders emit edge lists sorted by dst with invalid lanes carrying
    the sentinel id ``n_max`` (dropped bucket), so by default no masking is
    needed and the segment sum can assert sorted indices — a large win on
    TPU where unsorted scatter is the dominant cost. Callers whose messages
    are not already zero on invalid lanes must pass ``mask_messages=True``;
    callers that append edges out of order (e.g. GAT self-loops) must pass
    ``indices_sorted=False``.
    """
    if mask_messages:
        messages = jnp.where(
            edge_valid.reshape((-1,) + (1,) * (messages.ndim - 1)),
            messages, 0.0,
        )
    out = jax.ops.segment_sum(
        messages, edge_dst, num_segments=n_max + 1,
        indices_are_sorted=indices_sorted,
    )
    return out[:n_max]


def edge_softmax(
    logits: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_valid: jnp.ndarray,
    n_max: int,
) -> jnp.ndarray:
    """Masked softmax of per-edge logits (E, H) over each destination's
    incoming edges — the attention normaliser of Transformer/GAT convs
    (stand-in for PyG's ``softmax(alpha, index)``).

    Invalid lanes get exactly 0; empty destinations produce no NaNs.
    """
    v = edge_valid[:, None] if logits.ndim == 2 else edge_valid
    logits = jnp.where(v, logits, _NEG_BIG)
    seg_max = jax.ops.segment_max(logits, edge_dst, num_segments=n_max + 1)
    # Empty segments give -inf; clamp so gathered differences stay finite.
    seg_max = jnp.maximum(seg_max, _NEG_BIG)
    seg_max = jax.lax.stop_gradient(seg_max)
    ex = jnp.exp(logits - seg_max[edge_dst])
    ex = jnp.where(v, ex, 0.0)
    denom = jax.ops.segment_sum(ex, edge_dst, num_segments=n_max + 1)
    return safe_div(ex, denom[edge_dst])

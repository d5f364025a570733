"""Data-parallel training over a device mesh.

New capability relative to the reference, which trains strictly on one
device with batch_size 1 (ref ice_exp.py:137-139, mpnnlstm.py:221;
SURVEY.md §2.7). Samples shard across the mesh's ``data`` axis under
``shard_map``; each device runs the (vmapped) per-sample forward/backward on
its shard and gradients are reduced with ``lax.pmean`` — an all-reduce that
XLA lowers onto ICI. Parameters and the optimiser state stay replicated
(the model is ~10⁵ params; TP/PP would be pure overhead, SURVEY.md §2.7).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def make_dp_train_step(
    model,
    optimizer,
    loss_func: Callable,
    mesh: Mesh,
    use_climatology: bool = False,
    axis: str = "data",
):
    """Build a jitted DP train step.

    The returned step takes ``(params, opt_state, x, y, clim, mask, hir,
    keys)`` where x/y/clim lead with a global batch axis divisible by the
    mesh size and ``keys`` is (batch, 2, 2) per-sample rng keys.
    """

    def sample_loss(params, x, y, clim, key, mask, hir):
        rngs = {"dropout": key[0], "sampling": key[1]}
        y_hat = model.apply(
            params, x, y, clim if use_climatology else None,
            mask=mask, high_interest_region=hir, rngs=rngs,
        )
        return loss_func(y_hat, y, mask)

    def device_fn(params, x, y, clim, keys, mask, hir):
        def local_loss(params):
            losses = jax.vmap(
                lambda xb, yb, cb, kb: sample_loss(
                    params, xb, yb, cb, kb, mask, hir
                )
            )(x, y, clim, keys)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(local_loss)(params)
        grads = jax.lax.pmean(grads, axis)  # gradient all-reduce over ICI
        loss = jax.lax.pmean(loss, axis)
        return loss, grads

    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def train_step(params, opt_state, x, y, clim, mask, hir, keys):
        loss, grads = sharded(params, x, y, clim, keys, mask, hir)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch with its leading axis sharded across the mesh."""
    spec = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda a: jax.device_put(a, spec), batch
    )

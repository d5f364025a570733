"""Data-parallel training on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq
from quadtree_mpnnlstm_tpu.parallel import make_mesh, make_dp_train_step
from quadtree_mpnnlstm_tpu.parallel.dp import shard_batch
from quadtree_mpnnlstm_tpu.train.losses import masked_mse


def test_dp_train_step_runs_and_matches_single_device():
    n_dev = jax.device_count()
    assert n_dev >= 2, "conftest should provide 8 virtual CPU devices"
    mesh = make_mesh(n_dev)

    shape = (8, 8)
    gcfg = GraphConfig(image_shape=shape, max_grid_size=4, thresh=0.3)
    cfg = ModelConfig(hidden_size=4, input_features=1, input_timesteps=2,
                      output_timesteps=2, n_layers=1, n_conv_layers=1,
                      convolution_type="GCNConv", dropout=0.0)
    model = Seq2Seq(cfg, gcfg)  # deterministic

    rng = np.random.default_rng(0)
    b = n_dev * 2
    x = jnp.asarray(rng.random((b, 2, *shape, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((b, 2, *shape, 1)).astype(np.float32))
    clim = jnp.zeros((b, 2, *shape, 1))
    mask = jnp.zeros(shape, bool)
    keys = jax.random.split(jax.random.PRNGKey(0), b * 2).reshape(b, 2, 2)

    params = model.init(jax.random.PRNGKey(1), x[0], mask=mask,
                        high_interest_region=mask)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    step = make_dp_train_step(model, optimizer, masked_mse, mesh)
    xb, yb, cb, kb = shard_batch(mesh, (x, y, clim, keys))
    new_params, new_opt, loss = step(params, opt_state, xb, yb, cb, mask,
                                     mask, kb)
    assert np.isfinite(float(loss))

    # single-device reference: same global-batch mean loss/grads
    def batch_loss(p):
        losses = jax.vmap(
            lambda xs, ys: masked_mse(
                model.apply(p, xs, ys, None, mask=mask,
                            high_interest_region=mask),
                ys, mask)
        )(x, y)
        return jnp.mean(losses)

    ref_loss, ref_grads = jax.value_and_grad(batch_loss)(params)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    ref_updates, _ = optimizer.update(ref_grads, opt_state, params)
    ref_params = optax.apply_updates(params, ref_updates)
    for a, b_ in zip(jax.tree.leaves(new_params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)

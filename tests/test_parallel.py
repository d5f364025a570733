"""Data-parallel training on the 8-virtual-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq
from quadtree_mpnnlstm_tpu.parallel import make_mesh, make_dp_train_step
from quadtree_mpnnlstm_tpu.parallel.dp import shard_batch
from quadtree_mpnnlstm_tpu.train.losses import masked_mse


@pytest.mark.slow
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


@pytest.mark.slow
def test_dp_through_predictor_api_matches_single_device():
    """VERDICT r1 item 4: DP must be reachable from the L4 trainer. Train
    two predictors — dp_devices=4 vs 1 — with identical seeds/data for two
    steps and require identical losses and parameters."""
    from quadtree_mpnnlstm_tpu.data.loader import ArrayDataset, DataLoader
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    assert jax.device_count() >= 4
    shape = (8, 8)
    rng = np.random.default_rng(3)
    n = 8
    x = rng.random((n, 2, *shape, 1)).astype(np.float32)
    y = rng.random((n, 2, *shape, 1)).astype(np.float32)
    launch = np.zeros((n,), np.int64)
    kw = dict(
        image_shape=shape, thresh=0.3, decompose=True, input_features=1,
        input_timesteps=2, output_timesteps=2,
        model_kwargs=dict(hidden_size=4, dropout=0.0, n_layers=1,
                          n_conv_layers=1, convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=4),
        seed=7,
    )

    def run(dp):
        pred = NextFramePredictorS2S(experiment_name=f"dp{dp}",
                                     dp_devices=dp, **kw)
        loader = DataLoader(ArrayDataset(x, y, launch), batch_size=n)
        pred.train(loader, loader, n_epochs=2, lr=0.01, lr_decay=0.95)
        return pred

    p_dp = run(4)
    p_sd = run(1)
    np.testing.assert_allclose(p_dp.train_loss, p_sd.train_loss,
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_dp.params),
                    jax.tree.leaves(p_sd.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dp_predictor_rejects_indivisible_batch():
    from quadtree_mpnnlstm_tpu.data.loader import ArrayDataset, DataLoader
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    import pytest

    shape = (8, 8)
    x = np.zeros((3, 2, *shape, 1), np.float32)
    y = np.zeros((3, 2, *shape, 1), np.float32)
    pred = NextFramePredictorS2S(
        image_shape=shape, thresh=0.3, input_timesteps=2, output_timesteps=2,
        model_kwargs=dict(hidden_size=4, dropout=0.0, n_layers=1,
                          n_conv_layers=1, convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=4), dp_devices=2,
    )
    loader = DataLoader(ArrayDataset(x, y, np.zeros((3,), np.int64)),
                        batch_size=3)
    with pytest.raises(ValueError, match="not divisible"):
        pred.train(loader, loader, n_epochs=1, lr=0.01, lr_decay=0.95)

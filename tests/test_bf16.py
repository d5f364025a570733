"""Mixed-precision (bfloat16) compute mode: the whole graph→LSTM→remesh
pipeline runs in bf16 (f32 master params, f32 LayerNorm stats/loss), per
ModelConfig.compute_dtype / TrainConfig.dtype (SURVEY.md §2.7 "bf16 on TPU").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig, TrainConfig
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq
from quadtree_mpnnlstm_tpu.train.predictor import NextFramePredictorS2S

SHAPE = (16, 16)


def _model(compute_dtype):
    gcfg = GraphConfig(image_shape=SHAPE, max_grid_size=4, thresh=0.1)
    cfg = ModelConfig(
        hidden_size=8, input_features=1, input_timesteps=2,
        output_timesteps=3, n_layers=1, n_conv_layers=1,
        convolution_type="ChebConv", dropout=0.0,
        compute_dtype=compute_dtype,
    )
    return Seq2Seq(cfg, gcfg), cfg, gcfg


def test_bf16_region_and_f32_outputs():
    """With compute_dtype=bfloat16 the recurrent state is bf16 end-to-end
    while predictions leave the model in f32."""
    model, cfg, gcfg = _model("bfloat16")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, *SHAPE, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    # master params stay f32; the layers cast them at use
    assert jax.tree_util.tree_leaves(params)[0].dtype == jnp.float32

    state = model.apply(params, x, method="encode")
    assert state.x.dtype == jnp.bfloat16
    assert all(h.dtype == jnp.bfloat16 for h in state.hidden)

    y_hat = model.apply(params, x)
    assert y_hat.dtype == jnp.float32
    assert np.isfinite(np.asarray(y_hat)).all()


def test_bf16_close_to_f32():
    """Same weights, bf16 vs f32 compute: predictions agree to bf16
    precision (~1%)."""
    model32, cfg, gcfg = _model("float32")
    model16, _, _ = _model("bfloat16")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, *SHAPE, 1)).astype(np.float32))
    params = model32.init(jax.random.PRNGKey(0), x)

    y32 = np.asarray(model32.apply(params, x))
    y16 = np.asarray(model16.apply(params, x))
    # outputs are tanh-residuals on ~[0,1] values; bf16 keeps ~2-3 decimal
    # digits and rounding compounds over the autoregressive remesh rollout
    assert np.max(np.abs(y32 - y16)) < 0.15
    assert np.mean(np.abs(y32 - y16)) < 0.03


@pytest.mark.slow
def test_bf16_training_via_train_config():
    """TrainConfig.dtype drives the predictor's mixed-precision step: master
    params stay f32, one step runs, loss is finite and near the f32 loss."""
    def make(dtype):
        return NextFramePredictorS2S(
            image_shape=SHAPE, thresh=0.1, experiment_name=f"bf16_{dtype}",
            decompose=True, input_features=1, input_timesteps=2,
            output_timesteps=3,
            model_kwargs=dict(hidden_size=8, dropout=0.0, n_layers=1,
                              n_conv_layers=1, convolution_type="ChebConv"),
            graph_kwargs=dict(max_grid_size=4),
            train_config=TrainConfig(dtype=dtype, seed=7),
        )

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 2, *SHAPE, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 3, *SHAPE, 1)).astype(np.float32))
    clim = jnp.zeros((2, 3, *SHAPE, 1))
    mask = jnp.zeros(SHAPE, bool)

    losses = {}
    for dtype in ("float32", "bfloat16"):
        pred = make(dtype)
        assert pred.cfg.compute_dtype == dtype
        pred.initiate_training(lr=0.01, lr_decay=0.95)
        step = pred._get_train_step(False, 0)
        params, _, loss, _ = step(
            pred.params, pred.opt_state, x, y, clim, mask, mask, None,
            jax.random.PRNGKey(0),
        )
        losses[dtype] = float(loss)
        # master params remain f32 after the update
        leaf = jax.tree_util.tree_leaves(params)[0]
        assert leaf.dtype == jnp.float32
    assert np.isfinite(losses["bfloat16"])
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.02


@pytest.mark.slow
def test_bf16_training_converges_like_f32():
    """CI-sized twin of baselines/bf16_quality.py: a short training run in
    both dtypes on identical data must reach comparable loss (the full
    convergence table lives in BASELINE.md round-3)."""
    import numpy as np

    from quadtree_mpnnlstm_tpu.data import ArrayDataset, DataLoader
    from quadtree_mpnnlstm_tpu.data.moving_mnist import ModMovingMNISTDataset
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    ds = ModMovingMNISTDataset(
        16, input_timesteps=2, output_timesteps=3, canvas_size=(16, 16),
        digit_size=(10, 10), pixel_noise=0.0, velocity_noise=0.0, seed=0,
    )
    dates = np.zeros(16, np.int64)
    train = ArrayDataset(ds.x[:12], ds.y[:12], dates[:12])
    val = ArrayDataset(ds.x[12:], ds.y[12:], dates[12:])
    mask = np.zeros((16, 16), bool)

    losses = {}
    for dtype in ("float32", "bfloat16"):
        model = NextFramePredictorS2S(
            image_shape=(16, 16), thresh=0.1, experiment_name=f"ci_{dtype}",
            decompose=True, input_features=1, input_timesteps=2,
            output_timesteps=3,
            model_kwargs=dict(hidden_size=8, dropout=0.0, n_layers=1,
                              n_conv_layers=1, convolution_type="ChebConv",
                              compute_dtype=dtype),
            graph_kwargs=dict(max_grid_size=8, n_max=256, e_max=2048),
        )
        model.train(DataLoader(train, 4, shuffle=True, seed=1),
                    DataLoader(val, 4), lr=0.01, lr_decay=0.95,
                    n_epochs=3, mask=mask)
        losses[dtype] = model.test_loss[-1]
    assert np.isfinite(list(losses.values())).all()
    # bf16 must not converge materially WORSE than f32 (it is often a bit
    # better on short runs — that direction is fine; measured on CPU:
    # f32 0.349 vs bf16 0.243 after 3 epochs, seed noise ~±30%)
    assert losses["bfloat16"] < 1.5 * losses["float32"] + 1e-3, losses

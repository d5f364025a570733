"""CNN-LSTM and MPNNLSTM(I) baseline model tests (SURVEY.md §2.3, §3.5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset, DataLoader
from quadtree_mpnnlstm_tpu.graph import pixelwise_graph
from quadtree_mpnnlstm_tpu.models.cnnlstm import CNNLSTM, CNNLSTMSeq2Seq
from quadtree_mpnnlstm_tpu.models.mpnnlstm import MPNNLSTM, MPNNLSTMI
from quadtree_mpnnlstm_tpu.train.cnn_predictor import NextFramePredictorCNNLSTM
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def test_cnnlstm_seq2seq_shapes_and_mask():
    model = CNNLSTMSeq2Seq(
        input_features=1, hidden_size=4, input_timesteps=2,
        output_timesteps=3, n_layers=2, deterministic=True,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 2, 8, 8, 1)).astype(np.float32))
    mask = jnp.zeros((8, 8), bool).at[0, 0].set(True)
    variables = model.init(jax.random.PRNGKey(0), x, mask=mask)
    y_hat = model.apply(variables, x, mask=mask)
    assert y_hat.shape == (2, 3, 8, 8, 1)
    assert np.all(np.asarray(y_hat)[:, :, 0, 0, 0] == 0)  # mask-fill (ref :246)
    assert np.asarray(y_hat).min() >= 0 and np.asarray(y_hat).max() <= 1


def test_cnnlstm_single_step():
    model = CNNLSTM(input_features=1, hidden_size=4, n_layers=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 1, 8, 8, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 8, 8, 1)


@pytest.mark.slow
def test_cnn_predictor_trains():
    ds = ModMovingMNISTDataset(
        6, input_timesteps=2, output_timesteps=2,
        canvas_size=(8, 8), digit_size=(4, 4), velocity_noise=0.0, seed=0,
    )
    loader = DataLoader(ds, batch_size=3)
    model = NextFramePredictorCNNLSTM(
        image_shape=(8, 8), input_features=1, hidden_size=4,
        input_timesteps=2, output_timesteps=2, n_layers=1,
        experiment_name="cnn_test",
    )
    assert model.get_n_params() > 0
    model.train(loader, loader, n_epochs=3, lr=0.01)
    assert np.isfinite(model.train_loss).all()
    assert model.train_loss[-1] <= model.train_loss[0] * 1.5
    preds = model.predict(loader)
    assert preds.shape == (6, 2, 8, 8, 1)


def _graph_and_data(shape=(8, 8), t=3):
    rng = np.random.default_rng(2)
    img = rng.random((t, *shape, 1)).astype(np.float32)
    cfg = GraphConfig(image_shape=shape, max_grid_size=4, thresh=float("-inf"))
    x = add_positional_encoding(jnp.asarray(img))
    return pixelwise_graph(x, cfg)


def test_mpnnlstm_forward():
    graph, data = _graph_and_data()
    model = MPNNLSTM(hidden_size=4, input_timesteps=3)
    variables = model.init(jax.random.PRNGKey(0), data, graph)
    out = model.apply(variables, data, graph)
    assert out.shape == (graph.n_max, 1)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1


def test_mpnnlstmi_forward():
    graph, data = _graph_and_data()
    model = MPNNLSTMI(hidden_size=4, n_layers=2)
    variables = model.init(jax.random.PRNGKey(0), data, graph)
    out, _ = model.apply(variables, data, graph, mutable=["batch_stats"])
    assert out.shape == (graph.n_max, 1)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_baseline_models_bf16():
    """compute dtype threads through the non-seq2seq families: outputs stay
    f32, values agree with f32 compute to bf16 precision."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadtree_mpnnlstm_tpu.config import GraphConfig
    from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
    from quadtree_mpnnlstm_tpu.models.cnnlstm import CNNLSTMSeq2Seq
    from quadtree_mpnnlstm_tpu.models.mpnnlstm import MPNNLSTM
    from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

    rng = np.random.default_rng(0)

    # MPNNLSTM over a small graph
    cfg = GraphConfig(image_shape=(8, 8), max_grid_size=4, thresh=0.5)
    img = add_positional_encoding(
        jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32))
    )
    graph, data = image_to_graph(img, cfg)
    m32 = MPNNLSTM(hidden_size=8, dropout=0.0, lstm_layers=1)
    m16 = MPNNLSTM(hidden_size=8, dropout=0.0, lstm_layers=1,
                   dtype=jnp.bfloat16)
    params = m32.init(jax.random.PRNGKey(0), data, graph)
    y32 = np.asarray(m32.apply(params, data, graph))
    y16 = np.asarray(m16.apply(params, data, graph))
    assert y16.dtype == np.float32
    assert np.max(np.abs(y32 - y16)) < 0.05

    # CNN-LSTM seq2seq
    x = jnp.asarray(rng.random((2, 2, 8, 8, 1)).astype(np.float32))
    c32 = CNNLSTMSeq2Seq(input_features=1, hidden_size=8, output_timesteps=2,
                         input_timesteps=2, n_layers=1, dropout=0.0)
    c16 = CNNLSTMSeq2Seq(input_features=1, hidden_size=8, output_timesteps=2,
                         input_timesteps=2, n_layers=1, dropout=0.0,
                         dtype=jnp.bfloat16)
    variables = c32.init(jax.random.PRNGKey(1), x)
    z32 = np.asarray(c32.apply(variables, x, mutable=["batch_stats"])[0])
    z16 = np.asarray(c16.apply(variables, x, mutable=["batch_stats"])[0])
    assert z16.dtype == np.float32
    assert np.max(np.abs(z32 - z16)) < 0.05

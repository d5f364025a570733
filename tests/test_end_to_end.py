"""End-to-end slice (SURVEY.md §7 M3): Moving-MNIST → quadtree Seq2Seq →
train loop; loss must decrease, predictions must have sane shapes/ranges."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset, DataLoader
from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S


def make_data(n, shape=(16, 16), t_in=3, t_out=3, seed=0):
    return ModMovingMNISTDataset(
        n, input_timesteps=t_in, output_timesteps=t_out,
        canvas_size=shape, digit_size=(8, 8),
        pixel_noise=0.02, velocity_noise=0.0, seed=seed,
    )


def test_moving_mnist_dataset_shapes():
    ds = make_data(4)
    assert ds.x.shape == (4, 3, 16, 16, 1)
    assert ds.y.shape == (4, 3, 16, 16, 1)
    assert ds.image_shape == (16, 16)
    # sprites present: digit pixels well above noise floor
    assert ds.x.max() > 0.5


@pytest.mark.slow
@pytest.mark.parametrize("conv_type", ["ChebConv", "TransformerConv"])
def test_train_loss_decreases(conv_type):
    ds_train = make_data(8, seed=1)
    ds_test = make_data(4, seed=2)
    loader_train = DataLoader(ds_train, batch_size=4, shuffle=True, seed=0)
    loader_test = DataLoader(ds_test, batch_size=4)

    model = NextFramePredictorS2S(
        image_shape=(16, 16),
        thresh=0.1,
        experiment_name="e2e_test",
        decompose=True,
        input_features=1,
        input_timesteps=3,
        output_timesteps=3,
        model_kwargs=dict(
            hidden_size=8, dropout=0.1, n_layers=1, n_conv_layers=1,
            convolution_type=conv_type,
        ),
        graph_kwargs=dict(max_grid_size=8),
    )
    assert model.get_n_params() > 0
    model.train(loader_train, loader_test, n_epochs=6, lr=0.02, lr_decay=0.95)
    assert model.train_loss[-1] < model.train_loss[0]
    assert np.isfinite(model.test_loss).all()

    preds = model.predict(DataLoader(ds_test, batch_size=2))
    assert preds.shape == (4, 3, 16, 16, 1)
    assert np.isfinite(preds).all()

    scores = model.score(DataLoader(ds_test, batch_size=2))
    assert np.isfinite(scores["RMSE"])


@pytest.mark.slow
def test_pixelwise_mode_and_mask():
    """decompose=False ⇒ thresh=-inf pixelwise path (ref mpnnlstm.py:47)."""
    shape = (12, 12)
    ds = make_data(4, shape=shape)
    mask = np.zeros(shape, bool)
    mask[:3, :3] = True
    loader = DataLoader(ds, batch_size=2)
    model = NextFramePredictorS2S(
        image_shape=shape,
        thresh=0.1,
        decompose=False,
        input_timesteps=3,
        output_timesteps=3,
        model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=4),
    )
    model.train(loader, loader, n_epochs=1, lr=0.01, mask=mask)
    preds = model.predict(loader, mask=mask)
    assert np.isfinite(preds).all()
    # masked pixels are filled with 0 (dense-unflatten parity)
    assert np.all(preds[:, :, mask] == 0)


@pytest.mark.slow
def test_truncated_backprop_matches_ref_chunking():
    ds = make_data(4)
    loader = DataLoader(ds, batch_size=2)
    model = NextFramePredictorS2S(
        image_shape=(16, 16),
        thresh=0.1,
        input_timesteps=3,
        output_timesteps=3,
        model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=8),
    )
    model.train(loader, loader, n_epochs=1, lr=0.01, truncated_backprop=2)
    assert np.isfinite(model.train_loss).all()


def test_save_load_roundtrip(tmp_path):
    ds = make_data(2)
    loader = DataLoader(ds, batch_size=2)
    model = NextFramePredictorS2S(
        image_shape=(16, 16), thresh=0.1,
        input_timesteps=3, output_timesteps=3,
        experiment_name="roundtrip",
        model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=8),
    )
    p1 = model.predict(loader)
    model.save(str(tmp_path))

    model2 = NextFramePredictorS2S(
        image_shape=(16, 16), thresh=0.1,
        input_timesteps=3, output_timesteps=3,
        experiment_name="roundtrip",
        model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=8),
        seed=99,  # different init
    )
    model2.load(str(tmp_path))
    p2 = model2.predict(loader)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)


def test_test_threshold_runs():
    ds = make_data(2)
    model = NextFramePredictorS2S(
        image_shape=(16, 16), thresh=0.1,
        input_timesteps=3, output_timesteps=3,
        model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=8),
    )
    out = model.test_threshold(ds.x[0], thresh=0.1)
    assert out is not None


@pytest.mark.slow
def test_binary_mode_bce():
    """binary=True ⇒ sigmoid head + BCE loss (ref mpnnlstm.py:171,
    seq2seq.py:177-178)."""
    ds = make_data(4)
    binary_y = ds.y > 0.5
    ds.y = binary_y.astype(np.float32)
    loader = DataLoader(ds, batch_size=2)
    model = NextFramePredictorS2S(
        image_shape=(16, 16), thresh=0.1, binary=True,
        input_timesteps=3, output_timesteps=3,
        model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv"),
        graph_kwargs=dict(max_grid_size=8),
    )
    model.train(loader, loader, n_epochs=2, lr=0.01)
    assert model.loss_func_name == "BCE"
    preds = model.predict(loader)
    assert preds.min() >= 0.0 and preds.max() <= 1.0  # sigmoid head

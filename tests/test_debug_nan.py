"""NaN localization in debug mode (SURVEY §5 sanitizers).

The reference's only NaN tooling is input asserts (ref
graph_functions.py:626-627) and an epoch-end "NaN loss :(" abort (ref
mpnnlstm.py:363-364); ``torch.autograd.set_detect_anomaly`` is left
commented out (ref ice_profile.py:26). Here ``debug=True`` functionalizes
checkify checks inside the scan bodies so a non-finite value raises
immediately, naming the module and rollout step that produced it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_predictor(debug):
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    return NextFramePredictorS2S(
        image_shape=(16, 16),
        thresh=0.1,
        decompose=True,
        debug=debug,
        input_features=1,
        input_timesteps=2,
        output_timesteps=3,
        model_kwargs=dict(
            hidden_size=8, n_layers=1, n_conv_layers=1,
            convolution_type="GCNConv",
        ),
        graph_kwargs=dict(max_grid_size=4, n_max=256, e_max=1024,
                          node_budget=256),
    )


def _poison(params, needle):
    """Set every float leaf under a module whose path contains ``needle``
    to NaN; returns the poisoned tree and the number of leaves touched."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    hit = 0
    out = []
    for path, leaf in flat:
        pstr = jax.tree_util.keystr(path)
        if needle in pstr and jnp.issubdtype(leaf.dtype, jnp.floating):
            leaf = jnp.full_like(leaf, jnp.nan)
            hit += 1
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out), hit


def _one_step(model, poison_needle=None):
    model.initiate_training(lr=0.01, lr_decay=0.95)
    step = model._get_train_step(False, 0)
    params = model.params
    if poison_needle is not None:
        params, hit = _poison(params, poison_needle)
        assert hit > 0, f"no param leaf matched {poison_needle!r}"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 2, 16, 16, 1), np.float32))
    y = jnp.asarray(rng.random((2, 3, 16, 16, 1), np.float32))
    clim = jnp.zeros((2, 3, 16, 16, 1))
    mask = jnp.zeros((16, 16), bool)
    return step(params, model.opt_state, x, y, clim, mask, mask, None,
                jax.random.PRNGKey(0))


@pytest.mark.slow
def test_nan_decoder_weight_names_decoder_step():
    model = _tiny_predictor(debug=True)
    with pytest.raises(Exception) as exc_info:
        _one_step(model, poison_needle="decoder")
    msg = str(exc_info.value)
    assert "module=decoder" in msg
    assert "t=0" in msg  # first rollout step


@pytest.mark.slow
def test_nan_encoder_weight_names_encoder():
    model = _tiny_predictor(debug=True)
    with pytest.raises(Exception) as exc_info:
        _one_step(model, poison_needle="encoder")
    assert "module=encoder" in str(exc_info.value)


@pytest.mark.slow
def test_debug_clean_step_passes_and_matches():
    """A clean debug step runs, and the checks don't change the numbers."""
    loss_dbg = float(_one_step(_tiny_predictor(debug=True))[2])
    loss_plain = float(_one_step(_tiny_predictor(debug=False))[2])
    assert np.isfinite(loss_dbg)
    np.testing.assert_allclose(loss_dbg, loss_plain, rtol=1e-6)

"""Regression tests pinning the documented reference quirks/deviations
(models/seq2seq.py module docstring): the encoder remesh off-by-one and the
remesh-concat t=0 behaviour. These semantics were chosen deliberately in
round 1 — refactors must not silently change them (VERDICT round 1, item 10).
"""

import numpy as np

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.state import unflatten
from quadtree_mpnnlstm_tpu.models.seq2seq import (
    Decoder,
    Seq2Seq,
    Seq2SeqState,
    _DecoderScanStep,
)
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

SHAPE = (8, 8)


def _cfgs(**model_kw):
    gcfg = GraphConfig(image_shape=SHAPE, max_grid_size=4, thresh=0.1)
    cfg = ModelConfig(
        hidden_size=4, input_features=1, input_timesteps=3,
        output_timesteps=2, n_layers=1, n_conv_layers=1,
        convolution_type="GCNConv", dropout=0.0, **model_kw,
    )
    return cfg, gcfg


def test_remesh_input_skips_last_frame_remesh():
    """Documented deviation (seq2seq.py docstring; ref seq2seq.py:324 indexes
    one frame past the end): with ``remesh_input`` the step for frame t
    remeshes onto frame t+1 and the LAST step keeps its mesh — so the mesh
    handed to the decoder is the one built from the final input frame."""
    cfg, gcfg = _cfgs(remesh_input=True)
    rng = np.random.default_rng(3)
    # distinct blobs per frame so each frame yields a different quadtree
    x = np.zeros((cfg.input_timesteps, *SHAPE, 1), np.float32)
    x[0, :3, :3] = 1.0
    x[1, 2:6, 2:6] = 1.0
    x[2, 5:, 5:] = 1.0
    x += rng.random(x.shape).astype(np.float32) * 0.02
    x = jnp.asarray(x)

    model = Seq2Seq(cfg, gcfg)
    params = model.init(jax.random.PRNGKey(0), x)
    mask = jnp.zeros(SHAPE, bool)
    state = model.apply(
        params, x, mask=mask, high_interest_region=mask, method="encode"
    )

    x_pe = add_positional_encoding(x)
    g_last, _ = image_to_graph(x_pe[-1:], gcfg)
    g_first, _ = image_to_graph(x_pe[:1], gcfg)
    np.testing.assert_array_equal(
        np.asarray(state.graph.pixel_node), np.asarray(g_last.pixel_node)
    )
    # meaningful only if the frames actually produce different meshes
    assert not np.array_equal(
        np.asarray(g_last.pixel_node), np.asarray(g_first.pixel_node)
    )


def test_remesh_concat_is_self_value_at_t0():
    """Documented deviation (seq2seq.py docstring; ref seq2seq.py:379,:471):
    with remeshing on and no climatology, the decoder's concat channel is
    the CURRENT prediction value at every step *including t=0* (the
    reference only sets it from the first remesh on). Pinned by comparing
    the scan-step output at t=0 against a manual Decoder call with
    ``concat = x[:, [0]]``."""
    cfg, gcfg = _cfgs()
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((1, *SHAPE, 1)).astype(np.float32))
    graph, data = image_to_graph(add_positional_encoding(img), gcfg)
    n = gcfg.n_max
    state = Seq2SeqState(
        graph=graph,
        x=data[0],  # decoder seed: [value, pos_x, pos_y, size]
        hidden=jnp.asarray(
            rng.random((cfg.n_layers, n, cfg.hidden_size)), jnp.float32
        ),
        cell=jnp.asarray(
            rng.random((cfg.n_layers, n, cfg.hidden_size)), jnp.float32
        ),
    )

    step = _DecoderScanStep(cfg, gcfg, deterministic=True)
    mask = jnp.zeros(SHAPE, bool)
    zero_img = jnp.zeros((*SHAPE, 1))
    xs = (jnp.asarray(0), zero_img, zero_img)
    params = step.init(jax.random.PRNGKey(1), state, (mask, mask, None), xs)
    _, y0 = step.apply(params, state, (mask, mask, None), xs)

    out, _, _ = Decoder(cfg).apply(
        {"params": params["params"]["decoder"]},
        state.x, graph, state.x[:, [0]], state.hidden, state.cell, True,
    )
    y_manual = unflatten(out, graph, SHAPE, fill=0.0)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y_manual),
                               rtol=1e-6, atol=1e-6)

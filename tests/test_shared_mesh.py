"""Shared-mesh batched training (TrainConfig.shared_mesh).

The whole batch rides ONE quadtree per step (criterion = max over the
batch, the batch analogue of the builder's timestep-max, ref
graph_functions.py:632) with node tensors in the batch-middle
(n_max, B, F) layout, so aggregations widen with B instead of
re-dispatching per sample (models/seq2seq.py batched paths).

Equivalence contracts proved here:
  * flatten_nb / unflatten_nb == per-sample flatten / unflatten
  * identical samples, remeshing config: every batched sample slice ==
    the single-sample rollout (same mesh by construction), for the fused
    GCN/Cheb gate stacks, the fused attention stack, and the non-fused
    attention convs
  * distinct samples, data-independent mesh (thresh=-inf): shared-mesh
    loss == mean of vmapped per-sample losses, and grads match
  * trainer integration: NextFramePredictorS2S(shared_mesh=True) trains
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.state import (
    flatten,
    flatten_nb,
    unflatten,
    unflatten_nb,
)
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq
from quadtree_mpnnlstm_tpu.train.losses import masked_mse
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

SHAPE = (16, 16)
T_IN, T_OUT = 3, 4


def build(conv="GCNConv", thresh=0.3, fused=True, **kw):
    gcfg = GraphConfig(
        image_shape=SHAPE, max_grid_size=4, thresh=thresh,
        use_edge_attrs=conv in (
            "TransformerConv", "MHTransformerConv", "GATConv", "GATv2Conv"
        ),
    )
    cfg = ModelConfig(
        hidden_size=6, input_features=1, input_timesteps=T_IN,
        output_timesteps=T_OUT, n_layers=2, n_conv_layers=1,
        convolution_type=conv, rnn_type="LSTM", fused_gates=fused,
        **{k: v for k, v in kw.items() if k in ModelConfig.__dataclass_fields__},
    )
    mk = {k: v for k, v in kw.items()
          if k not in ModelConfig.__dataclass_fields__}
    return Seq2Seq(cfg, gcfg, **mk)


def data(seed=0, batch=None):
    rng = np.random.default_rng(seed)
    xs = (T_IN, *SHAPE, 1) if batch is None else (T_IN, batch, *SHAPE, 1)
    ys = (T_OUT, *SHAPE, 1) if batch is None else (T_OUT, batch, *SHAPE, 1)
    x = jnp.asarray(rng.random(xs).astype(np.float32))
    y = jnp.asarray(rng.random(ys).astype(np.float32))
    return x, y


def rollout(model, params, x, y):
    """encode → decode, mirroring the trainer's sample_loss call shape."""
    state = model.apply(params, x, method=Seq2Seq.encode)
    _, y_hat = model.apply(
        params, state, 0, T_OUT, y, None, None, None, method=Seq2Seq.decode
    )
    return y_hat


# ---------------------------------------------------------------- layout


def test_nb_roundtrip_matches_per_sample():
    """(n, B, C) pooling/scatter == per-sample flatten/unflatten."""
    rng = np.random.default_rng(7)
    gcfg = GraphConfig(image_shape=SHAPE, max_grid_size=4, thresh=0.3)
    frame = jnp.asarray(rng.random((1, *SHAPE, 1)).astype(np.float32))
    graph, _ = image_to_graph(add_positional_encoding(frame), gcfg)

    b, c = 3, 2
    img = jnp.asarray(rng.random((*SHAPE, b, c)).astype(np.float32))
    nodes_nb = flatten_nb(img, graph)  # (n, B, C)
    # reference: flatten each sample independently (leading axis = sample)
    per = flatten(jnp.moveaxis(img, 2, 0), graph)  # (B, n, C)
    np.testing.assert_allclose(
        np.asarray(nodes_nb), np.asarray(jnp.moveaxis(per, 0, 1)),
        rtol=1e-6, atol=1e-6,
    )

    back_nb = unflatten_nb(nodes_nb, graph, SHAPE, fill=0.5)
    back = unflatten(per, graph, SHAPE, fill=0.5)  # (B, rows, cols, C)
    np.testing.assert_allclose(
        np.asarray(back_nb), np.asarray(jnp.moveaxis(back, 0, 2)),
        rtol=1e-6, atol=1e-6,
    )


# ------------------------------------------- identical-sample equivalence


@pytest.mark.parametrize(
    "conv,fused",
    [
        ("GCNConv", True),
        ("TransformerConv", True),  # FusedAttnGateStack batched path
        pytest.param("ChebConv", True, marks=pytest.mark.slow),
        pytest.param("TransformerConv", False, marks=pytest.mark.slow),
        pytest.param("GATv2Conv", False, marks=pytest.mark.slow),
    ],
)
def test_identical_samples_match_single(conv, fused):
    """B copies of one sample through the shared mesh == the single-sample
    rollout: the batch-max criterion degenerates to the sample's own, so
    the meshes coincide and each batch lane must reproduce the per-sample
    numbers."""
    model = build(conv=conv, fused=fused)
    x, y = data(11)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(rollout(model, params, x, y))

    b = 3
    xb = jnp.broadcast_to(x[:, None], (T_IN, b, *SHAPE, 1))
    yb = jnp.broadcast_to(y[:, None], (T_OUT, b, *SHAPE, 1))
    out = np.asarray(rollout(model, params, xb, yb))  # (T, B, r, c, 1)
    assert out.shape == (T_OUT, b, *SHAPE, 1)
    for i in range(b):
        np.testing.assert_allclose(out[:, i], ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "grid_attn",
    ["xla", pytest.param("pallas", marks=pytest.mark.slow)],
)
def test_grid_backend_identical_samples_match_single(grid_attn):
    """The flagship's dense grid stencil backend (pixelwise,
    aggregation='grid') through the batched layout: B copies of one
    sample == the single-sample rollout (batch folds into the stencil's
    feature axis / attention heads). Covers both the XLA shift chain and
    the fused stencil-attention kernel (interpret mode on CPU)."""
    from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig

    gcfg = GraphConfig(image_shape=SHAPE, thresh=float("-inf"),
                       aggregation="grid", use_edge_attrs=True,
                       grid_attn=grid_attn)
    cfg = ModelConfig(
        hidden_size=6, input_features=1, input_timesteps=T_IN,
        output_timesteps=T_OUT, n_layers=1, n_conv_layers=1,
        convolution_type="TransformerConv", rnn_type="LSTM",
        fused_gates=False,
    )
    model = Seq2Seq(cfg, gcfg)
    x, y = data(51)
    params = model.init(jax.random.PRNGKey(5), x)
    ref = np.asarray(rollout(model, params, x, y))

    b = 3
    xb = jnp.broadcast_to(x[:, None], (T_IN, b, *SHAPE, 1))
    yb = jnp.broadcast_to(y[:, None], (T_OUT, b, *SHAPE, 1))
    out = np.asarray(rollout(model, params, xb, yb))
    for i in range(b):
        np.testing.assert_allclose(out[:, i], ref, rtol=2e-4, atol=2e-5)


def test_distinct_samples_fixed_mesh_match_vmap():
    """thresh=-inf ⇒ the mesh is data-independent, so the shared mesh IS
    each sample's own mesh and the batched loss/grads must equal the
    vmapped per-sample mean (the default batch path)."""
    model = build(conv="GCNConv", thresh=float("-inf"))
    x0, _ = data(21)
    params = model.init(jax.random.PRNGKey(1), x0)

    b = 3
    x, y = data(22, batch=b)  # (T, B, r, c, 1) — distinct samples

    def batched_loss(p):
        return masked_mse(rollout(model, p, x, y), y)

    def vmap_loss(p):
        losses = jax.vmap(
            lambda xs, ys: masked_mse(rollout(model, p, xs, ys), ys),
            in_axes=(1, 1),
        )(x, y)
        return jnp.mean(losses)

    lb, gb = jax.value_and_grad(batched_loss)(params)
    lv, gv = jax.value_and_grad(vmap_loss)(params)
    np.testing.assert_allclose(float(lb), float(lv), rtol=1e-5)
    flat_b = jax.tree_util.tree_leaves(gb)
    flat_v = jax.tree_util.tree_leaves(gv)
    for a, c in zip(flat_b, flat_v):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=2e-4, atol=1e-5
        )


def test_remesh_every_batched_runs():
    """remesh_every>1 takes the real lax.cond branch in shared-mesh mode
    (no vmap ⇒ no both-branches select); both branches must handle the
    batch-middle layout."""
    model = build(conv="GCNConv", remesh_every=2)
    x0, _ = data(41)
    params = model.init(jax.random.PRNGKey(4), x0)
    x, y = data(42, batch=2)
    state = model.apply(params, x, method=Seq2Seq.encode)
    _, y_hat = model.apply(
        params, state, 0, T_OUT, y, None, None, None, method=Seq2Seq.decode
    )
    assert y_hat.shape == (T_OUT, 2, *SHAPE, 1)
    assert np.isfinite(np.asarray(y_hat)).all()


def test_teacher_forcing_batched_runs():
    """Scheduled sampling in the shared-mesh layout (one draw per step for
    the whole batch — deviation from per-sample draws, documented)."""
    model = build(conv="GCNConv", teacher_forcing_ratio=1.0,
                  deterministic=True)
    x0, _ = data(31)
    params = model.init(jax.random.PRNGKey(2), x0)
    x, y = data(32, batch=2)
    state = model.apply(params, x, method=Seq2Seq.encode)
    _, y_hat = model.apply(
        params, state, 0, T_OUT, y, None, None, None,
        rngs={"sampling": jax.random.PRNGKey(3)}, method=Seq2Seq.decode,
    )
    assert np.isfinite(np.asarray(y_hat)).all()


# ------------------------------------------------------ trainer integration


@pytest.mark.slow
def test_trainer_shared_mesh_tbptt_step():
    """Shared-mesh composes with chunked-re-encode TBPTT (the chunk slices
    run on the time axis, which stays axis 0 in the batched layout)."""
    import jax as _jax

    from quadtree_mpnnlstm_tpu.train.predictor import NextFramePredictorS2S

    pred = NextFramePredictorS2S(
        image_shape=SHAPE, thresh=0.3, input_timesteps=T_IN,
        output_timesteps=T_OUT,
        model_kwargs=dict(hidden_size=6, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv", rnn_type="LSTM"),
        graph_kwargs=dict(max_grid_size=4),
        shared_mesh=True,
    )
    pred.initiate_training(lr=1e-3, lr_decay=0.99)
    step = pred._get_train_step(False, 2)  # 2-step TBPTT chunks
    rng = np.random.default_rng(6)
    b = 2
    x = jnp.asarray(rng.random((b, T_IN, *SHAPE, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((b, T_OUT, *SHAPE, 1)).astype(np.float32))
    clim = jnp.zeros((b, T_OUT, *SHAPE, 1))
    mask = jnp.zeros(SHAPE, bool)
    params, opt, loss, aux = step(
        pred.params, pred.opt_state, x, y, clim, mask, mask, None,
        _jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))
    assert int(aux["mesh_overflow"]) == 0


@pytest.mark.slow
def test_trainer_shared_mesh_e2e():
    from quadtree_mpnnlstm_tpu.config import TrainConfig
    from quadtree_mpnnlstm_tpu.train.predictor import NextFramePredictorS2S

    rng = np.random.default_rng(5)
    n, b = 4, 2
    x = rng.random((n, T_IN, *SHAPE, 1)).astype(np.float32)
    y = rng.random((n, T_OUT, *SHAPE, 1)).astype(np.float32)
    launch = np.array(["2010-01-0%d" % (i + 1) for i in range(n)])
    loader = [
        (x[i:i + b], y[i:i + b], launch[i:i + b])
        for i in range(0, n, b)
    ]

    pred = NextFramePredictorS2S(
        image_shape=SHAPE,
        thresh=0.3,
        input_timesteps=T_IN,
        output_timesteps=T_OUT,
        model_kwargs=dict(hidden_size=6, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv", rnn_type="LSTM"),
        graph_kwargs=dict(max_grid_size=4),
        train_config=TrainConfig(shared_mesh=True),
    )
    assert pred.shared_mesh
    pred.train(loader, loader, n_epochs=1, lr=1e-3)
    assert np.isfinite(pred.loss["train_loss"]).all()
    assert np.isfinite(pred.loss["test_loss"]).all()

"""Grid stencil backend (aggregation="grid") equivalence tests.

The grid backend re-expresses the pixelwise mesh (ref
graph_functions.py:506-539, the committed flagship config ice_exp.py:145)
as an identity-mapped raster with dense shift-stencil aggregation
(ops/grid.py). Node numbering differs from the compact pixelwise path, so
every comparison here happens in pixel space, which is numbering-invariant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import NEG_INF, GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.state import flatten, unflatten
from quadtree_mpnnlstm_tpu.models.conv import (
    TransformerConv,
    a_mul,
    attention_map,
)
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

SHAPE = (16, 24)


def _mask(seed=0, p=0.2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random(SHAPE) < p)


def _img(t=2, c=1, seed=1):
    rng = np.random.default_rng(seed)
    return add_positional_encoding(
        jnp.asarray(rng.random((t, *SHAPE, c)).astype(np.float32))
    )


def _pair(**kw):
    return (
        GraphConfig(image_shape=SHAPE, thresh=NEG_INF, aggregation="xla", **kw),
        GraphConfig(image_shape=SHAPE, thresh=NEG_INF, aggregation="grid", **kw),
    )


def test_grid_requires_pixelwise():
    with pytest.raises(AssertionError):
        GraphConfig(image_shape=SHAPE, thresh=0.1, aggregation="grid")


def test_flatten_unflatten_identity_mapping():
    mask = _mask()
    img = _img()
    _, cfg_g = _pair()
    graph, data = image_to_graph(img, cfg_g, mask=mask)
    assert graph.mapping_identity and graph.edge_src is None
    # flatten is a masked reshape; round-trip recovers valid pixels exactly
    flat = flatten(img, graph)
    back = unflatten(flat, graph, SHAPE)
    m = np.asarray(mask)
    np.testing.assert_array_equal(
        np.asarray(back)[:, ~m], np.asarray(img)[:, ~m]
    )
    assert (np.asarray(back)[:, m] == 0).all()
    # the returned node data ends with the constant cell-size channel
    assert float(jnp.max(jnp.abs(data[..., -1] - cfg_g.resolution**2))) == 0.0


@pytest.mark.parametrize("corners", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_a_mul_matches_xla_pixelwise(corners, masked):
    mask = _mask() if masked else None
    img = _img()
    cfg_x, cfg_g = _pair(edges_at_corners=corners)
    gx, _ = image_to_graph(img, cfg_x, mask=mask)
    gg, _ = image_to_graph(img, cfg_g, mask=mask)

    rng = np.random.default_rng(2)
    z_img = jnp.asarray(rng.standard_normal((1, *SHAPE, 5)).astype(np.float32))
    out_x = unflatten(a_mul(flatten(z_img, gx)[0], gx), gx, SHAPE)
    out_g = unflatten(a_mul(flatten(z_img, gg)[0], gg), gg, SHAPE)
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_x), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("heads,concat", [(1, False), (2, True)])
def test_transformer_conv_matches_xla(heads, concat):
    mask = _mask()
    img = _img(t=1, c=2)
    cfg_x, cfg_g = _pair()
    gx, dx = image_to_graph(img, cfg_x, mask=mask)
    gg, dg = image_to_graph(img, cfg_g, mask=mask)

    conv = TransformerConv(
        out_channels=6, heads=heads, concat=concat, dropout=0.0, edge_dim=2
    )
    params = conv.init(jax.random.PRNGKey(0), dg[0], gg)
    out_g = unflatten(conv.apply(params, dg[0], gg), gg, SHAPE)
    out_x = unflatten(conv.apply(params, dx[0], gx), gx, SHAPE)
    np.testing.assert_allclose(
        np.asarray(out_g), np.asarray(out_x), rtol=1e-4, atol=1e-5
    )


def test_attention_map_grid_layout():
    mask = _mask()
    img = _img(t=1)
    _, cfg_g = _pair()
    gg, dg = image_to_graph(img, cfg_g, mask=mask)
    conv = TransformerConv(out_channels=4, heads=1, concat=False, edge_dim=2)
    params = conv.init(jax.random.PRNGKey(0), dg[0], gg)
    _, inter = conv.apply(params, dg[0], gg, mutable=["intermediates"])
    att = attention_map(inter["intermediates"], gg)
    assert att.shape == (gg.n_max, 1)
    a = np.asarray(att).reshape(SHAPE)
    assert (a[np.asarray(mask)] == 0).all()
    assert np.isfinite(a).all() and a.max() > 0


@pytest.mark.parametrize(
    "conv_type",
    [
        "GCNConv",
        pytest.param("ChebConv", marks=pytest.mark.slow),
        pytest.param("TransformerConv", marks=pytest.mark.slow),
        pytest.param("MHTransformerConv", marks=pytest.mark.slow),
    ],
)
def test_seq2seq_grid_matches_xla(conv_type):
    """Full pixelwise model: identical predictions from the grid stencil
    backend and the edge-list XLA backend (same params — layers depend only
    on feature dims, not node numbering)."""
    mask = _mask(seed=3, p=0.15)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, *SHAPE, 1)).astype(np.float32))

    cfg = ModelConfig(
        hidden_size=6,
        input_features=1,
        input_timesteps=2,
        output_timesteps=3,
        n_layers=1,
        n_conv_layers=2,
        convolution_type=conv_type,
        dropout=0.0,
    )
    cfg_x, cfg_g = _pair(use_edge_attrs=cfg.uses_edge_attrs)

    model_g = Seq2Seq(cfg, cfg_g)
    model_x = Seq2Seq(cfg, cfg_x)
    params = model_g.init(jax.random.PRNGKey(0), x, mask=mask)
    y_g = model_g.apply(params, x, mask=mask)
    y_x = model_x.apply(params, x, mask=mask)
    assert np.isfinite(np.asarray(y_g)).all()
    np.testing.assert_allclose(
        np.asarray(y_g), np.asarray(y_x), rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------- fused kernel


def _fused_pair(**kw):
    return (
        GraphConfig(image_shape=SHAPE, thresh=NEG_INF, aggregation="grid",
                    grid_attn="xla", **kw),
        GraphConfig(image_shape=SHAPE, thresh=NEG_INF, aggregation="grid",
                    grid_attn="pallas", **kw),
    )


@pytest.mark.parametrize("heads,corners", [(1, False), (3, False), (1, True)])
def test_fused_grid_attn_matches_xla_chain(heads, corners):
    """ops/pallas_grid_attn fwd + grads == the XLA shift/softmax chain."""
    from quadtree_mpnnlstm_tpu.models.conv import multi_stream_attention

    mask = _mask(seed=5)
    img = _img(t=1)
    cfg_x, cfg_p = _fused_pair(edges_at_corners=corners)
    gx, _ = image_to_graph(img, cfg_x, mask=mask)
    gp, _ = image_to_graph(img, cfg_p, mask=mask)

    d = 8
    p = SHAPE[0] * SHAPE[1]
    rng = np.random.default_rng(6)
    q, k, v = (jnp.asarray(rng.standard_normal((p, heads * d)).astype(
        np.float32)) for _ in range(3))
    we = jnp.asarray(rng.standard_normal((2, heads * d)).astype(np.float32))

    def loss(g):
        def f(q, k, v, we):
            out, _ = multi_stream_attention(q, k, v, we, g, heads, d)
            return jnp.sum(jnp.sin(out) * jnp.arange(p)[:, None, None])

        return f(q, k, v, we), jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, we)

    lx, gradx = loss(gx)
    lp, gradp = loss(gp)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    for a, b in zip(gradx, gradp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_fused_grid_attn_dropout_matches_xla_chain():
    """Same rng key ⇒ the fused kernel and the XLA chain draw the same
    dropout keep planes and agree exactly."""
    from quadtree_mpnnlstm_tpu.models.conv import multi_stream_attention

    mask = _mask(seed=7)
    img = _img(t=1)
    cfg_x, cfg_p = _fused_pair()
    gx, _ = image_to_graph(img, cfg_x, mask=mask)
    gp, _ = image_to_graph(img, cfg_p, mask=mask)

    heads, d = 2, 4
    p = SHAPE[0] * SHAPE[1]
    rng = np.random.default_rng(8)
    q, k, v = (jnp.asarray(rng.standard_normal((p, heads * d)).astype(
        np.float32)) for _ in range(3))
    key = jax.random.PRNGKey(3)

    outs = []
    for g in (gx, gp):
        out, _ = multi_stream_attention(
            q, k, v, None, g, heads, d,
            dropout=0.4, deterministic=False, rng=key,
        )
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_seq2seq_fused_grid_attn_matches_xla(conv_type="TransformerConv"):
    """Full pixelwise TransformerConv model: fused stencil kernel ==
    XLA chain through training-style apply + grads."""
    mask = _mask(seed=9, p=0.15)
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.random((2, *SHAPE, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((3, *SHAPE, 1)).astype(np.float32))

    cfg = ModelConfig(
        hidden_size=6, input_features=1, input_timesteps=2,
        output_timesteps=3, n_layers=1, n_conv_layers=2,
        convolution_type=conv_type, dropout=0.0,
    )
    cfg_x, cfg_p = _fused_pair(use_edge_attrs=True)
    model_x = Seq2Seq(cfg, cfg_x)
    model_p = Seq2Seq(cfg, cfg_p)
    params = model_x.init(jax.random.PRNGKey(0), x, mask=mask)

    def loss(m):
        def f(p_):
            return jnp.mean((m.apply(p_, x, mask=mask) - y) ** 2)

        return jax.value_and_grad(f)(params)

    lx, gx_ = loss(model_x)
    lp, gp_ = loss(model_p)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    md = max(
        jax.tree.leaves(
            jax.tree.map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))), gx_, gp_
            )
        )
    )
    assert md < 1e-4, md


@pytest.mark.parametrize("heads,corners,dropout",
                         [(1, False, 0.0), (3, True, 0.0), (2, False, 0.4)])
def test_fused_grid_attn_multiblock_matches_xla(
    heads, corners, dropout, monkeypatch
):
    """Row-block tiling (round-5 VMEM fix for the 224×304 flagship):
    shrink the planner budget so this small grid is forced through
    several blocks with halo reassembly, and pin fwd + grads against
    the XLA chain."""
    from quadtree_mpnnlstm_tpu.models.conv import multi_stream_attention
    from quadtree_mpnnlstm_tpu.ops import pallas_grid_attn as pga

    monkeypatch.setattr(pga, "_VMEM_BUDGET", 1)   # 1 row per block
    dims = pga.GridAttnDims(*SHAPE, 1, 8, 4, False)
    r_blk, nb = pga._plan_blocks(dims)
    assert (r_blk, nb) == (1, SHAPE[0])

    mask = _mask(seed=5)
    img = _img(t=1)
    cfg_x, cfg_p = _fused_pair(edges_at_corners=corners)
    gx, _ = image_to_graph(img, cfg_x, mask=mask)
    gp, _ = image_to_graph(img, cfg_p, mask=mask)

    d = 8
    p = SHAPE[0] * SHAPE[1]
    rng = np.random.default_rng(12)
    q, k, v = (jnp.asarray(rng.standard_normal((p, heads * d)).astype(
        np.float32)) for _ in range(3))
    we = jnp.asarray(rng.standard_normal((2, heads * d)).astype(np.float32))
    key = jax.random.PRNGKey(4) if dropout else None

    def loss(g):
        def f(q, k, v, we):
            out, _ = multi_stream_attention(
                q, k, v, we, g, heads, d,
                dropout=dropout, deterministic=dropout == 0.0, rng=key,
            )
            return jnp.sum(jnp.sin(out) * jnp.arange(p)[:, None, None])

        return f(q, k, v, we), jax.grad(f, argnums=(0, 1, 2, 3))(q, k, v, we)

    lx, gradx = loss(gx)
    lp, gradp = loss(gp)
    np.testing.assert_allclose(float(lx), float(lp), rtol=1e-5)
    for a, b in zip(gradx, gradp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_fused_grid_attn_isolated_pixel():
    """A valid pixel with every neighbour masked has an empty softmax —
    both backends must emit exactly zero aggregation there (the conv's
    root/skip term is added outside)."""
    from quadtree_mpnnlstm_tpu.models.conv import multi_stream_attention

    mask_np = np.ones(SHAPE, bool)
    mask_np[4, 6] = False            # isolated valid pixel
    mask_np[10:13, 10:13] = False    # a normal valid patch
    mask_np[10, 11] = True           # poke a hole inside the patch
    mask = jnp.asarray(mask_np)
    img = _img(t=1)
    cfg_x, cfg_p = _fused_pair()
    heads, d = 1, 8
    p = SHAPE[0] * SHAPE[1]
    rng = np.random.default_rng(11)
    q, k, v = (jnp.asarray(rng.standard_normal((p, heads * d)).astype(
        np.float32)) for _ in range(3))

    outs = []
    for cfg in (cfg_x, cfg_p):
        g, _ = image_to_graph(img, cfg, mask=mask)
        out, _ = multi_stream_attention(q, k, v, None, g, heads, d)
        outs.append(np.asarray(out.reshape(*SHAPE, heads * d)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-4, atol=1e-6)
    assert np.allclose(outs[1][4, 6], 0.0)          # no neighbours
    assert np.abs(outs[1][11, 11]).max() > 0        # patch aggregates


@pytest.mark.slow
def test_gat_on_grid_falls_back_to_xla(capsys):
    """A reference pixelwise GAT experiment must construct and run, not
    raise from inside jit (models/conv.py grid guardrail): the predictor
    auto-falls back to the edge-list backend (VERDICT r3 #9)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    model = NextFramePredictorS2S(
        image_shape=(8, 8),
        thresh=float("-inf"),
        decompose=False,
        input_features=1,
        input_timesteps=2,
        output_timesteps=2,
        model_kwargs=dict(hidden_size=4, n_layers=1, n_conv_layers=1,
                          convolution_type="GATConv"),
        graph_kwargs=dict(aggregation="grid"),
    )
    assert model.gcfg.aggregation == "xla"
    assert "falling back" in capsys.readouterr().out
    model.initiate_training(lr=0.01, lr_decay=0.95)
    step = model._get_train_step(False, 0)
    x = jnp.asarray(np.random.default_rng(0).random((1, 2, 8, 8, 1),
                                                    np.float32))
    y = jnp.asarray(np.random.default_rng(1).random((1, 2, 8, 8, 1),
                                                    np.float32))
    clim = jnp.zeros((1, 2, 8, 8, 1))
    mask = jnp.zeros((8, 8), bool)
    out = step(model.params, model.opt_state, x, y, clim, mask, mask, None,
               jax.random.PRNGKey(0))
    assert np.isfinite(float(out[2]))


def test_fused_grid_attn_vmapped_falls_back_to_xla():
    """vmap-of-pallas_call lowers with squeezed mid-axis block specs that
    Mosaic rejects on real TPU (round-5 A/B: the per-gate ``nn.vmap`` cell
    layout crashed ``--grid-attn pallas`` at ice scale). A batched trace of
    the grid-fused branch must therefore route to the XLA chain — no
    pallas_call in the jaxpr — and match the per-sample fused results."""
    from quadtree_mpnnlstm_tpu.models.conv import multi_stream_attention

    mask = _mask(seed=11)
    img = _img(t=1)
    _, cfg_p = _fused_pair()
    gp, _ = image_to_graph(img, cfg_p, mask=mask)

    heads, d = 1, 8
    p = SHAPE[0] * SHAPE[1]
    rng = np.random.default_rng(12)
    qb, kb, vb = (jnp.asarray(rng.standard_normal(
        (3, p, heads * d)).astype(np.float32)) for _ in range(3))

    def f(q, k, v):
        out, _ = multi_stream_attention(q, k, v, None, gp, heads, d)
        return out

    assert "pallas_call" not in str(jax.make_jaxpr(jax.vmap(f))(qb, kb, vb))
    # the unbatched trace still takes the fused kernel
    assert "pallas_call" in str(jax.make_jaxpr(f)(qb[0], kb[0], vb[0]))
    out_b = jax.vmap(f)(qb, kb, vb)
    out_s = jnp.stack([f(qb[i], kb[i], vb[i]) for i in range(3)])
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_s), rtol=1e-4, atol=1e-5
    )

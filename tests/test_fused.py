"""Fused gate-conv stacks must be numerically identical to the per-gate
GraphConv stacks (weights transplanted across layouts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph import image_to_graph
from quadtree_mpnnlstm_tpu.models.cells import GConvLSTM, GConvGRU
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def make_graph(seed=0, shape=(8, 8)):
    rng = np.random.default_rng(seed)
    img = rng.random((1, *shape, 1)).astype(np.float32)
    cfg = GraphConfig(image_shape=shape, max_grid_size=4, thresh=0.5)
    x = add_positional_encoding(jnp.asarray(img))
    graph, data = image_to_graph(x, cfg)
    return graph, data[0]


def transplant_lstm(unfused, conv_type, n_layers, n_gates=4):
    """per-gate vmapped params → fused stream layout."""
    p = unfused["params"]
    cx, ch = p["conv_x"], p["conv_h"]
    fused = {}
    if conv_type == "ChebConv":
        k_taps = len([k for k in cx["conv_0"] if k.startswith("lin_")])
        fused["w_x_0"] = jnp.stack(
            [cx["conv_0"][f"lin_{k}"]["kernel"] for k in range(k_taps)], 1
        )
        fused["w_h_0"] = jnp.stack(
            [ch["conv_0"][f"lin_{k}"]["kernel"] for k in range(k_taps)], 1
        )
        fused["b_x_0"] = cx["conv_0"]["bias"]
        fused["b_h_0"] = ch["conv_0"]["bias"]
        for layer in range(1, n_layers):
            wx = jnp.stack(
                [cx[f"conv_{layer}"][f"lin_{k}"]["kernel"] for k in range(k_taps)], 1
            )
            wh = jnp.stack(
                [ch[f"conv_{layer}"][f"lin_{k}"]["kernel"] for k in range(k_taps)], 1
            )
            fused[f"w_{layer}"] = jnp.concatenate([wx, wh], 0)
            fused[f"b_{layer}"] = jnp.concatenate(
                [cx[f"conv_{layer}"]["bias"], ch[f"conv_{layer}"]["bias"]], 0
            )
    else:  # GCNConv
        fused["w_x_0"] = cx["conv_0"]["lin"]["kernel"]
        fused["w_h_0"] = ch["conv_0"]["lin"]["kernel"]
        fused["b_x_0"] = cx["conv_0"]["bias"]
        fused["b_h_0"] = ch["conv_0"]["bias"]
        for layer in range(1, n_layers):
            fused[f"w_{layer}"] = jnp.concatenate(
                [cx[f"conv_{layer}"]["lin"]["kernel"],
                 ch[f"conv_{layer}"]["lin"]["kernel"]], 0
            )
            fused[f"b_{layer}"] = jnp.concatenate(
                [cx[f"conv_{layer}"]["bias"], ch[f"conv_{layer}"]["bias"]], 0
            )
    out = {"params": {"gates": fused}}
    for k in ("w_c_i", "w_c_f", "w_c_o", "b_i", "b_f", "b_c", "b_o"):
        out["params"][k] = p[k]
    return out


@pytest.mark.parametrize("conv_type", ["ChebConv", "GCNConv"])
@pytest.mark.parametrize("n_layers", [1, 2, 3])
def test_fused_lstm_matches_per_gate(conv_type, n_layers):
    graph, x = make_graph()
    d = 6
    n = graph.n_max
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    unfused_cell = GConvLSTM(out_channels=d, n_conv_layers=n_layers,
                             convolution_type=conv_type, fused=False)
    fused_cell = GConvLSTM(out_channels=d, n_conv_layers=n_layers,
                           convolution_type=conv_type, fused=True)
    up = unfused_cell.init(jax.random.PRNGKey(0), x, graph, h, c)
    # randomise the zero-init biases/peepholes so the test is non-trivial
    up = jax.tree.map(
        lambda a: a + 0.1 * np.random.default_rng(2).normal(size=a.shape)
        .astype(np.float32),
        up,
    )
    fp = transplant_lstm(up, conv_type, n_layers)

    o_u, h_u, c_u = unfused_cell.apply(up, x, graph, h, c)
    o_f, h_f, c_f = fused_cell.apply(fp, x, graph, h, c)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_u),
                               rtol=1e-5, atol=1e-6)


def test_fused_gru_runs_and_learns_shape():
    graph, x = make_graph(seed=3)
    d = 5
    n = graph.n_max
    h = jnp.zeros((n, d))
    c = jnp.zeros((n, d))
    cell = GConvGRU(out_channels=d, convolution_type="ChebConv",
                    n_conv_layers=2)
    params = cell.init(jax.random.PRNGKey(1), x, graph, h, c)
    out, h1, c1 = cell.apply(params, x, graph, h, c)
    assert out.shape == (n, d)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c))


# ---------------------------------------------------------------------------
# Attention gate stacks (gates-as-heads fusion, models/fused.py)
# ---------------------------------------------------------------------------


def transplant_attn_lstm(unfused, conv_type, n_layers):
    """per-gate vmapped TransformerConv params → fused stream layout."""
    p = unfused["params"]
    cx, ch = p["conv_x"], p["conv_h"]
    mh = conv_type == "MHTransformerConv"

    def leaf(side, layer, name, part):
        node = side[f"conv_{layer}"]
        if mh:
            node = node["conv"] if name != "lin" else side[f"conv_{layer}"]
        return node[name][part]

    fused = {}
    for short, lin in (("q", "lin_query"), ("k", "lin_key"),
                       ("v", "lin_value")):
        fused[f"w_{short}_x_0"] = leaf(cx, 0, lin, "kernel")
        fused[f"b_{short}_x_0"] = leaf(cx, 0, lin, "bias")
        fused[f"w_{short}_h_0"] = leaf(ch, 0, lin, "kernel")
        fused[f"b_{short}_h_0"] = leaf(ch, 0, lin, "bias")
    fused["w_e_x_0"] = leaf(cx, 0, "lin_edge", "kernel")
    fused["w_e_h_0"] = leaf(ch, 0, "lin_edge", "kernel")
    fused["w_s_x_0"] = leaf(cx, 0, "lin_skip", "kernel")
    fused["b_s_x_0"] = leaf(cx, 0, "lin_skip", "bias")
    fused["w_s_h_0"] = leaf(ch, 0, "lin_skip", "kernel")
    fused["b_s_h_0"] = leaf(ch, 0, "lin_skip", "bias")
    if mh:
        fused["w_mix_0"] = jnp.concatenate(
            [cx["conv_0"]["lin"]["kernel"], ch["conv_0"]["lin"]["kernel"]], 0
        )
        fused["b_mix_0"] = jnp.concatenate(
            [cx["conv_0"]["lin"]["bias"], ch["conv_0"]["lin"]["bias"]], 0
        )
    for layer in range(1, n_layers):
        for short, lin in (("q", "lin_query"), ("k", "lin_key"),
                           ("v", "lin_value")):
            fused[f"w_{short}_{layer}"] = jnp.concatenate(
                [leaf(cx, layer, lin, "kernel"),
                 leaf(ch, layer, lin, "kernel")], 0)
            fused[f"b_{short}_{layer}"] = jnp.concatenate(
                [leaf(cx, layer, lin, "bias"),
                 leaf(ch, layer, lin, "bias")], 0)
        fused[f"w_e_{layer}"] = jnp.concatenate(
            [leaf(cx, layer, "lin_edge", "kernel"),
             leaf(ch, layer, "lin_edge", "kernel")], 0)
        fused[f"w_s_{layer}"] = jnp.concatenate(
            [leaf(cx, layer, "lin_skip", "kernel"),
             leaf(ch, layer, "lin_skip", "kernel")], 0)
        fused[f"b_s_{layer}"] = jnp.concatenate(
            [leaf(cx, layer, "lin_skip", "bias"),
             leaf(ch, layer, "lin_skip", "bias")], 0)
        if mh:
            fused[f"w_mix_{layer}"] = jnp.concatenate(
                [cx[f"conv_{layer}"]["lin"]["kernel"],
                 ch[f"conv_{layer}"]["lin"]["kernel"]], 0)
            fused[f"b_mix_{layer}"] = jnp.concatenate(
                [cx[f"conv_{layer}"]["lin"]["bias"],
                 ch[f"conv_{layer}"]["lin"]["bias"]], 0)
    out = {"params": {"gates": fused}}
    for k in ("w_c_i", "w_c_f", "w_c_o", "b_i", "b_f", "b_c", "b_o"):
        out["params"][k] = p[k]
    return out


@pytest.mark.parametrize("conv_type", ["TransformerConv", "MHTransformerConv"])
@pytest.mark.parametrize("n_layers", [1, 2])
def test_fused_attn_lstm_matches_per_gate(conv_type, n_layers):
    graph, x = make_graph()
    d = 6
    n = graph.n_max
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    unfused_cell = GConvLSTM(out_channels=d, n_conv_layers=n_layers,
                             convolution_type=conv_type, fused=False)
    fused_cell = GConvLSTM(out_channels=d, n_conv_layers=n_layers,
                           convolution_type=conv_type, fused=True)
    params_u = unfused_cell.init(jax.random.PRNGKey(0), x, graph, h, c)
    params_f = transplant_attn_lstm(params_u, conv_type, n_layers)

    o_u, h_u, c_u = unfused_cell.apply(params_u, x, graph, h, c)
    o_f, h_f, c_f = fused_cell.apply(params_f, x, graph, h, c)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_u),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_u),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_u),
                               rtol=2e-4, atol=2e-5)

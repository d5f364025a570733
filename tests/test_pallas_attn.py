"""Fused Pallas attention aggregation (ops/pallas_attn.py).

Runs in interpret mode on CPU — the exact program the TPU compiles.
Oracle: the XLA edge-list path (gather → edge-softmax → scatter), the same
algorithm PyG's TransformerConv kernels run (ref model/model.py:51).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.models.conv import TransformerConv
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq
from quadtree_mpnnlstm_tpu.ops.pallas_attn import (
    AttnDims,
    attn_apply,
    attn_reference,
    attn_tile_meta,
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


def _qkvwe(n, heads, d, seed=1):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return mk(n, heads * d), mk(n, heads * d), mk(n, heads * d), mk(2, heads * d)


@pytest.mark.parametrize("heads,d", [(1, 16), (3, 8)])
def test_attn_matches_oracle_fwd(heads, d):
    cfg, graph, _ = _graph()
    meta, ovf = attn_tile_meta(
        graph.edge_src, graph.edge_dst, graph.edge_attr, cfg.n_max,
        NT, EB, SW,
    )
    assert int(ovf) == 0
    q, k, v, we = _qkvwe(cfg.n_max, heads, d)
    keep = jnp.ones(meta.src_rel.shape, jnp.float32)
    dims = AttnDims(cfg.n_max, NT, EB, SW, heads, d)

    out = attn_apply(q, k, v, we, keep, meta, dims)
    ref = attn_reference(
        q, k, v, we, graph.edge_src, graph.edge_dst, graph.edge_valid,
        graph.edge_attr, cfg.n_max, heads, d,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("heads,d", [(1, 16), (3, 8)])
def test_attn_matches_oracle_grads(heads, d):
    cfg, graph, _ = _graph(shape=(16, 16), n_max=256, e_max=2048)
    meta, ovf = attn_tile_meta(
        graph.edge_src, graph.edge_dst, graph.edge_attr, cfg.n_max,
        NT, 512, 256,
    )
    assert int(ovf) == 0
    q, k, v, we = _qkvwe(cfg.n_max, heads, d, seed=2)
    keep = jnp.ones(meta.src_rel.shape, jnp.float32)
    dims = AttnDims(cfg.n_max, NT, 512, 256, heads, d)
    w = jnp.asarray(
        np.random.default_rng(3)
        .standard_normal((cfg.n_max, heads * d))
        .astype(np.float32)
    )

    def loss_k(q, k, v, we):
        return jnp.sum(jnp.sin(attn_apply(q, k, v, we, keep, meta, dims)) * w)

    def loss_r(q, k, v, we):
        return jnp.sum(
            jnp.sin(
                attn_reference(
                    q, k, v, we, graph.edge_src, graph.edge_dst,
                    graph.edge_valid, graph.edge_attr, cfg.n_max, heads, d,
                )
            )
            * w
        )

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(q, k, v, we)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, we)
    for a, b, name in zip(gk, gr, "qkve"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
            err_msg=f"grad d{name}",
        )


def test_transformer_conv_dispatches_to_fused():
    """A TransformerConv on an attn_windows graph matches the XLA edge-list
    path with identical params (same node numbering — direct comparison)."""
    cfg, graph, data = _graph(
        aggregation="pallas", attn_windows=True,
        agg_nt=NT, agg_eb=EB, agg_sw=SW,
    )
    assert graph.agg[0] == "pallas_attn" and graph.attn_meta is not None
    conv = TransformerConv(out_channels=6, heads=1, concat=False,
                           dropout=0.0, edge_dim=2)
    params = conv.init(jax.random.PRNGKey(0), data[0], graph)
    out_fused = conv.apply(params, data[0], graph)

    graph_xla = graph.replace(agg=("xla", 0, 0, 0))
    out_xla = conv.apply(params, data[0], graph_xla)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), rtol=1e-4, atol=1e-4
    )


def test_attn_under_vmap():
    cfg = GraphConfig(image_shape=(16, 16), max_grid_size=8, thresh=0.3,
                      n_max=256, e_max=2048)
    rng = np.random.default_rng(4)
    xb = jnp.asarray(rng.random((2, 1, 16, 16, 1)).astype(np.float32))
    qb, kb, vb = (
        jnp.asarray(rng.standard_normal((2, cfg.n_max, 8)).astype(np.float32))
        for _ in range(3)
    )
    we = jnp.asarray(rng.standard_normal((2, 8)).astype(np.float32))
    dims = AttnDims(cfg.n_max, NT, 512, 256, 1, 8)

    def per(x, q, k, v):
        g, _ = image_to_graph(add_positional_encoding(x), cfg)
        meta, _ = attn_tile_meta(
            g.edge_src, g.edge_dst, g.edge_attr, cfg.n_max, NT, 512, 256
        )
        keep = jnp.ones(meta.src_rel.shape, jnp.float32)
        out = attn_apply(q, k, v, we, keep, meta, dims)
        ref = attn_reference(q, k, v, we, g.edge_src, g.edge_dst,
                             g.edge_valid, g.edge_attr, cfg.n_max, 1, 8)
        return out, ref

    out, ref = jax.jit(jax.vmap(per))(xb, qb, kb, vb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_attn_window_overflow_counted():
    cfg, graph, _ = _graph(
        aggregation="pallas", attn_windows=True, agg_nt=8, agg_eb=8,
        agg_sw=8,
    )
    assert int(graph.overflow) > 0


def test_seq2seq_fused_attention_matches_xla():
    """Full remeshing Seq2Seq: fused attention backend vs XLA edge lists
    (attention windows rebuilt inside the decoder scan every remesh)."""
    shape = (16, 16)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, *shape, 1)).astype(np.float32))

    cfg = ModelConfig(
        hidden_size=6, input_features=1, input_timesteps=2,
        output_timesteps=2, n_layers=1, n_conv_layers=1,
        convolution_type="TransformerConv", dropout=0.0,
    )
    base = dict(image_shape=shape, max_grid_size=4, thresh=0.3,
                n_max=256, e_max=2048)
    g_x = GraphConfig(aggregation="xla", **base)
    g_f = GraphConfig(aggregation="pallas", attn_windows=True,
                      agg_nt=128, agg_eb=512, agg_sw=256, **base)

    model_x = Seq2Seq(cfg, g_x)
    model_f = Seq2Seq(cfg, g_f)
    params = model_x.init(jax.random.PRNGKey(0), x)
    y_x = model_x.apply(params, x)
    y_f = model_f.apply(params, x)
    assert np.isfinite(np.asarray(y_f)).all()
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_x), rtol=1e-4, atol=1e-4
    )

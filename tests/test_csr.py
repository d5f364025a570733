"""CSR segment-reduction tests: forward/adjoint parity with XLA segment ops
and the degree-bound guarantee on real quadtree meshes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph import image_to_graph
from quadtree_mpnnlstm_tpu.ops.csr import (
    csr_segment_max,
    csr_segment_sum,
    gather_dst_csr,
    gather_src_csr,
)
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def sorted_ids(e, n, seed=0, sentinels=True):
    rng = np.random.default_rng(seed)
    hi = n + 1 if sentinels else n
    ids = np.sort(rng.integers(0, hi, e))
    ids = np.minimum(ids, n)  # sentinel = n
    return jnp.asarray(ids.astype(np.int32))


def test_csr_sum_matches_xla():
    e, f, n, deg = 500, 7, 64, 32
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.normal(size=(e, f)).astype(np.float32))
    ids = sorted_ids(e, n, 1)
    out = csr_segment_sum(vals, ids, n, deg)
    ref = jax.ops.segment_sum(vals, ids, num_segments=n + 1)[:n]
    # some segments may exceed deg=32 with e=500/n=64: use a big enough cap
    out64 = csr_segment_sum(vals, ids, n, 64)
    np.testing.assert_allclose(np.asarray(out64), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_csr_sum_adjoint_is_gather():
    e, f, n, deg = 300, 5, 48, 300
    rng = np.random.default_rng(2)
    vals = jnp.asarray(rng.normal(size=(e, f)).astype(np.float32))
    ids = sorted_ids(e, n, 2)

    def loss_csr(v):
        return jnp.sum(csr_segment_sum(v, ids, n, deg) ** 2)

    def loss_xla(v):
        return jnp.sum(jax.ops.segment_sum(v, ids, num_segments=n + 1)[:n] ** 2)

    g1 = jax.grad(loss_csr)(vals)
    g2 = jax.grad(loss_xla)(vals)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_csr_max():
    e, n = 200, 32
    rng = np.random.default_rng(3)
    vals = jnp.asarray(rng.normal(size=(e, 3)).astype(np.float32))
    ids = sorted_ids(e, n, 3)
    out = csr_segment_max(vals, ids, n, 200)
    ref = jax.ops.segment_max(vals, ids, num_segments=n + 1)[:n]
    ref = jnp.maximum(ref, -1e30)  # empty segments
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_gather_adjoints():
    e, f, n = 300, 4, 48
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    dst = sorted_ids(e, n, 4)
    # a source view: random src ids + its sorted permutation
    src = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    perm = jnp.asarray(np.argsort(np.asarray(src), kind="stable").astype(np.int32))
    src_sorted = src[perm]

    w = jnp.asarray(rng.normal(size=(e, f)).astype(np.float32))

    def loss_csr(x):
        return jnp.sum(gather_src_csr(x, src, perm, src_sorted, n, e) * w)

    def loss_ref(x):
        return jnp.sum(x[src] * w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_csr)(x)), np.asarray(jax.grad(loss_ref)(x)),
        rtol=1e-5, atol=1e-5,
    )

    def loss_csr_d(x):
        return jnp.sum(gather_dst_csr(x, dst, n, e) * w)

    def loss_ref_d(x):
        xp = jnp.concatenate([x, jnp.zeros((1, f))])
        return jnp.sum(xp[jnp.minimum(dst, n)] * w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_csr_d)(x)), np.asarray(jax.grad(loss_ref_d)(x)),
        rtol=1e-5, atol=1e-5,
    )


def test_quadtree_degree_within_bound():
    """cfg.max_degree must dominate the true in-degree of real meshes."""
    for seed in range(5):
        rng = np.random.default_rng(seed)
        shape = (32, 32)
        cfg = GraphConfig(image_shape=shape, max_grid_size=8, thresh=0.15)
        cfg = cfg.replace(max_degree=cfg.degree_bound)
        img = rng.random((1, *shape, 1)).astype(np.float32)
        mask = rng.random(shape) < 0.1
        x = add_positional_encoding(jnp.asarray(img))
        g, _ = image_to_graph(x, cfg, mask=jnp.asarray(mask))
        dst = np.asarray(g.edge_dst)[np.asarray(g.edge_valid)]
        if len(dst):
            max_deg = np.bincount(dst).max()
            assert max_deg <= cfg.max_degree, (max_deg, cfg.max_degree)


def test_csr_degree_truncation_is_loud():
    """VERDICT round-2 item 8: an undersized max_degree must surface in the
    overflow counter instead of silently truncating aggregation sums."""
    shape = (16, 16)
    rng = np.random.default_rng(6)
    img = add_positional_encoding(
        jnp.asarray(rng.uniform(0.3, 0.7, (1, *shape, 1)).astype(np.float32))
    )
    base = GraphConfig(image_shape=shape, max_grid_size=8, thresh=0.1)

    g_ok, _ = image_to_graph(img, base.replace(max_degree=base.degree_bound))
    assert int(g_ok.overflow) == 0

    # pixelwise mesh has true degree 4 (interior); cap at 2 → loud overflow
    g_bad, _ = image_to_graph(img, base.replace(max_degree=2))
    dst = np.asarray(g_bad.edge_dst)[np.asarray(g_bad.edge_valid)]
    expected = int(np.maximum(np.bincount(dst) - 2, 0).sum())
    assert expected > 0
    assert int(g_bad.overflow) >= expected


@pytest.mark.slow
def test_model_grads_csr_vs_scatter():
    """Full-model gradient parity: CSR graphs vs max_degree=0 fallback."""
    from quadtree_mpnnlstm_tpu.config import ModelConfig
    from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq

    shape = (16, 16)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, *shape, 1)).astype(np.float32))
    y = jnp.asarray(rng.random((2, *shape, 1)).astype(np.float32))
    cfg = ModelConfig(hidden_size=6, input_features=1, input_timesteps=2,
                      output_timesteps=2, n_layers=1, n_conv_layers=2,
                      convolution_type="TransformerConv", dropout=0.0)

    outs = []
    base = GraphConfig(image_shape=shape, max_grid_size=4, thresh=0.3)
    for deg in (0, base.degree_bound):  # scatter path vs CSR path
        gcfg = base.replace(max_degree=deg)
        model = Seq2Seq(cfg, gcfg)
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.mean((model.apply(p, x) - y) ** 2)

        outs.append((model.apply(params, x), jax.grad(loss)(params)))

    np.testing.assert_allclose(np.asarray(outs[0][0]), np.asarray(outs[1][0]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)

"""GraphConfig.node_budget: graceful coarsening capacity control.

TPU-native feature with no reference counterpart (the reference's meshes
are unbounded dynamic shapes): when a mesh would exceed the budget, the
finest refinement level is coarsened globally until it fits — instead of
the n_max overflow guard's silent raster-tail drop.
"""

import numpy as np

import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.quadtree import decompose_levels
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

SHAPE = (32, 32)


def _field(seed=0, lo=0.3, hi=0.7):
    """A field above thresh everywhere → unbounded mesh fully splits."""
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, (1, *SHAPE, 1)).astype(np.float32))


def _cfg(**kw):
    return GraphConfig(image_shape=SHAPE, max_grid_size=8, thresh=0.1, **kw)


def test_budget_respected_and_partition_valid():
    img = add_positional_encoding(_field())
    full, _ = image_to_graph(img, _cfg())
    assert int(full.n_nodes) == 32 * 32  # sanity: unbounded mesh fully splits

    for budget in (300, 120, 40):
        g, data = image_to_graph(img, _cfg(node_budget=budget))
        n = int(g.n_nodes)
        assert 0 < n <= budget
        # valid partition: every pixel mapped to a live node, counts sum = P
        pn = np.asarray(g.pixel_node)
        assert (pn < n).all()
        assert float(np.asarray(g.counts).sum()) == 32 * 32
        assert int(g.overflow) == 0


def test_budget_inactive_when_mesh_fits():
    rng = np.random.default_rng(1)
    img = add_positional_encoding(
        jnp.asarray((rng.random((1, *SHAPE, 1)) > 0.97).astype(np.float32))
    )
    lvl_free = decompose_levels(img[0, ..., 0], _cfg())
    lvl_budget = decompose_levels(img[0, ..., 0], _cfg(node_budget=1024))
    np.testing.assert_array_equal(np.asarray(lvl_free), np.asarray(lvl_budget))


def test_budget_coarsens_monotonically():
    img = _field(seed=2)
    lvls = [
        np.asarray(decompose_levels(img[0, ..., 0], _cfg(node_budget=b)))
        for b in (1024, 300, 120, 40)
    ]
    for finer, coarser in zip(lvls, lvls[1:]):
        assert (coarser <= finer).all()


def test_budget_preserves_mask_forced_splits_non_aligned():
    """Advisor repro (round 2, high): a capped block whose anchor pixel is
    masked must not swallow unmasked pixels — mask-overlapping blocks are
    exempt from capping, so every unmasked pixel keeps a valid node id and
    counts partition the unmasked canvas exactly."""
    shape = (16, 16)
    rng = np.random.default_rng(4)
    img = add_positional_encoding(
        jnp.asarray(rng.uniform(0.3, 0.7, (1, *shape, 1)).astype(np.float32))
    )
    mask = np.zeros(shape, bool)
    mask[0, 0] = True  # non-block-aligned: anchor pixel of every block level
    cfg = GraphConfig(
        image_shape=shape, max_grid_size=8, thresh=0.1, node_budget=16
    )
    g, _ = image_to_graph(img, cfg, mask=jnp.asarray(mask))
    pn = np.asarray(g.pixel_node).reshape(shape)
    n = int(g.n_nodes)
    assert (pn[~mask] >= 0).all() and (pn[~mask] < n).all()
    assert (pn[mask] == cfg.n_max).all()
    assert float(np.asarray(g.counts).sum()) == float((~mask).sum())
    assert int(g.overflow) == 0

    # an interior non-aligned masked pixel exercises the same exemption
    mask2 = np.zeros(shape, bool)
    mask2[5, 9] = True
    g2, _ = image_to_graph(
        img, cfg.replace(node_budget=24), mask=jnp.asarray(mask2)
    )
    pn2 = np.asarray(g2.pixel_node).reshape(shape)
    assert (pn2[~mask2] >= 0).all() and (pn2[~mask2] < int(g2.n_nodes)).all()
    assert float(np.asarray(g2.counts).sum()) == float((~mask2).sum())


def test_budget_counts_only_unmasked_nodes():
    img = add_positional_encoding(_field(seed=3))
    mask = np.zeros(SHAPE, bool)
    mask[:16] = True  # half the canvas masked
    g, _ = image_to_graph(img, _cfg(node_budget=300), mask=jnp.asarray(mask))
    n = int(g.n_nodes)
    assert 0 < n <= 300
    pn = np.asarray(g.pixel_node).reshape(SHAPE)
    assert (pn[mask] == _cfg().n_max).all()  # masked pixels stay sentinel
    # unmasked half can afford full resolution within a 300 budget? 16*32=512
    # pixels > 300, so it must have coarsened — but still partitions validly
    assert float(np.asarray(g.counts).sum()) == (~mask).sum()

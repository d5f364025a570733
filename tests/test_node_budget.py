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

"""Graph-engine parity & property tests (test strategy: SURVEY.md §4, §7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph import (
    GraphTensors,
    flatten,
    unflatten,
    image_to_graph,
    pixelwise_graph,
    create_static_heterogeneous_graph,
    create_static_homogeneous_graph,
)
from quadtree_mpnnlstm_tpu.graph.quadtree import decompose_levels, pixel_nodes_from_levels
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

import oracle


def labels_from_pixel_node(pixel_node, shape, n_max):
    lab = np.asarray(pixel_node).reshape(shape).astype(np.int64)
    return np.where(lab >= n_max, -1, lab)


def jax_labels(img, cfg, mask=None, hir=None, transform=None):
    level = decompose_levels(
        jnp.asarray(img), cfg,
        mask=None if mask is None else jnp.asarray(mask),
        high_interest_region=None if hir is None else jnp.asarray(hir),
        transform_func=transform,
    )
    pixel_node, n_nodes, counts = pixel_nodes_from_levels(
        level, cfg, mask=None if mask is None else jnp.asarray(mask)
    )
    return labels_from_pixel_node(pixel_node, img.shape, cfg.n_max), int(n_nodes)


CASES = [
    # (shape, max_size, thresh, padding, condition, with_mask, with_hir)
    ((16, 16), 8, 0.5, 0, "max_larger_than", False, False),
    ((16, 16), 8, 0.5, 0, "max_larger_than", True, False),
    ((16, 16), 8, 0.5, 1, "max_larger_than", True, True),
    ((16, 16), 4, 0.3, 0, "min_smaller_than", True, False),
    ((12, 20), 8, 0.5, 0, "max_larger_than", True, False),  # non-multiple shape
    ((16, 16), 8, 0.7, 0, "max_smaller_than", False, False),
    ((16, 16), 8, 0.4, 1, "min_larger_than", False, False),
    ((8, 8), 8, float("inf"), 0, "max_larger_than", True, False),  # static-mesh mode
]


@pytest.mark.parametrize("case", CASES)
def test_decompose_partition_parity(case):
    shape, max_size, thresh, padding, condition, with_mask, with_hir = case
    rng = np.random.default_rng(0)
    img = rng.random(shape).astype(np.float32)
    mask = (rng.random(shape) < 0.2) if with_mask else None
    hir = np.zeros(shape, bool) if with_hir else None
    if with_hir:
        hir[2:5, 2:5] = True

    ref = oracle.quadtree_labels(
        img, thresh=thresh, max_size=max_size, mask=mask,
        high_interest_region=hir, padding=padding, condition=condition,
    )
    cfg = GraphConfig(
        image_shape=shape, max_grid_size=max_size, thresh=thresh,
        padding=padding, condition=condition,
    )
    ours, n_nodes = jax_labels(img, cfg, mask=mask, hir=hir)

    bij = oracle.partition_bijection(ref, ours)
    assert bij is not None, "partitions differ from oracle"
    assert n_nodes == len(np.unique(ref[ref >= 0]))


def test_transform_func_applied():
    rng = np.random.default_rng(1)
    img = rng.random((16, 16)).astype(np.float32)
    tf = lambda a: abs(a - 0.5)  # the ref's dist_from_05 (ice_exp.py:149-150)
    ref = oracle.quadtree_labels(img, thresh=0.3, max_size=8, transform=tf)
    cfg = GraphConfig(image_shape=(16, 16), max_grid_size=8, thresh=0.3)
    ours, _ = jax_labels(img, cfg, transform=lambda a: jnp.abs(a - 0.5))
    assert oracle.partition_bijection(ref, ours) is not None


def test_adjacency_parity():
    rng = np.random.default_rng(2)
    shape = (16, 16)
    img = rng.random(shape).astype(np.float32)
    mask = rng.random(shape) < 0.15
    cfg = GraphConfig(image_shape=shape, max_grid_size=8, thresh=0.5)
    x = jnp.asarray(img)[None, :, :, None]
    x = add_positional_encoding(x)
    graph, data = image_to_graph(x, cfg, mask=jnp.asarray(mask))

    ref_lab = oracle.quadtree_labels(img, thresh=0.5, max_size=8, mask=mask)
    ours_lab = labels_from_pixel_node(graph.pixel_node, shape, cfg.n_max)
    bij = oracle.partition_bijection(ref_lab, ours_lab)
    assert bij is not None

    ref_pairs = oracle.adjacency_pairs(ref_lab)
    ref_pairs_mapped = {(bij[a], bij[b]) for a, b in ref_pairs}

    ev = np.asarray(graph.edge_valid)
    ours_pairs = set(
        zip(np.asarray(graph.edge_src)[ev].tolist(),
            np.asarray(graph.edge_dst)[ev].tolist())
    )
    assert ours_pairs == ref_pairs_mapped
    assert int(graph.n_edges) == len(ref_pairs_mapped)
    # symmetric
    assert all((b, a) in ours_pairs for a, b in ours_pairs)


def test_edge_attr_values():
    """Bearing/distance follow ref graph_functions.py:358-370."""
    rng = np.random.default_rng(3)
    shape = (8, 8)
    img = rng.random(shape).astype(np.float32)
    cfg = GraphConfig(image_shape=shape, max_grid_size=4, thresh=0.6,
                      resolution=0.25)
    x = add_positional_encoding(jnp.asarray(img)[None, :, :, None])
    graph, data = image_to_graph(x, cfg)

    xy = np.asarray(graph.node_xy)
    ev = np.asarray(graph.edge_valid)
    src = np.asarray(graph.edge_src)[ev]
    dst = np.asarray(graph.edge_dst)[ev]
    attr = np.asarray(graph.edge_attr)[ev]

    ddx = xy[src, 0] - xy[dst, 0]
    ddy = xy[src, 1] - xy[dst, 1]
    np.testing.assert_allclose(attr[:, 1], np.hypot(ddx, ddy), rtol=1e-5, atol=1e-6)
    bearing = np.mod(np.arctan2(ddx, ddy), 2 * np.pi) / (2 * np.pi)
    np.testing.assert_allclose(attr[:, 0], bearing, rtol=1e-5, atol=1e-6)
    # invalid lanes are zero
    assert np.all(np.asarray(graph.edge_attr)[~ev] == 0)


def test_flatten_means_and_unflatten():
    rng = np.random.default_rng(4)
    shape = (16, 16)
    img = rng.random((3, *shape, 2)).astype(np.float32)
    crit = img[..., 0].max(0)
    cfg = GraphConfig(image_shape=shape, max_grid_size=8, thresh=0.5)
    mask = rng.random(shape) < 0.1

    x = add_positional_encoding(jnp.asarray(img))
    graph, data = image_to_graph(x, cfg, mask=jnp.asarray(mask))

    ref_lab = oracle.quadtree_labels(crit, thresh=0.5, max_size=8, mask=mask)
    ours_lab = labels_from_pixel_node(graph.pixel_node, shape, cfg.n_max)
    bij = oracle.partition_bijection(ref_lab, ours_lab)
    assert bij is not None

    # node means match oracle for every timestep/channel
    ref_means = oracle.node_means(np.asarray(x)[0], ours_lab)
    d0 = np.asarray(data)[0]
    for lab, mean in ref_means.items():
        np.testing.assert_allclose(d0[lab, :-1], mean, rtol=1e-5, atol=1e-6)

    # cell-size channel = counts / (max_grid_size/2)^2 (ref :665)
    counts = np.asarray(graph.counts)
    nv = np.asarray(graph.node_valid)
    np.testing.assert_allclose(
        d0[nv, -1], counts[nv] / (8 / 2) ** 2, rtol=1e-6)

    # unflatten∘flatten idempotent on node-constant images
    node_const = unflatten(data[0], graph, shape, fill=0.0)
    again = flatten(node_const[None], graph)[0]
    np.testing.assert_allclose(np.asarray(again), np.asarray(data[0]),
                               rtol=1e-5, atol=1e-6)


def test_pixelwise_matches_general_neg_inf():
    rng = np.random.default_rng(5)
    shape = (8, 12)
    img = rng.random((2, *shape, 1)).astype(np.float32)
    mask = rng.random(shape) < 0.2
    x = add_positional_encoding(jnp.asarray(img))

    cfg = GraphConfig(image_shape=shape, max_grid_size=4, thresh=float("-inf"))
    graph, data = image_to_graph(x, cfg, mask=jnp.asarray(mask))

    # raster ordering of unmasked pixels (ref graph_functions.py:511)
    expect = np.where(mask.reshape(-1), cfg.n_max,
                      np.cumsum(~mask.reshape(-1)) - 1)
    np.testing.assert_array_equal(np.asarray(graph.pixel_node), expect)

    # node features = pixel values; cell size channel = resolution**2
    nv = np.asarray(graph.node_valid)
    vals = np.asarray(x[0]).reshape(-1, 3)[~mask.reshape(-1)]
    np.testing.assert_allclose(np.asarray(data)[0][nv][:, :-1], vals, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(data)[0][nv][:, -1], 0.25**2, rtol=1e-6)

    # edges: 4-neighbour pairs among unmasked pixels, no dedup needed
    lab = labels_from_pixel_node(graph.pixel_node, shape, cfg.n_max)
    ref_pairs = oracle.adjacency_pairs(lab)
    ev = np.asarray(graph.edge_valid)
    ours_pairs = set(zip(np.asarray(graph.edge_src)[ev].tolist(),
                         np.asarray(graph.edge_dst)[ev].tolist()))
    assert ours_pairs == ref_pairs


def test_static_homogeneous_graph():
    shape = (16, 16)
    mask = np.zeros(shape, bool)
    mask[:8, :8] = True  # one quadrant fully masked
    cfg = GraphConfig(image_shape=shape, max_grid_size=4)
    g = create_static_homogeneous_graph(cfg, jnp.asarray(mask))

    n = int(g.n_nodes)
    assert n == 12  # 16 uniform 4x4 cells minus 4 fully-masked
    nv = np.asarray(g.node_valid)
    assert nv.sum() == n
    # counts keep masked pixels of partially masked cells (none here => all 16)
    np.testing.assert_allclose(np.asarray(g.counts)[nv], 16.0)
    ev = np.asarray(g.edge_valid)
    src = np.asarray(g.edge_src)[ev]
    dst = np.asarray(g.edge_dst)[ev]
    assert src.max() < n and dst.max() < n
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_image_to_graph_jits_and_differentiates():
    """The whole build must be traceable and flatten differentiable."""
    shape = (16, 16)
    cfg = GraphConfig(image_shape=shape, max_grid_size=8, thresh=0.5)
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((2, *shape, 1)).astype(np.float32))

    @jax.jit
    def build(x):
        x = add_positional_encoding(x)
        graph, data = image_to_graph(x, cfg)
        return graph, data

    graph, data = build(img)
    assert data.shape == (2, cfg.n_max, 4)

    def loss(x):
        x = add_positional_encoding(x)
        g, d = image_to_graph(x, cfg)
        return jnp.sum(d[..., 0] ** 2)

    grad = jax.grad(loss)(img)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).sum() > 0


def test_corner_adjacency_parity():
    """8-neighbour mode (ref graph_functions.py:319-327)."""
    rng = np.random.default_rng(9)
    shape = (12, 12)
    img = rng.random(shape).astype(np.float32)
    cfg = GraphConfig(image_shape=shape, max_grid_size=4, thresh=0.5,
                      edges_at_corners=True)
    x = add_positional_encoding(jnp.asarray(img)[None, :, :, None])
    graph, _ = image_to_graph(x, cfg)

    ref_lab = oracle.quadtree_labels(img, thresh=0.5, max_size=4)
    ours_lab = labels_from_pixel_node(graph.pixel_node, shape, cfg.n_max)
    bij = oracle.partition_bijection(ref_lab, ours_lab)
    assert bij is not None
    ref_pairs = {(bij[a], bij[b])
                 for a, b in oracle.adjacency_pairs(ref_lab, corners=True)}
    ev = np.asarray(graph.edge_valid)
    ours = set(zip(np.asarray(graph.edge_src)[ev].tolist(),
                   np.asarray(graph.edge_dst)[ev].tolist()))
    assert ours == ref_pairs

"""Mesh design from climatological variance maps.

Capability parity with the reference's ``notebooks/create_mesh.ipynb``:
build seasonal variance maps of a field, decompose them into candidate
meshes at different thresholds/base sizes, and report reconstructions and
node counts for choosing a production static mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.state import unflatten
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def seasonal_variance(
    values: np.ndarray,
    times: np.ndarray,
    month: int,
    halo: int = 1,
) -> np.ndarray:
    """Per-pixel variance over month ± halo months across all years
    (ref create_mesh.ipynb cells 2-3)."""
    times = np.asarray(times, dtype="datetime64[M]")
    months = (times.astype(int) % 12) + 1
    wanted = {((month - 1 + d) % 12) + 1 for d in range(-halo, halo + 1)}
    sel = np.isin(months, list(wanted))
    return np.nan_to_num(np.var(np.asarray(values)[sel], axis=0))


def design_mesh(
    varmap: np.ndarray,
    mask: Optional[np.ndarray],
    thresh: float,
    max_grid_size: int = 4,
    resolution: float = 0.25,
):
    """Decompose a variance map into a mesh; returns (graph, reconstruction
    (rows, cols), n_nodes) for visual/quantitative comparison
    (ref create_mesh.ipynb cells 3-5, 9-10)."""
    shape = varmap.shape
    cfg = GraphConfig(
        image_shape=shape, max_grid_size=max_grid_size, thresh=thresh,
        resolution=resolution,
    )
    arr = add_positional_encoding(jnp.asarray(varmap, jnp.float32)[None, :, :, None])
    graph, data = image_to_graph(
        arr, cfg, mask=None if mask is None else jnp.asarray(mask)
    )
    recon = np.asarray(unflatten(data[0, :, :1], graph, shape))[..., 0]
    return graph, recon, int(graph.n_nodes)


def sweep_meshes(
    varmap: np.ndarray,
    mask: Optional[np.ndarray],
    thresholds: Sequence[float],
    max_grid_size: int = 4,
) -> dict:
    """threshold → node count table for mesh budget planning."""
    return {
        float(t): design_mesh(varmap, mask, t, max_grid_size)[2]
        for t in thresholds
    }

"""Ports (breakup/freezeup, routing) and mesh-design analysis tools
(parity: ref notebooks/ports.ipynb, notebooks/create_mesh.ipynb)."""

import numpy as np

from quadtree_mpnnlstm_tpu.eval.mesh_design import (
    design_mesh,
    seasonal_variance,
    sweep_meshes,
)
from quadtree_mpnnlstm_tpu.eval.ports import (
    astar_path,
    breakup_freezeup_dates,
    ice_proportion,
    route_open,
)


def synthetic_sic(years=(2015, 2016), shape=(24, 24)):
    times = np.arange(
        np.datetime64(f"{years[0]}-01-01"),
        np.datetime64(f"{years[-1] + 1}-01-01"),
        np.timedelta64(1, "D"),
    )
    doy = (times - times.astype("datetime64[Y]")).astype(int)
    # ice-covered in winter, open ~Jun 20 (doy 171) until ~Nov 1 (doy 305)
    open_water = (doy > 170) & (doy < 305)
    sic = np.where(open_water[:, None, None], 0.02, 0.9)
    sic = np.broadcast_to(sic, (len(times), *shape)).astype(np.float32)
    return sic.copy(), times


def test_ice_proportion_and_dates():
    sic, times = synthetic_sic()
    mask = np.zeros(sic.shape[1:], bool)
    prop = ice_proportion(sic, mask, center=(12, 12), window=5)
    assert prop.max() == 1.0 and prop.min() == 0.0

    dates = breakup_freezeup_dates(prop, times, years=[2015, 2016])
    for year in (2015, 2016):
        b, f = dates[year]["breakup"], dates[year]["freezeup"]
        assert b is not None and f is not None
        assert np.datetime64(f"{year}-06-15") < b < np.datetime64(f"{year}-07-05")
        assert np.datetime64(f"{year}-10-25") < f < np.datetime64(f"{year}-11-10")


def test_astar_routes_around_ice():
    blocked = np.zeros((10, 10), bool)
    blocked[2:9, 5] = True  # wall with a gap at the top
    path = astar_path(blocked, (5, 1), (5, 8), diagonal=False)
    assert path is not None
    assert tuple(path[0]) == (5, 1) and tuple(path[-1]) == (5, 8)
    # path avoids blocked cells and routes around the wall (row < 2)
    assert not blocked[tuple(path.T)].any()
    assert path[:, 0].min() < 2

    # fully walled → no path
    blocked[:, 5] = True
    assert astar_path(blocked, (5, 1), (5, 8), diagonal=False) is None


def test_route_open_on_sic():
    sic = np.zeros((10, 10), np.float32)
    sic[:, 4] = 0.8  # ice band
    sic[0, 4] = 0.0  # except one opening
    mask = np.zeros((10, 10), bool)
    path = route_open(sic, mask, (5, 0), (5, 9))
    assert path is not None and path[:, 0].min() == 0


def test_seasonal_variance_and_mesh_design():
    rng = np.random.default_rng(0)
    times = np.arange(
        np.datetime64("2015-01-01"), np.datetime64("2017-01-01"),
        np.timedelta64(1, "D"),
    )
    shape = (16, 16)
    vals = rng.random((len(times), *shape)).astype(np.float32)
    vals[:, :8, :] *= 0.05  # low-variance half
    var = seasonal_variance(vals, times, month=6, halo=1)
    assert var.shape == shape
    assert var[:8].mean() < var[8:].mean()

    graph, recon, n = design_mesh(var, None, thresh=0.02, max_grid_size=8)
    assert recon.shape == shape and n > 0
    # low-variance half coarsens: fewer nodes than pixels
    assert n < shape[0] * shape[1]

    table = sweep_meshes(var, None, thresholds=[1e-6, 0.02, 1e9],
                         max_grid_size=8)
    assert table[1e-6] >= table[0.02] >= table[1e9]


def test_trace_summary(tmp_path):
    """eval/trace_summary aggregates per-op durations from a jax.profiler
    xplane capture (profiling subsystem; the reference only has cProfile,
    ref ice_profile.py:141-159)."""
    import jax
    import jax.numpy as jnp

    from quadtree_mpnnlstm_tpu.eval.trace_summary import summarize_trace

    @jax.jit
    def f(x):
        return (x @ x.T).sum()

    x = jnp.ones((128, 128))
    float(f(x))  # compile outside the trace
    jax.profiler.start_trace(str(tmp_path))
    float(f(x))
    jax.profiler.stop_trace()

    rows = summarize_trace(str(tmp_path), top=10)
    assert rows and all(r.total_ms >= 0 for r in rows)
    assert all(isinstance(r.count, int) and r.count >= 1 for r in rows)

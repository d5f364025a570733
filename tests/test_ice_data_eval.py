"""IceDataset windowing & eval-suite tests (ref ice_dataset.py, ice_results.py)."""

import datetime

import numpy as np
import pytest

from quadtree_mpnnlstm_tpu.data.ice_dataset import (
    GriddedDataset,
    IceDataset,
    climatology_from_dataset,
)
from quadtree_mpnnlstm_tpu.eval.results import (
    create_heatmap,
    persistence_heatmap,
    climatology_heatmap,
    masked_RMSE,
    masked_accuracy,
    full_report,
)


def synthetic_ds(years=(2007, 2008), shape=(6, 8), seed=0):
    rng = np.random.default_rng(seed)
    times = np.arange(
        np.datetime64(f"{years[0]}-01-01"),
        np.datetime64(f"{years[-1] + 1}-01-01"),
        np.timedelta64(1, "D"),
    ).astype("datetime64[ns]")
    t = len(times)
    base = rng.random((t, *shape)).astype(np.float32)
    return GriddedDataset(
        {
            "siconc": base,
            "t2m": base * 10 + 250,
        },
        times,
    )


def test_ice_dataset_windowing():
    ds = synthetic_ds()
    t_in, t_out = 3, 5
    data = IceDataset(
        ds, [2007], month=6, input_timesteps=t_in, output_timesteps=t_out,
        x_vars=["siconc", "t2m", "doy"], y_vars=["siconc"],
    )
    # June window: [Jun1 - t_in, Jul1 + t_out - 1] inclusive = 38 days;
    # the reference's strict while-loop yields T - t_in - t_out samples
    expected_days = t_in + 30 + t_out  # May 29 .. Jul 5
    n_expected = expected_days - t_out - t_in
    assert data.x.shape == (n_expected, t_in, 6, 8, 3)
    assert data.y.shape == (n_expected, t_out, 6, 8, 1)
    # launch dates start at June 1 (the first day after the input buffer)
    first = data.launch_dates[0]
    assert np.datetime64(int(first), "ns").astype("datetime64[D]") == np.datetime64(
        "2007-06-01"
    )
    # normalised into [0, 1]
    assert data.x.min() >= 0 and data.x.max() <= 1.0 + 1e-6


def test_ice_dataset_train_widens_and_binary():
    ds = synthetic_ds()
    t_in, t_out = 2, 2
    train = IceDataset(ds, [2007], 6, t_in, t_out, ["siconc"], ["siconc"],
                       train=True)
    test = IceDataset(ds, [2007], 6, t_in, t_out, ["siconc"], ["siconc"])
    assert len(train) > len(test) * 2.5  # ±1 month widening (ref :29-35)

    binary = IceDataset(ds, [2007], 6, t_in, t_out, ["siconc"], ["siconc"],
                        y_binary_thresh=0.5)
    assert set(np.unique(binary.y)) <= {0.0, 1.0}


def test_climatology_shape_and_values():
    ds = synthetic_ds()
    clim = climatology_from_dataset(ds, "siconc")
    assert clim.shape == (366, 6, 8)
    assert np.isfinite(clim).all()
    # day 0 = mean of both Jan 1sts
    jan1s = ds.variables["siconc"][[0, 365]]
    np.testing.assert_allclose(clim[0], jan1s.mean(0), rtol=1e-5)


def test_metric_closures():
    mask_valid = np.ones((4, 4))
    y = np.zeros((4, 4))
    p = np.full((4, 4), 0.5)
    assert masked_RMSE(mask_valid)(y, p) == pytest.approx(0.5)
    assert masked_accuracy(mask_valid)(y > 0.5, p > 0.5) == 1.0


def test_heatmaps_and_report(tmp_path):
    rng = np.random.default_rng(0)
    n, t, r, c = 6, 4, 6, 8
    y_true = rng.random((n, t, r, c, 1)).astype(np.float32)
    y_hat = y_true + rng.normal(0, 0.01, y_true.shape).astype(np.float32)
    mask = np.zeros((r, c), bool)
    # launch dates in two different months
    lds = [
        np.datetime64(f"2007-0{m}-15", "ns").astype(np.int64)
        for m in (3, 3, 3, 7, 7, 7)
    ]
    heat = create_heatmap(y_hat, y_true, lds, mask)
    assert heat.shape == (12, t)
    filled = ~np.isnan(heat)
    assert filled[2].all() and filled[6].all()  # March & July rows
    assert np.nanmax(heat) < 0.05  # predictions are near-perfect

    pers = persistence_heatmap(y_true, lds, mask)
    assert np.nanmean(pers) > np.nanmean(heat)  # persistence is worse

    clim = np.tile(y_true[:, 0, :, :, 0].mean(0), (366, 1, 1))
    ch = climatology_heatmap(y_true, lds, clim, mask)
    assert ch.shape == (12, t)

    out = full_report(y_hat, y_true, lds, mask, clim, str(tmp_path))
    assert (tmp_path / "heatmap.csv").exists()
    assert np.allclose(out[filled], heat[filled])


def test_results_cli_merges_months(tmp_path):
    """VERDICT round-2 item 5: one command turns per-month cli.ice_exp
    outputs into the merged heatmap/CSV report (ref ice_results.py:123-143)."""
    import json

    from quadtree_mpnnlstm_tpu.eval.results import main as results_main

    rng = np.random.default_rng(1)
    n, t, r, c = 3, 4, 6, 8
    for m in (3, 7):  # two synthetic "SLURM-array" month outputs
        y_true = rng.random((n, t, r, c, 1)).astype(np.float32)
        y_hat = y_true + rng.normal(0, 0.02, y_true.shape).astype(np.float32)
        lds = np.asarray(
            [
                np.datetime64(f"2007-0{m}-{10 + i:02d}", "ns").astype(np.int64)
                for i in range(n)
            ]
        )
        np.savez(
            tmp_path / f"valpredictions_M{m}_Y2007_Y2012_I4O{t}.npz",
            y_hat=y_hat, y_true=y_true, launch_dates=lds,
        )
        with open(tmp_path / f"loss_M{m}_Y2007.json", "w") as f:
            json.dump({"train_loss": [1.0, 0.5], "test_loss": [1.1, 0.6]}, f)

    out_dir = results_main(["--results-dir", str(tmp_path)])
    heat = np.loadtxt(f"{out_dir}/heatmap.csv", delimiter=",")
    assert heat.shape == (12, t)
    filled = ~np.isnan(heat)
    assert filled[2].all() and filled[6].all()  # both months merged
    assert (~filled[[0, 1, 3, 4, 5, 7, 8, 9, 10, 11]]).all()


def test_prefetch_to_device_equivalence():
    """prefetch_to_device yields the same batches in the same order, with
    x/y on device and launch dates left as host numpy."""
    import jax
    import numpy as np

    from quadtree_mpnnlstm_tpu.data import (
        ArrayDataset,
        DataLoader,
        prefetch_to_device,
    )

    rng = np.random.default_rng(0)
    ds = ArrayDataset(
        rng.random((10, 2, 4, 4, 1)).astype(np.float32),
        rng.random((10, 3, 4, 4, 1)).astype(np.float32),
        np.arange(10),
    )
    plain = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3))
    pref = list(
        prefetch_to_device(DataLoader(ds, batch_size=4, shuffle=True, seed=3))
    )
    assert len(plain) == len(pref)
    for (x0, y0, l0), (x1, y1, l1) in zip(plain, pref):
        assert isinstance(x1, jax.Array) and isinstance(y1, jax.Array)
        assert isinstance(l1, np.ndarray)
        np.testing.assert_array_equal(x0, np.asarray(x1))
        np.testing.assert_array_equal(y0, np.asarray(y1))
        np.testing.assert_array_equal(l0, l1)


# ---------------------------------------------------------------------------
# Real-data seam (VERDICT r3 #8): the on-disk netCDF4 format → GriddedDataset
# → IceDataset → train step, without xarray (data/netcdf_io.py over h5py).
# Fixture mimics the combine ETL's per-year files (ref ice_exp.py:115-125,
# data/combine_era5_glorys.py:24-54).
# ---------------------------------------------------------------------------

def _write_year_nc(path, year, shape=(12, 16), seed=0):
    import h5py

    rng = np.random.default_rng(seed + year)
    times = np.arange(
        np.datetime64(f"{year}-01-01"), np.datetime64(f"{year + 1}-01-01"),
        np.timedelta64(1, "D"),
    )
    t = len(times)
    epoch = np.datetime64("1900-01-01")
    days = (times - epoch) / np.timedelta64(1, "D")
    land = np.zeros(shape, bool)
    land[:2] = True  # coastal band
    with h5py.File(path, "w") as f:
        tv = f.create_dataset("time", data=days.astype(np.float64))
        tv.attrs["units"] = np.bytes_("days since 1900-01-01")
        tv.attrs["calendar"] = np.bytes_("proleptic_gregorian")
        f.create_dataset("latitude", data=np.linspace(55, 65, shape[0]))
        f.create_dataset("longitude", data=np.linspace(-85, -75, shape[1]))
        for name, scale in [("siconc", 1.0), ("t2m", 270.0), ("u10", 5.0),
                            ("v10", 5.0), ("sshf", 50.0)]:
            arr = rng.random((t, *shape)).astype(np.float32) * scale
            arr[:, land] = np.nan
            f.create_dataset(name, data=arr)
    return times


def test_netcdf_roundtrip_to_gridded(tmp_path):
    from quadtree_mpnnlstm_tpu.cli.ice_exp import load_real_dataset

    _write_year_nc(tmp_path / "era5_glorys_2007.nc", 2007)
    _write_year_nc(tmp_path / "era5_glorys_2008.nc", 2008)
    ds, mask = load_real_dataset(str(tmp_path / "era5_glorys_*.nc"))
    assert sorted(ds.data_vars) == ["siconc", "sshf", "t2m", "u10", "v10"]
    assert ds.image_shape == (12, 16)
    assert len(ds.times) == 731  # 2007 + leap 2008
    assert ds.times[0] == np.datetime64("2007-01-01")
    assert ds.times[-1] == np.datetime64("2008-12-31")
    assert (np.diff(ds.times) == np.timedelta64(1, "D")).all()
    assert mask.shape == (12, 16) and mask[:2].all() and not mask[2:].any()
    assert np.isnan(ds.variables["siconc"][:, mask]).all()


def test_netcdf_packed_variable_decodes(tmp_path):
    """CF scale_factor/add_offset packing (what ERA5 downloads actually
    ship) decodes to physical units, with _FillValue masked on the PACKED
    values (CF §8.1) before unpacking."""
    import h5py

    from quadtree_mpnnlstm_tpu.data.netcdf_io import read_netcdf

    path = tmp_path / "packed.nc"
    t, shape = 4, (3, 5)
    phys = np.linspace(250.0, 300.0, t * shape[0] * shape[1]).reshape(
        t, *shape
    ).astype(np.float32)
    scale, offset = 0.001, 275.0
    packed = np.round((phys - offset) / scale).astype(np.int16)
    packed[0, 0, 0] = -32767  # fill
    with h5py.File(path, "w") as f:
        tv = f.create_dataset("time", data=np.arange(t, dtype=np.float64))
        tv.attrs["units"] = np.bytes_("days since 2000-01-01")
        d = f.create_dataset("t2m", data=packed)
        d.attrs["scale_factor"] = np.float64(scale)
        d.attrs["add_offset"] = np.float64(offset)
        d.attrs["_FillValue"] = np.int16(-32767)
    variables, times = read_netcdf(path)
    arr = variables["t2m"]
    assert np.isnan(arr[0, 0, 0])
    got = arr[np.isfinite(arr)]
    want = phys.ravel()[1:]
    np.testing.assert_allclose(got, want, atol=scale)
    assert times[0] == np.datetime64("2000-01-01")


@pytest.mark.slow
def test_netcdf_to_train_step(tmp_path):
    """File → IceDataset window slicing → one jitted train step."""
    import jax

    from quadtree_mpnnlstm_tpu.cli.ice_exp import load_real_dataset
    from quadtree_mpnnlstm_tpu.data.ice_dataset import IceDataset
    from quadtree_mpnnlstm_tpu.data.loader import DataLoader
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    _write_year_nc(tmp_path / "y2007.nc", 2007)
    ds, mask = load_real_dataset(str(tmp_path / "y2007.nc"))
    data = IceDataset(ds, [2007], 6, 2, 2,
                      ["siconc", "t2m"], ["siconc"], train=True)
    loader = DataLoader(data, batch_size=2, shuffle=True, seed=0)
    model = NextFramePredictorS2S(
        image_shape=ds.image_shape,
        thresh=float("-inf"),
        decompose=False,
        input_features=2,
        input_timesteps=2,
        output_timesteps=2,
        model_kwargs=dict(hidden_size=4, n_layers=1, n_conv_layers=1,
                          convolution_type="GCNConv"),
        graph_kwargs=dict(aggregation="grid"),
    )
    model.train(loader, loader, lr=0.01, n_epochs=1, mask=mask)
    assert np.isfinite(model.loss["train_loss"]).all()


def test_from_xarray_duck_type():
    """GriddedDataset.from_xarray consumes the xarray Dataset protocol
    (ref ice_exp.py:115-125) — verified with a duck-typed stand-in since
    xarray isn't installed here."""
    from quadtree_mpnnlstm_tpu.data.ice_dataset import GriddedDataset

    class _Arr:
        def __init__(self, v):
            self.values = v

    class _FakeXarray:
        def __init__(self, variables, times):
            self.data_vars = dict.fromkeys(variables)
            self._variables = variables
            self.time = _Arr(times)

        def __getitem__(self, k):
            return _Arr(self._variables[k])

    times = np.arange(
        np.datetime64("2007-01-01"), np.datetime64("2007-01-11"),
        np.timedelta64(1, "D"),
    )
    fields = {"siconc": np.random.default_rng(0).random((10, 4, 4))}
    ds = GriddedDataset.from_xarray(_FakeXarray(fields, times))
    assert ds.data_vars == ["siconc"]
    assert ds.image_shape == (4, 4)
    np.testing.assert_array_equal(
        ds.times, times.astype("datetime64[ns]")
    )

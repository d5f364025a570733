"""Hudson-Bay sea-ice experiment driver.

Parity target: ref ice_exp.py — ``python -m quadtree_mpnnlstm_tpu.cli.ice_exp
-m <month> -e <exp>`` with the same ten numbered experiment configs
(ref :64-87), multires curriculum (coarse 5 epochs → full-res 10 epochs,
ref :91-112, :185-206), preset static meshes (ref :127-130), day-of-year
climatology (ref :141-142), and netCDF/npz prediction dumps (ref :209-241).

Real data needs xarray+netCDF; without them (this image) pass ``--synthetic``
to exercise the identical pipeline on a generated dataset.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from quadtree_mpnnlstm_tpu.data.ice_dataset import (
    GriddedDataset,
    IceDataset,
    climatology_from_dataset,
)
from quadtree_mpnnlstm_tpu.data.loader import DataLoader
from quadtree_mpnnlstm_tpu.graph.static import (
    create_static_heterogeneous_graph,
    create_static_homogeneous_graph,
)
from quadtree_mpnnlstm_tpu.config import GraphConfig
from quadtree_mpnnlstm_tpu.train.predictor import NextFramePredictorS2S
from quadtree_mpnnlstm_tpu.utils.dates import int_to_datetime

NEG_INF = float("-inf")


def dist_from_05(arr):
    """Split-criterion transform (ref ice_exp.py:149-150)."""
    return abs(abs(arr - 0.5) - 0.5)


def experiment_config(exp: int):
    """The ten numbered configs (ref ice_exp.py:48-87)."""
    cfg = dict(
        convolution_type="TransformerConv",
        lr=0.0001,
        multires_training=False,
        truncated_backprop=0,
        input_timesteps=10,
        preset_mesh=False,
    )
    if exp == 1:
        cfg["convolution_type"] = "GCNConv"
    elif exp == 2:
        cfg["lr"] = 0.001
    elif exp == 3:
        cfg["multires_training"] = True
    elif exp == 4:
        cfg["lr"] = 0.0001
    elif exp == 5:
        cfg["truncated_backprop"] = 45
    elif exp == 6:
        cfg["truncated_backprop"] = 30
    elif exp == 7:
        cfg["lr"] = 0.001
        cfg["input_timesteps"] = 30
    elif exp == 8:
        cfg["lr"] = 0.001
        cfg["input_timesteps"] = 90
    elif exp == 9:
        cfg["multires_training"] = True
        cfg["preset_mesh"] = "heterogeneous"
    elif exp == 10:
        cfg["multires_training"] = True
        cfg["preset_mesh"] = "homogeneous"
    return cfg


def synthetic_hir(shape):
    """Synthetic shipping corridor: a diagonal band across the grid (stands
    in for the ref's primary_route_mask.nc, ref ice_exp.py:122)."""
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    diag = yy / shape[0] - xx / shape[1]
    return np.abs(diag) < 0.08


def load_hir(path: str, image_shape=None):
    """Load the shipping-corridor high-interest region (ref ice_exp.py:122).

    Returns a bool array (NaN → False, nonzero → True) or None with a
    warning when the file / xarray is unavailable — or when its shape does
    not match ``image_shape`` (a mismatch would otherwise surface only as
    an opaque broadcast error deep inside the jitted graph build).
    """
    try:
        import xarray as xr

        band = xr.open_dataset(path)["band_data"].values
        hir = np.nan_to_num(np.squeeze(band)) > 0
        if image_shape is not None and hir.shape != tuple(image_shape):
            print(
                f"high-interest region shape {hir.shape} != dataset image "
                f"shape {tuple(image_shape)}; training without it"
            )
            return None
        return hir
    except (ImportError, FileNotFoundError, OSError, KeyError) as e:
        print(f"high-interest region unavailable ({e}); training without it")
        return None


def save_mesh_png(model, x, hir, path):
    """Render the quadtree mesh with the HIR active (thresh=+inf splits only
    at mask/HIR boundaries, so corridor densification is visible)."""
    out = model.test_threshold(
        x, float("inf"), high_interest_region=hir, contours=True
    )
    fig = out[0]
    if hasattr(fig, "savefig"):
        fig.savefig(path, dpi=100)
        return path
    return None


def load_real_dataset(data_glob: str):
    """Combined ERA5+GLORYS year files → (GriddedDataset, land mask).

    Prefers xarray (ref ice_exp.py:115-125 reads ``open_mfdataset``
    output); without it, netCDF4 files are read directly through h5py
    (data/netcdf_io.py) — same layout, no extra dependencies.
    """
    import glob

    paths = glob.glob(data_glob)
    try:
        import xarray as xr

        ds = xr.open_mfdataset(paths)
        gridded = GriddedDataset.from_xarray(ds)
    except ImportError:
        from quadtree_mpnnlstm_tpu.data.netcdf_io import read_netcdf_many

        gridded = read_netcdf_many(paths)
    mask = np.isnan(gridded.variables["siconc"][0])
    return gridded, mask


def synthetic_dataset(shape=(32, 32), years=(2007, 2018), seed=21):
    """Season-driven synthetic ice field exercising the full pipeline."""
    rng = np.random.default_rng(seed)
    times = np.arange(
        np.datetime64(f"{years[0]}-01-01"),
        np.datetime64(f"{years[-1]}-01-01"),
        np.timedelta64(1, "D"),
    ).astype("datetime64[ns]")
    t = len(times)
    doy = (
        (times - times.astype("datetime64[Y]").astype(times.dtype))
        / np.timedelta64(1, "D")
    ).astype(np.float32)
    season = 0.5 + 0.5 * np.cos(2 * np.pi * (doy - 30) / 365.25)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    lat_grad = yy / shape[0]
    base = season[:, None, None] * (0.3 + 0.7 * lat_grad)[None]
    fields = {
        "siconc": np.clip(
            base + rng.normal(0, 0.05, (t, *shape)), 0, 1
        ).astype(np.float32),
        "t2m": (270 - 30 * base + rng.normal(0, 2, (t, *shape))).astype(
            np.float32
        ),
        "v10": rng.normal(0, 5, (t, *shape)).astype(np.float32),
        "u10": rng.normal(0, 5, (t, *shape)).astype(np.float32),
        "sshf": rng.normal(0, 50, (t, *shape)).astype(np.float32),
    }
    mask = (lat_grad < 0.1)  # permanent open-water band
    for v in fields.values():
        v[:, mask] = np.nan
    return GriddedDataset(fields, times), mask


def save_predictions(path, y_hat, y_true, launch_dates, output_timesteps):
    """netCDF when xarray is available, else npz (ref ice_exp.py:229-241)."""
    dates = [int_to_datetime(int(t)) for t in launch_dates]
    try:
        import xarray as xr

        ds = xr.Dataset(
            data_vars=dict(
                y_hat=(
                    ["launch_date", "timestep", "latitude", "longitude"],
                    y_hat.squeeze(-1),
                ),
                y_true=(
                    ["launch_date", "timestep", "latitude", "longitude"],
                    y_true.squeeze(-1),
                ),
            ),
            coords=dict(
                launch_date=dates,
                timestep=np.arange(1, output_timesteps + 1),
            ),
        )
        ds.to_netcdf(path + ".nc")
        return path + ".nc"
    except ImportError:
        np.savez(
            path + ".npz",
            y_hat=y_hat,
            y_true=y_true,
            launch_dates=np.asarray(launch_dates),
        )
        return path + ".npz"


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--month", type=int, required=True)
    parser.add_argument("-e", "--exp", type=int, default=0)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--data-glob", default="data/hb_era5_glorys_nc/*.nc")
    parser.add_argument(
        "--hir-path",
        default="data/shipping_corridors/primary_route_mask.nc",
        help="shipping-corridor mask netCDF (ref ice_exp.py:122)",
    )
    parser.add_argument("--no-hir", action="store_true",
                        help="train without the high-interest region")
    parser.add_argument("--mesh-png", action="store_true",
                        help="save a quadtree-mesh png showing HIR "
                        "densification to the results dir")
    parser.add_argument("--epochs", type=int, default=15)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--shape", type=int, nargs=2, default=(32, 32),
                        metavar=("ROWS", "COLS"),
                        help="synthetic grid shape; the real Hudson-Bay "
                        "flagship shape is 224 304 (ref ice_exp.py)")
    parser.add_argument("--synthetic-years", type=int, default=11,
                        help="years of synthetic daily data (memory: "
                        "~shape*365*5vars*4B per year)")
    parser.add_argument("--max-loss", type=float, default=4.0,
                        help="divergence-guard threshold (ref literal 4; "
                        "raise for short smoke runs of long rollouts)")
    parser.add_argument("--t-out", type=int, default=None,
                        help="decoder rollout length (default: 90 real "
                        "data / 10 synthetic; the flagship uses 90)")
    parser.add_argument("--grid-attn", default="xla",
                        choices=["xla", "pallas"],
                        help="pixelwise grid backend: 'pallas' routes "
                        "attention convs through the fused stencil kernel "
                        "(ops/pallas_grid_attn.py; attention-map dumps "
                        "need 'xla')")
    parser.add_argument("--dp-devices", type=int, default=1,
                        help="data-parallel devices: the global batch is "
                        "sharded over a device mesh with pmean gradient "
                        "all-reduce over ICI (parallel/dp.py); requires "
                        "batch-size divisible by this")
    parser.add_argument("--shared-mesh", action="store_true",
                        help="batched training rides ONE mesh per step in "
                        "the batch-middle node layout instead of vmapped "
                        "per-sample meshes (TrainConfig.shared_mesh; only "
                        "meaningful with --batch-size > 1)")
    parser.add_argument("--results-dir", default=None)
    args = parser.parse_args(argv)

    start = time.time()
    month, exp = args.month, args.exp
    cfg = experiment_config(exp)

    training_years = range(2007, 2013)
    x_vars = ["siconc", "t2m", "v10", "u10", "sshf"]
    y_vars = ["siconc"]
    input_timesteps = cfg["input_timesteps"]
    output_timesteps = args.t_out or (90 if not args.synthetic else 10)

    if args.synthetic:
        if args.synthetic_years < 2:
            parser.error("--synthetic-years must be >= 2 (one train year "
                         "plus one held-out test year)")
        # training_years below slices [2007, 2013); clamp to generated span
        y1 = 2007 + args.synthetic_years
        ds, mask = synthetic_dataset(
            shape=tuple(args.shape), years=(2007, y1)
        )
        training_years = range(2007, max(2008, min(2013, y1 - 1)))
        hir = None if args.no_hir else synthetic_hir(mask.shape)
    else:
        ds, mask = load_real_dataset(args.data_glob)
        hir = None if args.no_hir else load_hir(args.hir_path, mask.shape)
    image_shape = mask.shape

    data_train = IceDataset(ds, training_years, month, input_timesteps,
                            output_timesteps, x_vars, y_vars, train=True)
    data_test = IceDataset(ds, [training_years[-1] + 1], month,
                           input_timesteps, output_timesteps, x_vars, y_vars)
    last_data_year = int(str(ds.times[-1])[:4])
    val_years = [
        y
        for y in range(training_years[-1] + 2, training_years[-1] + 2 + 4)
        if y <= last_data_year
    ] or [training_years[-1] + 1]
    data_val = IceDataset(
        ds, val_years,
        month, input_timesteps, output_timesteps, x_vars, y_vars,
    )
    loader_train = DataLoader(data_train, args.batch_size, shuffle=True, seed=21)
    loader_test = DataLoader(data_test, args.batch_size, shuffle=True, seed=22)
    loader_val = DataLoader(data_val, args.batch_size, shuffle=False)

    climatology = climatology_from_dataset(ds, "siconc")

    thresh = NEG_INF  # quadtree off in the committed config (ref :145)
    print(f"Threshold is {thresh}")

    graph_structure = None
    if cfg["preset_mesh"]:
        gmesh = GraphConfig(
            image_shape=image_shape, max_grid_size=4, resolution=1 / 12,
            use_edge_attrs=True,
        )
        import jax.numpy as jnp

        if cfg["preset_mesh"] == "heterogeneous":
            graph_structure = create_static_heterogeneous_graph(
                gmesh, mask=jnp.asarray(mask)
            )
        else:
            graph_structure = create_static_homogeneous_graph(
                gmesh, jnp.asarray(mask)
            )

    experiment_name = (
        f"M{month}_Y{training_years[0]}_Y{training_years[-1]}"
        f"_I{input_timesteps}O{output_timesteps}"
    )
    model = NextFramePredictorS2S(
        shared_mesh=args.shared_mesh,
        dp_devices=args.dp_devices,
        image_shape=image_shape,
        thresh=thresh,
        experiment_name=experiment_name,
        input_features=len(x_vars),
        input_timesteps=input_timesteps,
        output_timesteps=output_timesteps,
        transform_func=dist_from_05,
        binary=False,
        use_climatology=True,
        model_kwargs=dict(
            hidden_size=32,
            dropout=0.1,
            n_layers=1,
            n_conv_layers=3,
            rnn_type="LSTM",
            convolution_type=cfg["convolution_type"],
            # per-gate stacks measure faster than gates-as-heads on the
            # dense grid backend (PERF_NOTES round 3)
            fused_gates=bool(cfg["preset_mesh"]),
        ),
        # pixelwise (thresh=-inf, the committed config) rides the dense
        # grid stencil backend — the fast path at the 224×304 flagship
        # scale; preset-mesh experiments keep the edge-list backend
        graph_kwargs=(
            None if cfg["preset_mesh"]
            else dict(aggregation="grid", grid_attn=args.grid_attn)
        ),
    )
    print("Num. parameters:", model.get_n_params())

    # Multires curriculum: 2× coarsened epochs first (ref :91-112, :185-206)
    if cfg["multires_training"]:
        coarse = GriddedDataset(
            {k: v[:, ::2, ::2] for k, v in ds.variables.items()}, ds.times
        )
        mask_half = mask[::2, ::2]
        model_half = NextFramePredictorS2S(
            image_shape=mask_half.shape,
            thresh=thresh,
            experiment_name=experiment_name + "_half",
            input_features=len(x_vars),
            input_timesteps=input_timesteps,
            output_timesteps=output_timesteps,
            transform_func=dist_from_05,
            # The reference trains its coarse phase without climatology
            # (ref :203-208, climatology_half commented out at :107) but
            # reuses ONE model for both phases, which needs one decoder
            # head width; with use_climatology the head takes an extra
            # concat channel, so the half model must match the full model
            # (verified: a False/True mismatch makes the warm-start
            # transplant fail on the head's (32 vs 33)-wide params).
            # Deviation: the coarse phase gets the coarse climatology.
            use_climatology=True,
            model_kwargs=dict(
                hidden_size=32, dropout=0.1, n_layers=1, n_conv_layers=3,
                rnn_type="LSTM", convolution_type=cfg["convolution_type"],
                # must match the full model's fused_gates choice or the
                # warm-start param-tree transplant below fails (fused stacks
                # have a 'gates' tree; per-gate stacks have conv_x/conv_h)
                fused_gates=bool(cfg["preset_mesh"]),
            ),
            graph_kwargs=dict(aggregation="grid"),
        )
        half_train = IceDataset(coarse, training_years, month,
                                input_timesteps, output_timesteps, x_vars,
                                y_vars, train=True)
        half_test = IceDataset(coarse, [training_years[-1] + 1], month,
                               input_timesteps, output_timesteps, x_vars,
                               y_vars)
        model_half.train(
            DataLoader(half_train, args.batch_size, shuffle=True, seed=21),
            DataLoader(half_test, args.batch_size),
            climatology_from_dataset(coarse, "siconc"),
            lr=cfg["lr"], n_epochs=5, mask=mask_half,
            truncated_backprop=cfg["truncated_backprop"],
        )
        # Graph convs are resolution-agnostic: warm-start full-res weights.
        model.params = model_half.params
        epochs = min(args.epochs, 10)
    else:
        epochs = args.epochs

    # Full-res training uses the high-interest region (ref ice_exp.py:203);
    # like the ref, the coarse multires phase trains without it.
    model.train(
        loader_train,
        loader_test,
        climatology,
        lr=cfg["lr"],
        n_epochs=epochs,
        mask=mask,
        high_interest_region=hir,
        truncated_backprop=cfg["truncated_backprop"],
        graph_structure=graph_structure,
        divergence_threshold=args.max_loss,
    )

    results_dir = args.results_dir or f"ice_results_exp{exp}"
    os.makedirs(results_dir, exist_ok=True)
    if args.mesh_png and hir is not None:
        png = save_mesh_png(
            model, data_train.x[0, :1, ..., :1], hir,
            f"{results_dir}/mesh_hir_{experiment_name}.png",
        )
        if png:
            print("mesh png:", png)
    with open(f"{results_dir}/loss_{experiment_name}.json", "w") as f:
        json.dump(model.loss, f)
    model.save(results_dir)

    val_preds = model.predict(
        loader_val, climatology, mask=mask, graph_structure=graph_structure
    )
    out = save_predictions(
        f"{results_dir}/valpredictions_{experiment_name}",
        val_preds, data_val.y, data_val.launch_dates, output_timesteps,
    )
    print(f"Finished model {month} in {(time.time() - start) / 60} minutes")
    print("predictions:", out)


if __name__ == "__main__":
    main()

"""Inference-only driver (parity: ref ice_inf.py:27-135): rebuild the model,
load a checkpoint, predict the validation months, dump predictions."""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from quadtree_mpnnlstm_tpu.cli.ice_exp import (
    NEG_INF,
    dist_from_05,
    load_real_dataset,
    save_predictions,
    synthetic_dataset,
)
from quadtree_mpnnlstm_tpu.data.ice_dataset import (
    IceDataset,
    climatology_from_dataset,
)
from quadtree_mpnnlstm_tpu.data.loader import DataLoader
from quadtree_mpnnlstm_tpu.train.predictor import NextFramePredictorS2S


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--month", type=int, required=True)
    parser.add_argument("--results-dir", required=True)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--data-glob", default="data/hb_era5_glorys_nc/*.nc")
    parser.add_argument("--batch-size", type=int, default=1)
    args = parser.parse_args(argv)

    start = time.time()
    month = args.month
    training_years = range(2007, 2013)
    x_vars = ["siconc", "t2m", "v10", "u10", "sshf"]
    y_vars = ["siconc"]
    input_timesteps = 10
    output_timesteps = 90 if not args.synthetic else 10

    if args.synthetic:
        ds, mask = synthetic_dataset()
    else:
        ds, mask = load_real_dataset(args.data_glob)

    data_val = IceDataset(
        ds, range(training_years[-1] + 2, training_years[-1] + 2 + 4),
        month, input_timesteps, output_timesteps, x_vars, y_vars,
    )
    loader_val = DataLoader(data_val, args.batch_size, shuffle=False)
    climatology = climatology_from_dataset(ds, "siconc")

    experiment_name = (
        f"M{month}_Y{training_years[0]}_Y{training_years[-1]}"
        f"_I{input_timesteps}O{output_timesteps}"
    )
    model = NextFramePredictorS2S(
        image_shape=mask.shape,
        thresh=NEG_INF,
        experiment_name=experiment_name,
        input_features=len(x_vars),
        input_timesteps=input_timesteps,
        output_timesteps=output_timesteps,
        transform_func=dist_from_05,
        use_climatology=True,
        model_kwargs=dict(
            hidden_size=32, dropout=0.1, n_layers=1, n_conv_layers=3,
            rnn_type="LSTM", convolution_type="TransformerConv",
        ),
    )
    model.load(args.results_dir)

    preds = model.predict(loader_val, climatology, mask=mask)
    out = save_predictions(
        os.path.join(args.results_dir, f"valpredictions_{experiment_name}"),
        preds, data_val.y, data_val.launch_dates, output_timesteps,
    )
    print(f"Finished inference {month} in {(time.time() - start) / 60:.2f} min")
    print("predictions:", out)


if __name__ == "__main__":
    main()

"""bf16-vs-f32 converged-quality study at the ICE flagship scale.

Round-3 verdict item: the 64×64 study (baselines/bf16_quality.py) showed
equal converged MSE at 2.1× training speed, but the ice flagship
(224×304, TransformerConv, 10→90 rollout, dense grid-stencil backend —
ref ice_exp.py:54-58,145,153-162) trains in bf16 by default on the
strength of that *different* workload. This twin trains the flagship
configuration on the synthetic ice dataset in BOTH dtypes with identical
data/seeds under a short-epoch budget and records the converged test MSE
side by side (BASELINE.md table).

Run (TPU, ~40-60 min): python baselines/bf16_quality_ice.py
Smoke (CPU): python baselines/bf16_quality_ice.py --shape 32 32 \
    --t-out 10 --epochs 1
Prints one JSON line with both rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def train_and_score(dtype, args):
    from quadtree_mpnnlstm_tpu.cli.ice_exp import (
        dist_from_05,
        synthetic_dataset,
        synthetic_hir,
    )
    from quadtree_mpnnlstm_tpu.data.ice_dataset import (
        IceDataset,
        climatology_from_dataset,
    )
    from quadtree_mpnnlstm_tpu.data.loader import DataLoader
    from quadtree_mpnnlstm_tpu.train.predictor import NextFramePredictorS2S

    shape = tuple(args.shape)
    # 3 synthetic years → train [2007, 2008], held-out test 2009 (the
    # ice_exp --synthetic slicing, cli/ice_exp.py:268-277)
    ds, mask = synthetic_dataset(shape=shape, years=(2007, 2007 + args.years))
    training_years = range(2007, 2007 + args.years - 1)
    x_vars = ["siconc", "t2m", "v10", "u10", "sshf"]
    y_vars = ["siconc"]

    data_train = IceDataset(ds, training_years, args.month, args.t_in,
                            args.t_out, x_vars, y_vars, train=True)
    data_test = IceDataset(ds, [training_years[-1] + 1], args.month,
                           args.t_in, args.t_out, x_vars, y_vars)
    loader_train = DataLoader(data_train, args.batch_size, shuffle=True,
                              seed=21)
    loader_test = DataLoader(data_test, args.batch_size)
    climatology = climatology_from_dataset(ds, "siconc")

    # The committed flagship model (ice_exp experiment_config exp=2 /
    # bench.make_ice_predictor): pixelwise grid backend, TransformerConv,
    # hidden 32, per-gate stacks — only compute_dtype varies.
    model = NextFramePredictorS2S(
        image_shape=shape,
        thresh=float("-inf"),
        experiment_name=f"bf16_quality_ice_{dtype}",
        input_features=len(x_vars),
        input_timesteps=args.t_in,
        output_timesteps=args.t_out,
        transform_func=dist_from_05,
        binary=False,
        use_climatology=True,
        model_kwargs=dict(
            hidden_size=32, dropout=0.1, n_layers=1, n_conv_layers=3,
            rnn_type="LSTM", convolution_type="TransformerConv",
            compute_dtype=dtype, fused_gates=False,
        ),
        graph_kwargs=dict(aggregation="grid"),
        seed=21,
    )

    t0 = time.time()
    model.train(
        loader_train, loader_test, climatology,
        lr=0.01, lr_decay=0.95, n_epochs=args.epochs, mask=mask,
        high_interest_region=synthetic_hir(shape),
        divergence_threshold=100.0,  # short-budget runs trip the ref guard
    )
    train_s = time.time() - t0

    scores = model.score(loader_test, climatology, mask=mask)
    return {
        "dtype": dtype,
        "test_mse": scores["MSE"],
        "test_rmse": scores["RMSE"],
        "final_train_loss": float(model.train_loss[-1]),
        "final_test_loss": float(model.test_loss[-1]),
        "train_s": round(train_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[224, 304])
    ap.add_argument("--years", type=int, default=3)
    ap.add_argument("--month", type=int, default=6)
    ap.add_argument("--t-in", type=int, default=10)
    ap.add_argument("--t-out", type=int, default=90)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=1)
    args = ap.parse_args()

    rows = [train_and_score(d, args) for d in ("float32", "bfloat16")]
    f32, bf16 = rows
    print(json.dumps({
        "config": f"ice flagship {args.shape[0]}x{args.shape[1]}, "
                  f"T{args.t_in}->{args.t_out}, month {args.month}, "
                  f"{args.epochs} epochs",
        "float32": f32,
        "bfloat16": bf16,
        "test_mse_gap": bf16["test_mse"] - f32["test_mse"],
        "speedup": round(f32["train_s"] / max(bf16["train_s"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()

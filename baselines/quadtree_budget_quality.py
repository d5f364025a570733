"""Node-budget converged-quality study for the ice-quadtree workload.

``node_budget`` caps the quadtree mesh by criterion-ordered coarsening
(graph/quadtree.py). The bench's ice-quadtree row shipped budget 16384
(capacity-safe, never tuned); the window-occupancy probe
(baselines/attn_window_probe.py) showed real data meshes peak ~6.6k
nodes, and halving the budget to 8192 halves every padded static shape
(gates, sorts, scatters, attention tiles) — measured 14.7 -> 21.9 f/s on
top of the probed attention caps (BASELINE.md round-5 quadtree table).

The catch: early-training remeshes run on untrained predictions that
split far past either budget, so 8192 coarsens those meshes harder than
16384 and the loss *trajectory* differs — the knob is only promotable
with a converged-quality comparison. This study trains the flagship
quadtree config (224x304, T 10->90, month 6 — ref ice_exp.py:54-58 with
the commented-out thresh 0.15 mesh, :145-150) at both budgets with
identical data/seeds and scores the held-out year.

Run (TPU, ~1.5 h):  python baselines/quadtree_budget_quality.py
One arm:            python baselines/quadtree_budget_quality.py --budget 8192
Smoke (CPU):        python baselines/quadtree_budget_quality.py \
                        --shape 32 32 --t-out 10 --epochs 1 --budget 512
Prints one JSON line (BASELINE.md table).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def train_and_score(budget, args):
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
    ds, mask = synthetic_dataset(shape=shape, years=(2007, 2007 + args.years))
    training_years = range(2007, 2007 + args.years - 1)
    x_vars = ["siconc", "t2m", "v10", "u10", "sshf"]
    y_vars = ["siconc"]

    data_train = IceDataset(ds, training_years, args.month, args.t_in,
                            args.t_out, x_vars, y_vars, train=True)
    data_test = IceDataset(ds, [training_years[-1] + 1], args.month,
                           args.t_in, args.t_out, x_vars, y_vars)
    if args.max_train_samples and len(data_train.y) > args.max_train_samples:
        k = len(data_train.y) // args.max_train_samples
        data_train.x = data_train.x[::k]
        data_train.y = data_train.y[::k]
        data_train.dates = data_train.dates[::k]
    loader_train = DataLoader(data_train, args.batch_size, shuffle=True,
                              seed=21)
    loader_test = DataLoader(data_test, args.batch_size)
    climatology = climatology_from_dataset(ds, "siconc")

    # bench.make_ice_predictor's quadtree arm, with the probed attention
    # caps (the budget under study is the only difference between arms)
    model = NextFramePredictorS2S(
        image_shape=shape,
        thresh=0.15,
        experiment_name=f"qt_budget_{budget}",
        decompose=True,
        input_features=len(x_vars),
        input_timesteps=args.t_in,
        output_timesteps=args.t_out,
        transform_func=dist_from_05,
        binary=False,
        use_climatology=True,
        model_kwargs=dict(
            hidden_size=32, dropout=0.1, n_layers=1, n_conv_layers=3,
            rnn_type="LSTM", convolution_type="TransformerConv",
            compute_dtype="bfloat16", fused_gates=True,
        ),
        graph_kwargs=dict(
            max_grid_size=8, n_max=budget, e_max=8 * budget,
            node_budget=budget, aggregation="pallas",
            agg_nt=128, agg_eb=args.attn_eb, agg_sw=args.attn_sw,
        ),
        seed=21,
    )

    t0 = time.time()
    model.train(
        loader_train, loader_test, climatology,
        lr=0.01, lr_decay=0.95, n_epochs=args.epochs, mask=mask,
        high_interest_region=synthetic_hir(shape),
        divergence_threshold=1e9,  # short-budget runs trip the ref guard
    )
    train_s = time.time() - t0

    scores = model.score(loader_test, climatology, mask=mask)
    return {
        "node_budget": budget,
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
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--max-train-samples", type=int, default=0,
                    help="subsample the train split to ~this many (0=all)")
    ap.add_argument("--attn-eb", type=int, default=1024)
    ap.add_argument("--attn-sw", type=int, default=1024)
    ap.add_argument("--budget", type=int, default=0,
                    help="single arm; 0 = both 16384 and 8192")
    args = ap.parse_args()

    cfg = (f"ice quadtree {args.shape[0]}x{args.shape[1]}, "
           f"T{args.t_in}->{args.t_out}, month {args.month}, "
           f"{args.epochs} epochs, eb/sw {args.attn_eb}/{args.attn_sw}")
    if args.budget:
        row = train_and_score(args.budget, args)
        print(json.dumps({"config": cfg, f"b{args.budget}": row}))
        return

    rows = [train_and_score(b, args) for b in (16384, 8192)]
    b16k, b8k = rows
    print(json.dumps({
        "config": cfg,
        "budget_16384": b16k,
        "budget_8192": b8k,
        "test_mse_gap": b8k["test_mse"] - b16k["test_mse"],
        "speedup_wall": round(b16k["train_s"] / max(b8k["train_s"], 1e-9), 2),
    }))


if __name__ == "__main__":
    main()

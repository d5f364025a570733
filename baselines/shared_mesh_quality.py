"""Shared-mesh vs per-sample-mesh converged-quality study (round 5).

Shared-mesh batched training (TrainConfig.shared_mesh) is 4-15x faster per
step at batch 8-32 (BENCH_DETAIL pallas_bf16_shared_* rows) but changes
semantics vs the vmapped default: one mesh per step (batch-max criterion),
batch-wide dropout/teacher-forcing draws. Exact-equivalence cases are
tested (tests/test_shared_mesh.py); this study closes the remaining
question — does it train to the same QUALITY — by training the bench
configuration both ways on identical data/seeds and recording converged
validation MSE side by side (BASELINE.md table).

Round-5 finding (first run, 20 epochs / 200 samples / b8): shared-mesh
trained 6.0x faster in wall-clock but converged visibly worse
(next-frame val MSE 0.0365 vs 0.0047). Diagnosis: the batch-union mesh
competes for the SAME node_budget (2048) that a single sample used to
get alone — per-sample resolution collapses by ~B. Hence the two knobs
this script now exposes:

  --budget-scale S   multiply n_max/e_max/node_budget/agg_sw by S for the
                     shared-mesh run (the amortisation argument: one mesh
                     build for B samples affords a B-times-richer mesh)
  --epochs           per mode, so an equal-wall-clock row (shared-mesh at
                     ~6x the epochs of per-sample) can be composed

Run a single row (composable from a TPU queue script):
  python baselines/shared_mesh_quality.py --mode shared --budget-scale 4
  python baselines/shared_mesh_quality.py --mode per-sample
Or both (legacy default):
  python baselines/shared_mesh_quality.py --mode both
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_predictor_scaled(batch, shared_mesh, budget_scale, hidden=16):
    """bench.make_predictor twin with graph capacities scaled by
    ``budget_scale`` (shared-mesh runs only; see module docstring)."""
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S
    from bench import CANVAS, T_IN, T_OUT

    s = budget_scale if shared_mesh else 1
    return NextFramePredictorS2S(
        shared_mesh=shared_mesh,
        image_shape=CANVAS,
        thresh=0.1,
        experiment_name="bench",
        decompose=True,
        input_features=1,
        input_timesteps=T_IN,
        output_timesteps=T_OUT,
        model_kwargs=dict(
            hidden_size=hidden, dropout=0.1, n_layers=2, n_conv_layers=2,
            convolution_type="ChebConv", compute_dtype="bfloat16",
            remat=True,
        ),
        graph_kwargs=dict(
            max_grid_size=8, n_max=2048 * s, e_max=10240 * s,
            node_budget=2048 * s, agg_sw=1024 * s, aggregation="pallas",
        ),
    )


def train_and_score(shared_mesh, epochs, n_train, n_val, batch,
                    budget_scale=1, seed=0):
    from quadtree_mpnnlstm_tpu.data import (
        ArrayDataset,
        DataLoader,
        ModMovingMNISTDataset,
    )
    from bench import CANVAS, T_IN, T_OUT

    ds = ModMovingMNISTDataset(
        n_train + n_val, input_timesteps=T_IN, output_timesteps=T_OUT,
        canvas_size=CANVAS, digit_size=(18, 18), pixel_noise=0.02,
        velocity_noise=0.0, seed=seed,
    )
    dates = np.zeros(len(ds.y), np.int64)
    train = ArrayDataset(ds.x[:n_train], ds.y[:n_train], dates[:n_train])
    val = ArrayDataset(ds.x[n_train:], ds.y[n_train:], dates[n_train:])
    model = make_predictor_scaled(batch, shared_mesh, budget_scale)
    mask = np.zeros(CANVAS, bool)

    t0 = time.time()
    model.train(
        DataLoader(train, batch_size=batch, shuffle=True, seed=21,
                   drop_last=True),
        DataLoader(val, batch_size=batch),
        lr=0.01, lr_decay=0.95, n_epochs=epochs, mask=mask,
    )
    train_s = time.time() - t0

    # eval/predict is per-sample in both modes — the comparison isolates
    # the TRAINING-path semantics
    preds = model.predict(DataLoader(val, batch_size=batch), mask=mask)
    y = np.asarray(val.y)
    y_hat = np.asarray(preds)
    return {
        "shared_mesh": shared_mesh,
        "budget_scale": budget_scale if shared_mesh else 1,
        "epochs": epochs,
        "val_mse_rollout": float(np.mean((y_hat - y) ** 2)),
        "val_mse_next_frame": float(np.mean((y_hat[:, 0] - y[:, 0]) ** 2)),
        "final_train_loss": float(model.train_loss[-1]),
        "train_s": round(train_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["both", "per-sample", "shared"],
                    default="both")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--val", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--budget-scale", type=int, default=1,
                    help="graph-capacity multiplier for shared-mesh runs")
    args = ap.parse_args()

    cfg = (f"bench 64x64 bf16 b{args.batch}, {args.epochs} epochs, "
           f"{args.samples} train samples")
    if args.mode == "per-sample":
        row = train_and_score(False, args.epochs, args.samples, args.val,
                              args.batch)
        print(json.dumps({"config": cfg, "per_sample_mesh": row}))
        return
    if args.mode == "shared":
        row = train_and_score(True, args.epochs, args.samples, args.val,
                              args.batch, budget_scale=args.budget_scale)
        print(json.dumps({"config": cfg, "shared_mesh": row}))
        return

    rows = [
        train_and_score(sm, args.epochs, args.samples, args.val,
                        args.batch, budget_scale=args.budget_scale)
        for sm in (False, True)
    ]
    vmapped, shared = rows
    gap = shared["val_mse_next_frame"] - vmapped["val_mse_next_frame"]
    print(json.dumps({
        "config": cfg,
        "per_sample_mesh": vmapped,
        "shared_mesh": shared,
        "next_frame_mse_gap": gap,
        "speedup_wall": round(vmapped["train_s"] / shared["train_s"], 2),
    }))


if __name__ == "__main__":
    main()

"""Shared-mesh vs per-sample-mesh converged-quality study (round 5).

Shared-mesh batched training (TrainConfig.shared_mesh) is 4-15x faster per
step at batch 8-32 (BENCH_DETAIL pallas_bf16_shared_* rows) but changes
semantics vs the vmapped default: one mesh per step (batch-max criterion),
batch-wide dropout/teacher-forcing draws. Exact-equivalence cases are
tested (tests/test_shared_mesh.py); this study closes the remaining
question — does it train to the same QUALITY — by training the bench
configuration both ways on identical data/seeds and recording converged
validation MSE side by side (BASELINE.md table).

Run: python baselines/shared_mesh_quality.py [--epochs 20] [--samples 200]
Prints one JSON line with both rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def train_and_score(shared_mesh, epochs, n_train, n_val, batch, seed=0):
    from quadtree_mpnnlstm_tpu.data import (
        ArrayDataset,
        DataLoader,
        ModMovingMNISTDataset,
    )
    from bench import CANVAS, T_IN, T_OUT, make_predictor

    ds = ModMovingMNISTDataset(
        n_train + n_val, input_timesteps=T_IN, output_timesteps=T_OUT,
        canvas_size=CANVAS, digit_size=(18, 18), pixel_noise=0.02,
        velocity_noise=0.0, seed=seed,
    )
    dates = np.zeros(len(ds.y), np.int64)
    train = ArrayDataset(ds.x[:n_train], ds.y[:n_train], dates[:n_train])
    val = ArrayDataset(ds.x[n_train:], ds.y[n_train:], dates[n_train:])
    model = make_predictor(batch, "pallas", dtype="bfloat16",
                           shared_mesh=shared_mesh)
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
        "val_mse_rollout": float(np.mean((y_hat - y) ** 2)),
        "val_mse_next_frame": float(np.mean((y_hat[:, 0] - y[:, 0]) ** 2)),
        "final_train_loss": float(model.train_loss[-1]),
        "train_s": round(train_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--val", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    rows = [
        train_and_score(sm, args.epochs, args.samples, args.val, args.batch)
        for sm in (False, True)
    ]
    vmapped, shared = rows
    gap = shared["val_mse_next_frame"] - vmapped["val_mse_next_frame"]
    print(json.dumps({
        "config": f"bench 64x64 bf16 b{args.batch}, {args.epochs} epochs, "
                  f"{args.samples} train samples",
        "per_sample_mesh": vmapped,
        "shared_mesh": shared,
        "next_frame_mse_gap": gap,
        "speedup_wall": round(vmapped["train_s"] / shared["train_s"], 2),
    }))


if __name__ == "__main__":
    main()

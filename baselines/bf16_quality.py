"""bf16-vs-f32 converged-quality study (round-3 verdict item 7).

The bench defaults to bf16 mixed precision; MSE parity vs the torch
reference is proven in f32 (PARITY.json) and bf16-vs-f32 agreement is
~1e-2/frame compounded over the rollout (tests/test_bf16.py). This script
closes the remaining gap: train the bench configuration to convergence in
BOTH dtypes on identical data/seeds and record the converged next-frame
and full-rollout validation MSE side by side (BASELINE.md table).

Run: python baselines/bf16_quality.py [--epochs 20] [--samples 200]
Prints one JSON line with both rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def train_and_score(dtype, epochs, n_train, n_val, seed=0):
    import jax.numpy as jnp

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
    model = make_predictor(8, "pallas", dtype=dtype)
    mask = np.zeros(CANVAS, bool)

    t0 = time.time()
    model.train(
        DataLoader(train, batch_size=8, shuffle=True, seed=21),
        DataLoader(val, batch_size=8),
        lr=0.01, lr_decay=0.95, n_epochs=epochs, mask=mask,
    )
    train_s = time.time() - t0

    preds = model.predict(DataLoader(val, batch_size=8), mask=mask)
    y = np.asarray(val.y)
    y_hat = np.asarray(preds)
    return {
        "dtype": dtype,
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
    args = ap.parse_args()

    rows = [
        train_and_score(d, args.epochs, args.samples, args.val)
        for d in ("float32", "bfloat16")
    ]
    f32, bf16 = rows
    gap = bf16["val_mse_next_frame"] - f32["val_mse_next_frame"]
    print(json.dumps({
        "config": f"bench 64x64, {args.epochs} epochs, "
                  f"{args.samples} train samples",
        "float32": f32,
        "bfloat16": bf16,
        "next_frame_mse_gap": gap,
    }))


if __name__ == "__main__":
    main()

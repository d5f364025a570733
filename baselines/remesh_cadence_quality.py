"""Remesh-cadence converged-quality study (round 5).

``remesh_every=k`` re-decomposes the quadtree every k-th decoder step
instead of every step (the reference remeshes every step —
/root/reference/model/seq2seq.py:434-491). On the flagship ice-quadtree
workload it is the single biggest measured speed lever (9.86 → 15.4 f/s
at k=3, /tmp/ab_r5c.log) because every skipped remesh removes the
decompose, the edge sorts, the window-metadata rebuild and the H/C
pixel-space transfer from the decoder's latency chain.

It is also a semantics change: the mesh tracks the predicted field at
1/k the rate, so a fast-moving front can outrun its refinement for up to
k−1 steps. This study answers "what does k cost in converged quality" on
the 64×64 Moving-MNIST bench config (fast-moving digit = worst case for
stale meshes), same data/seeds both arms:

  python baselines/remesh_cadence_quality.py --cadence 1
  python baselines/remesh_cadence_quality.py --cadence 3
  python baselines/remesh_cadence_quality.py            # both + gap

Prints one JSON line per run (BASELINE.md table).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def train_and_score(remesh_every, epochs, n_train, n_val, batch, seed=0):
    from quadtree_mpnnlstm_tpu.data import (
        ArrayDataset,
        DataLoader,
        ModMovingMNISTDataset,
    )
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S
    from bench import CANVAS, T_IN, T_OUT

    ds = ModMovingMNISTDataset(
        n_train + n_val, input_timesteps=T_IN, output_timesteps=T_OUT,
        canvas_size=CANVAS, digit_size=(18, 18), pixel_noise=0.02,
        velocity_noise=0.0, seed=seed,
    )
    dates = np.zeros(len(ds.y), np.int64)
    train = ArrayDataset(ds.x[:n_train], ds.y[:n_train], dates[:n_train])
    val = ArrayDataset(ds.x[n_train:], ds.y[n_train:], dates[n_train:])

    model = NextFramePredictorS2S(
        image_shape=CANVAS,
        thresh=0.1,
        experiment_name="bench",
        decompose=True,
        input_features=1,
        input_timesteps=T_IN,
        output_timesteps=T_OUT,
        model_kwargs=dict(
            hidden_size=16, dropout=0.1, n_layers=2, n_conv_layers=2,
            convolution_type="ChebConv", compute_dtype="bfloat16",
            remat=True, remesh_every=remesh_every,
        ),
        graph_kwargs=dict(
            max_grid_size=8, n_max=2048, e_max=10240,
            node_budget=2048, agg_sw=1024, aggregation="pallas",
        ),
    )
    mask = np.zeros(CANVAS, bool)

    t0 = time.time()
    model.train(
        DataLoader(train, batch_size=batch, shuffle=True, seed=21,
                   drop_last=True),
        DataLoader(val, batch_size=batch),
        lr=0.01, lr_decay=0.95, n_epochs=epochs, mask=mask,
    )
    train_s = time.time() - t0

    # predict() also rolls the decoder with the model's cadence — the
    # quality number reflects deploying at the same k it trained with
    preds = model.predict(DataLoader(val, batch_size=batch), mask=mask)
    y = np.asarray(val.y)
    y_hat = np.asarray(preds)
    return {
        "remesh_every": remesh_every,
        "epochs": epochs,
        "val_mse_rollout": float(np.mean((y_hat - y) ** 2)),
        "val_mse_next_frame": float(np.mean((y_hat[:, 0] - y[:, 0]) ** 2)),
        "val_mse_last_frame": float(np.mean((y_hat[:, -1] - y[:, -1]) ** 2)),
        "final_train_loss": float(model.train_loss[-1]),
        "train_s": round(train_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cadence", type=int, default=0,
                    help="single remesh_every arm; 0 = both 1 and 3")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--val", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    cfg = (f"bench 64x64 bf16 b{args.batch}, {args.epochs} epochs, "
           f"{args.samples} train samples, quadtree remesh cadence")
    if args.cadence:
        row = train_and_score(args.cadence, args.epochs, args.samples,
                              args.val, args.batch)
        print(json.dumps({"config": cfg, f"k{args.cadence}": row}))
        return

    rows = [
        train_and_score(k, args.epochs, args.samples, args.val, args.batch)
        for k in (1, 3)
    ]
    k1, k3 = rows
    print(json.dumps({
        "config": cfg,
        "k1": k1,
        "k3": k3,
        "rollout_mse_gap": k3["val_mse_rollout"] - k1["val_mse_rollout"],
        "speedup_wall": round(k1["train_s"] / k3["train_s"], 2),
    }))


if __name__ == "__main__":
    main()

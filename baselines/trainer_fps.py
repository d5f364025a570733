"""Integrated-trainer throughput: the REAL `.train()` loop, not the bench's
step loop (VERDICT r4 #7 — production numbers for the lagged scalar drain).

The trainer (train/predictor.py) drains each step's loss/overflow one step
LATE so the tunnel round-trip overlaps device compute (PERF_NOTES "Lagged
scalar drain"). bench.py's measure() times the raw jitted step with its own
host sync; this script times an epoch of the production loop — dataloader,
prefetch_to_device, lagged drain, metrics sink — so the number that lands
in BASELINE.md is what a user's wall clock actually sees.

Run (TPU):  python baselines/trainer_fps.py [--steps 24] [--batch 16]
Prints one JSON line {trainer_fps, bench_style_fps, ratio}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=24,
                    help="train steps per timed epoch")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax.numpy as jnp

    from bench import CANVAS, T_IN, T_OUT, make_predictor
    from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset
    from quadtree_mpnnlstm_tpu.data.loader import DataLoader

    n = args.batch * args.steps
    ds = ModMovingMNISTDataset(
        n + args.batch, input_timesteps=T_IN, output_timesteps=T_OUT,
        canvas_size=CANVAS, digit_size=(18, 18), pixel_noise=0.02,
        velocity_noise=0.0, seed=0,
    )
    model = make_predictor(args.batch, "pallas", dtype=args.dtype)
    loader = DataLoader(ds, batch_size=args.batch, shuffle=False,
                        drop_last=True)
    mask = np.zeros(CANVAS, bool)

    # epoch 0 = compile + warmup; epoch 1 = timed
    model.train(loader, loader, n_epochs=1, mask=mask,
                high_interest_region=mask, divergence_threshold=1e9)
    t0 = time.perf_counter()
    model.train(loader, loader, n_epochs=1, mask=mask,
                high_interest_region=mask, divergence_threshold=1e9)
    wall = time.perf_counter() - t0

    # the trainer epoch also runs the test loader through eval_step; time
    # a train-only epoch by rough subtraction is fragile — instead report
    # frames through BOTH loops over the wall clock, and the bench-style
    # number from the same process for an apples-to-apples ratio.
    frames = 2 * args.steps * args.batch * T_OUT  # train + test passes

    from bench import measure
    bench_fps = measure(args.batch, "pallas", 4, dtype=args.dtype)

    out = {
        "trainer_fps": round(frames / wall, 2),
        "bench_style_fps": round(bench_fps, 2),
        "ratio": round((frames / wall) / bench_fps, 3),
        "batch": args.batch,
        "steps": args.steps,
        "note": "trainer_fps counts train+test frames over one full "
                "production epoch (lagged drain, prefetch, metrics); "
                "bench_style_fps is measure()'s raw step loop",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

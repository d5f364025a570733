"""Benchmark: Moving-MNIST 64×64 seq2seq training throughput on one chip.

Workload (mirrors the reference notebook config scaled to 64×64, see
BASELINE.md): T_in=4 → T_out=10, quadtree thresh=0.1 with remesh every
decoder step, ChebConv GConvLSTM, hidden 16, 2 layers. Metric = predicted
frames per wall-clock second during *training* (fwd+bwd+Adam).

Baseline = the same algorithm in reference style (host quadtree per remesh,
dense mapping matmuls, batch 1) in PyTorch on CPU: measured by
``python baselines/torch_reference.py`` on this machine → BASELINE_FPS,
re-measurable in-run with ``--measure-baseline``.

Default run prints exactly ONE JSON line (driver contract). ``--full``
additionally sweeps batch sizes and backends and writes BENCH_DETAIL.json.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_FPS = 2.758  # baselines/torch_reference.py, idle box, best of 4
# (round 1 recorded 1.12 — measured while the CPU was contended; the
# corrected idle-box figure is used so vs_baseline is not overstated)

CANVAS = (64, 64)
T_IN, T_OUT = 4, 10


def make_predictor(batch, agg, devices=1, dtype="float32", remat=True):
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    return NextFramePredictorS2S(
        image_shape=CANVAS,
        thresh=0.1,
        experiment_name="bench",
        decompose=True,
        input_features=1,
        input_timesteps=T_IN,
        output_timesteps=T_OUT,
        model_kwargs=dict(
            hidden_size=16, dropout=0.1, n_layers=2, n_conv_layers=2,
            convolution_type="ChebConv", compute_dtype=dtype, remat=remat,
        ),
        # Capacity control: early-training predictions are blurry and
        # quadtree-split the WHOLE canvas (measured: 3800+ nodes / 15k+
        # edges — round 1's 2048/8192 "tight caps" silently dropped mesh
        # content; see BASELINE.md). node_budget coarsens such meshes
        # gracefully instead, so 2048-slot capacities are exact by
        # construction; measure() asserts the overflow counter stays 0.
        graph_kwargs=dict(max_grid_size=8, n_max=2048, e_max=10240,
                          node_budget=2048, agg_sw=1024, aggregation=agg),
        dp_devices=devices,
    )


def measure(batch, agg, n_steps, devices=1, seed=0, dtype="float32",
            detail_out=None, remat=True):
    """frames/sec for one configuration (fwd+bwd+Adam, host-synced).

    ``detail_out``: optional dict that receives step_ms, the compiled
    step's XLA-reported FLOPs/bytes, and the derived MFU / HBM-bandwidth
    utilisation estimate (v5e peaks: 197 TFLOP/s bf16, 98.5 f32,
    819 GB/s HBM)."""
    import jax
    import jax.numpy as jnp

    from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset

    ds = ModMovingMNISTDataset(
        batch * (n_steps + 1), input_timesteps=T_IN, output_timesteps=T_OUT,
        canvas_size=CANVAS, digit_size=(18, 18), pixel_noise=0.02,
        velocity_noise=0.0, seed=seed,
    )
    model = make_predictor(batch, agg, devices, dtype, remat)
    model.initiate_training(lr=0.01, lr_decay=0.95)
    step = model._get_train_step(False, 0)

    rows, cols = CANVAS
    mask = jnp.zeros(CANVAS, bool)
    clim = jnp.zeros((batch, T_OUT, rows, cols, 1))
    batches = [
        (jnp.asarray(ds.x[i * batch:(i + 1) * batch]),
         jnp.asarray(ds.y[i * batch:(i + 1) * batch]))
        for i in range(n_steps + 1)
    ]

    key = jax.random.PRNGKey(0)
    params, opt_state = model.params, model.opt_state

    # warmup / compile; sync per step via a host fetch (block_until_ready
    # is unreliable on the tunneled axon platform)
    params, opt_state, loss, _ = step(
        params, opt_state, batches[0][0], batches[0][1], clim, mask, mask,
        None, key,
    )
    float(loss)

    st = time.perf_counter()
    last = 0.0
    max_ovf = 0
    for i in range(1, n_steps + 1):
        params, opt_state, loss, aux = step(
            params, opt_state, batches[i][0], batches[i][1], clim, mask,
            mask, None, key,
        )
        last = float(loss)
        max_ovf = max(max_ovf, int(aux["mesh_overflow"]))
    dt = time.perf_counter() - st
    assert np.isfinite(last), "non-finite training loss in bench"
    assert max_ovf == 0, (
        f"mesh capacity overflow in bench ({max_ovf} dropped slots) — "
        "caps too tight for this workload"
    )
    if detail_out is not None:
        step_s = dt / n_steps
        detail_out["step_ms"] = round(step_s * 1e3, 2)
        try:
            cost = step.lower(
                params, opt_state, batches[0][0], batches[0][1], clim, mask,
                mask, None, key,
            ).compile().cost_analysis()
            flops = float(cost.get("flops", 0.0))
            bytes_ = float(cost.get("bytes accessed", 0.0))
            peak = 197e12 if dtype == "bfloat16" else 98.5e12
            if flops:
                detail_out["tflops_per_step"] = round(flops / 1e12, 3)
                detail_out["mfu_pct"] = round(
                    100.0 * flops / step_s / peak, 2
                )
            if bytes_:
                detail_out["hbm_gb_per_step"] = round(bytes_ / 1e9, 2)
                detail_out["hbm_util_pct"] = round(
                    100.0 * bytes_ / step_s / 819e9, 1
                )
        except Exception as e:  # cost analysis unsupported on some backends
            detail_out["cost_analysis_error"] = str(e)[:120]
    return n_steps * batch * T_OUT / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--agg", default="pallas", choices=["xla", "pallas"])
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--devices", type=int, default=1,
                    help="data-parallel devices (global batch sharded)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"],
                    help="model compute dtype (default bf16 mixed precision "
                    "— the production TPU mode; f32 master params; MSE "
                    "parity vs the torch reference is proven in f32, "
                    "PARITY.json)")
    ap.add_argument("--remat", default="full",
                    choices=["full", "dots", "none"],
                    help="scan-step remat mode: full=replay all (default, "
                    "fast compile; dots/none showed no reliable bench win "
                    "over full on this workload — none is +12%% only in "
                    "isolated step timing, at ~8x compile)")
    ap.add_argument("--full", action="store_true",
                    help="sweep batches/backends, write BENCH_DETAIL.json")
    ap.add_argument("--measure-baseline", action="store_true",
                    help="re-measure the torch CPU reference in-run")
    args = ap.parse_args()

    baseline = BASELINE_FPS
    if args.measure_baseline:
        sys.path.insert(0, ".")
        from baselines.torch_reference import measure as torch_measure

        from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset

        ds = ModMovingMNISTDataset(
            4, input_timesteps=T_IN, output_timesteps=T_OUT,
            canvas_size=CANVAS, digit_size=(18, 18), pixel_noise=0.02,
            velocity_noise=0.0, seed=0,
        )
        baseline = torch_measure(ds.x, ds.y)
        print(f"torch CPU baseline re-measured: {baseline:.4f} f/s",
              file=sys.stderr)

    detail = {}
    if args.full:
        for agg in ("xla", "pallas"):
            for batch in (8, 16, 32):
                d = {}
                fps = measure(batch, agg, args.steps, detail_out=d)
                detail[f"{agg}_b{batch}"] = dict(fps=round(fps, 2), **d)
                print(f"[full] agg={agg} batch={batch}: {fps:.1f} f/s {d}",
                      file=sys.stderr)
        for batch in (16, 32):
            d = {}
            fps = measure(batch, "pallas", args.steps, dtype="bfloat16",
                          detail_out=d)
            detail[f"pallas_bf16_b{batch}"] = dict(fps=round(fps, 2), **d)
            print(f"[full] agg=pallas bf16 batch={batch}: {fps:.1f} f/s {d}",
                  file=sys.stderr)
        best_key = max(detail, key=lambda k: detail[k]["fps"])
        fps = detail[best_key]["fps"]
        detail["baseline_fps"] = baseline
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=2)
    else:
        remat = {"full": True, "none": False}.get(args.remat, args.remat)
        fps = measure(args.batch, args.agg, args.steps,
                      devices=args.devices, dtype=args.dtype, remat=remat)

    print(
        json.dumps(
            {
                "metric": "frames/sec/chip, Moving-MNIST 64x64 seq2seq "
                "training (quadtree thresh=0.1, remesh/step, ChebConv, "
                f"agg={args.agg if not args.full else best_key}, "
                f"dtype={args.dtype})",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

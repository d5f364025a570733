"""Benchmark: Moving-MNIST 64×64 seq2seq training throughput on one chip.

Workload (mirrors the reference notebook config scaled to 64×64, see
BASELINE.md): T_in=4 → T_out=10, quadtree thresh=0.1 with remesh every
decoder step, ChebConv GConvLSTM, hidden 16, 2 layers. Metric = predicted
frames per wall-clock second during *training* (fwd+bwd+Adam).

Baseline = the same algorithm in reference style (host quadtree per remesh,
dense mapping matmuls, batch 1) in PyTorch on CPU: measured by
``python baselines/torch_reference.py`` on this machine → BASELINE_FPS.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS = 1.1183  # baselines/torch_reference.py, this machine (CPU)

CANVAS = (64, 64)
T_IN, T_OUT = 4, 10
BATCH = 16
N_STEPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset, DataLoader
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    ds = ModMovingMNISTDataset(
        BATCH * (N_STEPS + 1),
        input_timesteps=T_IN,
        output_timesteps=T_OUT,
        canvas_size=CANVAS,
        digit_size=(18, 18),
        pixel_noise=0.02,
        velocity_noise=0.0,
        seed=0,
    )

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
            convolution_type="ChebConv",
        ),
        # Tight capacities: Moving-MNIST quadtrees use ~600-1500 nodes and a
        # few thousand edges; scatter/segment cost scales with capacity.
        graph_kwargs=dict(max_grid_size=8, n_max=2048, e_max=8192),
    )
    model.initiate_training(lr=0.01, lr_decay=0.95)
    step = model._get_train_step(False, 0)

    rows, cols = CANVAS
    mask = jnp.zeros(CANVAS, bool)
    clim = jnp.zeros((BATCH, T_OUT, rows, cols, 1))

    batches = []
    for i in range(N_STEPS + 1):
        sl = slice(i * BATCH, (i + 1) * BATCH)
        batches.append(
            (jnp.asarray(ds.x[sl]), jnp.asarray(ds.y[sl]))
        )

    key = jax.random.PRNGKey(0)
    params, opt_state = model.params, model.opt_state

    # warmup / compile
    params, opt_state, loss, _ = step(
        params, opt_state, batches[0][0], batches[0][1], clim, mask, mask,
        None, key,
    )
    float(loss)  # host sync (block_until_ready is unreliable on axon)

    # Sync per step via a host fetch: on the tunneled 'axon' platform
    # jax.block_until_ready returns without waiting for remote execution,
    # so only a device->host transfer gives honest timings.
    st = time.perf_counter()
    last = 0.0
    for i in range(1, N_STEPS + 1):
        params, opt_state, loss, _ = step(
            params, opt_state, batches[i][0], batches[i][1], clim, mask,
            mask, None, key,
        )
        last = float(loss)
    dt = time.perf_counter() - st
    assert np.isfinite(last), "non-finite training loss in bench"

    fps = N_STEPS * BATCH * T_OUT / dt
    print(
        json.dumps(
            {
                "metric": "frames/sec/chip, Moving-MNIST 64x64 seq2seq "
                "training (quadtree thresh=0.1, remesh/step, ChebConv)",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Microbenchmark: Â·z aggregation — XLA gather+scatter vs fused Pallas SpMM.

Axon-tunnel timing rules (see tests/conftest.py docstring + PERF_NOTES.md):
``block_until_ready`` does not wait for remote execution, and a single
dispatch pays ~0.8 ms tunnel latency — so each variant runs K back-to-back
applications inside ONE jitted scan and syncs with a host fetch. Reported
time = (t_loop(K) - t_loop(0)) / K per application over the whole batch.

Shapes mirror bench.py's flagship workload: Moving-MNIST 64×64 quadtree
graphs, n_max=2048, e_max=8192, batch 16 (vmapped per-sample graphs).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, reps=3):
    # compile + warm, SYNCED (an async warm call would queue ahead of the
    # timed one and pollute it)
    float(np.asarray(fn(*args)).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        st = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out).ravel()[0])  # honest sync
        best = min(best, time.perf_counter() - st)
    return best, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--feat", type=int, nargs="+", default=[20, 128])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--eb", type=int, default=1024)
    ap.add_argument("--sw", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quadtree_mpnnlstm_tpu.config import GraphConfig
    from quadtree_mpnnlstm_tpu.data import ModMovingMNISTDataset
    from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
    from quadtree_mpnnlstm_tpu.models.conv import a_mul
    from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

    cfg = GraphConfig(
        image_shape=(64, 64), max_grid_size=8, thresh=0.1,
        n_max=2048, e_max=8192,
        aggregation="pallas", agg_nt=args.nt, agg_eb=args.eb, agg_sw=args.sw,
    )
    ds = ModMovingMNISTDataset(
        args.batch, input_timesteps=2, output_timesteps=1,
        canvas_size=(64, 64), digit_size=(18, 18), pixel_noise=0.02,
        velocity_noise=0.0, seed=0,
    )
    x = jnp.asarray(ds.x)  # (B, 2, 64, 64, 1)

    build = jax.jit(jax.vmap(
        lambda xb: image_to_graph(add_positional_encoding(xb), cfg)[0]
    ))
    graphs = build(x)
    ovf = int(jnp.max(graphs.overflow))
    print(f"batch {args.batch}: max overflow {ovf}, "
          f"mean edges {float(jnp.mean(graphs.n_edges)):.0f}, "
          f"mean nodes {float(jnp.mean(graphs.n_nodes)):.0f}")
    assert ovf == 0, "raise agg window caps"

    rng = np.random.default_rng(0)
    for f in args.feat:
        z0 = jnp.asarray(
            rng.standard_normal((args.batch, cfg.n_max, f)).astype(np.float32)
        )

        def loop(backend_graphs, z, iters):
            def body(z, _):
                z2 = jax.vmap(a_mul)(z, backend_graphs)
                # keep magnitudes bounded so the loop can't over/underflow
                return z2 / 1.125, None
            out, _ = jax.lax.scan(body, z, None, length=iters)
            # scalar result: fetching the full array through the tunnel
            # (~1.2 GB/s) would swamp the measurement
            return jnp.sum(out)

        xla_graphs = graphs.replace(agg=("xla", 0, 0, 0))
        for name, g in (("xla", xla_graphs), ("pallas", graphs)):
            run = jax.jit(lambda z, g=g, n=args.iters: loop(g, z, n))
            run0 = jax.jit(lambda z, g=g: loop(g, z, 0))
            t0, _ = timed(run0, z0)
            t, _ = timed(run, z0)
            per = (t - t0) / args.iters
            bw = args.batch * (cfg.e_max + 2 * cfg.n_max) * f * 4 / per / 1e9
            print(f"F={f:4d} {name:7s}: {per*1e6:9.1f} us/apply "
                  f"(~{bw:6.1f} GB/s effective)")


if __name__ == "__main__":
    main()

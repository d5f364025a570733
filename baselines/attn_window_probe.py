"""Measure real attention-window occupancy on the ice-quadtree workload.

The fused attention kernel's cost is quadratic-ish in its per-tile
capacities: the one-hot gather matmuls are (SW, EB)·(SW, HD) and the
softmax planes are (NT, EB), so an oversized ``agg_eb``/``agg_sw`` burns
MXU cycles on dead slots even though dead *tiles* are skipped.  The
bench's ice-quadtree config ships eb=sw=2048 (capacity-safe, never
measured).  This probe builds the same budget-coarsened meshes the bench
trains on (same synthetic generator, same GraphConfig) across several
frames and reports the per-tile maxima that actually bound capacity:

  * max edges landing in one 128-node dst tile      (lower bound on EB)
  * max 16-aligned source spread within one tile    (lower bound on SW)

Decision rule: pick the next power-of-two-ish capacity ≥ 1.3× the probed
max; the bench's overflow==0 assertion still guards the promoted config
against meshes the probe didn't see (overflow is counted, never silent —
ops/pallas_spmm.window_geometry).

Reference context: the torch reference rebuilds PyG edge lists per remesh
(/root/reference/model/graph_functions.py:300-360) and has no windowed
kernel, so capacity tuning has no analogue there — this is a TPU-design
knob only.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--budget", type=int, default=16384)
    ap.add_argument("--nt", type=int, default=128)
    ap.add_argument("--platform", default=None,
                    help="force backend (e.g. cpu); default = axon TPU")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from bench import ICE_SHAPE, ICE_T_IN, ICE_VARS, ice_mask
    from quadtree_mpnnlstm_tpu.cli.ice_exp import dist_from_05
    from quadtree_mpnnlstm_tpu.graph.build import GraphConfig, image_to_graph

    rng = np.random.default_rng(0)  # bench seed
    mask_np = ice_mask()
    rows, cols = ICE_SHAPE

    cfg = GraphConfig(
        image_shape=ICE_SHAPE,
        thresh=0.15,
        max_grid_size=8,
        n_max=args.budget,
        e_max=8 * args.budget,
        node_budget=args.budget,
    )

    stats = []
    mask = jnp.asarray(mask_np)
    for f in range(args.frames):
        base = rng.random(
            (ICE_T_IN, rows // 8, cols // 8, ICE_VARS)
        ).astype(np.float32)
        up = np.kron(base, np.ones((1, 8, 8, 1), np.float32))
        up[:, mask_np, :] = 0.0
        g, _ = image_to_graph(
            jnp.asarray(up), cfg, mask=mask, transform_func=dist_from_05
        )
        valid = np.asarray(g.edge_valid)
        src = np.asarray(g.edge_src)[valid]
        dst = np.asarray(g.edge_dst)[valid]  # already dst-sorted
        n = int(g.n_nodes)
        e = int(valid.sum())

        tile = dst // args.nt
        t_count = np.bincount(tile, minlength=args.budget // args.nt)
        spreads = []
        for t in np.unique(tile):
            s = src[tile == t]
            s = s[s < args.budget]
            if s.size:
                s0 = int(s.min()) & ~15
                spreads.append(int(s.max()) + 1 - s0)
        stats.append(
            dict(
                n_nodes=n,
                n_edges=e,
                max_tile_edges=int(t_count.max()),
                p99_tile_edges=int(np.percentile(t_count[t_count > 0], 99)),
                mean_tile_edges=float(t_count[t_count > 0].mean()),
                max_src_spread=int(max(spreads)) if spreads else 0,
                p99_src_spread=int(np.percentile(spreads, 99)),
            )
        )

    agg = {
        k: max(s[k] for s in stats)
        for k in ("max_tile_edges", "max_src_spread")
    }
    agg["mean_tile_edges"] = float(
        np.mean([s["mean_tile_edges"] for s in stats])
    )
    agg["p99_tile_edges"] = max(s["p99_tile_edges"] for s in stats)
    agg["p99_src_spread"] = max(s["p99_src_spread"] for s in stats)
    agg["frames"] = args.frames
    agg["current_eb_sw"] = [2048, 2048]

    def cap(x):
        c = 128
        while c < 1.3 * x:
            c *= 2
        return c

    agg["suggested_eb"] = cap(agg["max_tile_edges"])
    agg["suggested_sw"] = cap(agg["max_src_spread"])
    agg["per_frame"] = stats
    print(json.dumps(agg))


if __name__ == "__main__":
    main()

"""Per-component timing of the ice-quadtree decoder step.

The ice-quadtree bench config (224x304, TransformerConv, remesh every
decoder step — ref seq2seq.py:434-491 semantics at ice_exp.py scale)
runs at ~9.2 s/train-step = ~100 ms per decoder iteration, 14x the
pixelwise grid backend (BENCH_DETAIL.json). The xplane trace attributes
the gap to the in-scan mesh rebuild, but a trace of a 90-step fused scan
cannot cleanly split *which part* of the rebuild dominates. This script
times each component in isolation — same shapes, same GraphConfig as
``bench.make_ice_predictor("quadtree")`` — as a jitted ``lax.scan`` over
K data-varying iterations (so nothing hoists/CSEs out of the loop):

  decompose   quadtree split levels + pixel->node ids  (graph/quadtree.py)
  remesh      full image_to_graph (decompose + flatten + adjacency +
              attention-window meta)                   (graph/build.py)
  adj_sort    build_adjacency, lexicographic-sort path (graph/adjacency.py:48)
  adj_csum    build_adjacency_canonical, sort-free     (graph/adjacency.py:125)
  attn_meta   dst-grouped attention-window packing     (ops/pallas_attn.py:79)
  attn_fwd    one fused attention aggregation call, gates-as-heads width
              (heads=8, d=32 — the per-layer x- or h-stack of a fused
              GConvLSTM)                               (ops/pallas_attn.py:390)
  attn_grad   same call under value_and_grad (the backward kernel)
  transfer    H+C carry across a remesh through pixel space
              (models/seq2seq.py:_transfer_state)

Run (TPU):  python baselines/quadtree_step_breakdown.py
Smoke (CPU): python baselines/quadtree_step_breakdown.py --cpu \
    --shape 64 64 --k 2
Prints one JSON line: ms/iteration per component + the implied share of
the measured ~100 ms/decoder-step budget.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_scan(fn, xs, k, label, results):
    """Time jit(lax.scan(fn)) over k data-varying iterations; ms/iter."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xs):
        def body(carry, x):
            return fn(carry, x)

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return out

    t0 = time.perf_counter()
    float(run(xs))  # compile + first run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(xs))
    dt = time.perf_counter() - t0
    results[label] = {
        "ms_per_iter": round(dt / k * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }
    print(f"[breakdown] {label}: {dt / k * 1e3:.2f} ms/iter "
          f"(compile {compile_s:.0f}s)", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=[224, 304])
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--budget", type=int, default=16384)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--adjacency", default="sort", choices=["sort", "csum"],
                    help="adjacency inside the 'remesh' composite")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from quadtree_mpnnlstm_tpu.cli.ice_exp import dist_from_05, synthetic_hir
    from quadtree_mpnnlstm_tpu.config import GraphConfig
    from quadtree_mpnnlstm_tpu.graph.adjacency import (
        build_adjacency,
        build_adjacency_canonical,
    )
    from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
    from quadtree_mpnnlstm_tpu.graph.quadtree import (
        decompose_levels,
        pixel_nodes_from_levels,
    )
    from quadtree_mpnnlstm_tpu.models.seq2seq import _transfer_state
    from quadtree_mpnnlstm_tpu.ops.pallas_attn import (
        AttnDims,
        attn_apply,
        attn_tile_meta,
    )
    from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

    rows, cols = args.shape
    at_ice = (rows, cols) == (224, 304)
    budget = args.budget if at_ice else min(args.budget, rows * cols)
    # exactly bench.make_ice_predictor("quadtree") + the predictor's
    # TransformerConv adjustments (attn_windows, carry_edges=False)
    eb = sw = 2048 if at_ice else 1024
    gcfg = GraphConfig(
        image_shape=(rows, cols),
        max_grid_size=8,
        thresh=0.15,
        use_edge_attrs=True,
        n_max=budget,
        e_max=8 * budget,
        node_budget=budget,
        aggregation="pallas",
        agg_nt=128,
        agg_eb=eb,
        agg_sw=sw,
        adjacency=args.adjacency,
        attn_windows=True,
        carry_edges=False,
    )
    k = args.k
    rng = np.random.default_rng(0)

    # mask + HIR like the bench's synthetic ice field
    if at_ice:
        from bench import ice_mask
        mask_np = ice_mask()
    else:
        yy, xx = np.mgrid[:rows, :cols]
        mask_np = ((yy - rows / 2) ** 2 + (xx - cols / 2) ** 2
                   > (0.48 * min(rows, cols)) ** 2)
    mask = jnp.asarray(mask_np)
    hir = jnp.asarray(synthetic_hir((rows, cols)))

    # K per-step "prediction" frames (smooth fields like the bench's)
    base = rng.random((k, rows // 8, cols // 8, 1)).astype(np.float32)
    frames_np = np.kron(base, np.ones((1, 8, 8, 1), np.float32))
    frames_np[:, mask_np, :] = 0.0
    frames = jax.device_put(jnp.asarray(frames_np))  # (K, rows, cols, 1)

    results = {}

    def with_pe(frame):
        return add_positional_encoding(frame[None])  # (1, rows, cols, 3)

    # -- decompose: split levels + pixel->node ids ------------------------
    def run_decompose(carry, frame):
        crit = with_pe(frame)[0, ..., 0]
        level = decompose_levels(crit, gcfg, mask=mask,
                                 high_interest_region=hir,
                                 transform_func=dist_from_05)
        pixel_node, n_nodes, counts = pixel_nodes_from_levels(
            level, gcfg, mask=mask)
        return carry + n_nodes.astype(jnp.float32), None

    bench_scan(run_decompose, frames, k, "decompose", results)

    # -- full remesh (what do_remesh runs per decoder step) ---------------
    def run_remesh(carry, frame):
        graph, data = image_to_graph(
            with_pe(frame), gcfg, mask=mask, high_interest_region=hir,
            transform_func=dist_from_05)
        return carry + graph.n_nodes.astype(jnp.float32) + data[0].sum(), None

    bench_scan(run_remesh, frames, k, f"remesh_{args.adjacency}", results)

    # -- adjacency builders on K precomputed meshes ------------------------
    @jax.jit
    def mesh_inputs(frame):
        crit = with_pe(frame)[0, ..., 0]
        level = decompose_levels(crit, gcfg, mask=mask,
                                 high_interest_region=hir,
                                 transform_func=dist_from_05)
        pixel_node, n_nodes, counts = pixel_nodes_from_levels(
            level, gcfg, mask=mask)
        node_img = pixel_node.reshape(gcfg.image_shape)
        # node positions like build._node_positions: mean posenc per node
        pe = with_pe(frame)[0, ..., 1:]  # (rows, cols, 2)
        flat_pe = pe.reshape(-1, 2)
        ssum = jax.ops.segment_sum(flat_pe, pixel_node,
                                   num_segments=gcfg.n_max)
        node_xy = ssum / jnp.maximum(counts, 1)[:, None]
        return node_img, level, node_xy, n_nodes

    meshes = [mesh_inputs(frames[i]) for i in range(k)]
    node_imgs = jnp.stack([m[0] for m in meshes])
    levels = jnp.stack([m[1] for m in meshes])
    node_xys = jnp.stack([m[2] for m in meshes])
    n_nodes_all = jnp.stack([m[3] for m in meshes])

    def run_adj_sort(carry, x):
        node_img, level, node_xy = x
        out = build_adjacency(node_img, node_xy, gcfg, dedup=True,
                              src_view=False)
        return carry + out[4].astype(jnp.float32), None

    bench_scan(run_adj_sort, (node_imgs, levels, node_xys), k,
               "adj_sort", results)

    def run_adj_csum(carry, x):
        node_img, level, node_xy = x
        out = build_adjacency_canonical(node_img, level, node_xy, gcfg,
                                        src_view=False)
        return carry + out[4].astype(jnp.float32), None

    bench_scan(run_adj_csum, (node_imgs, levels, node_xys), k,
               "adj_csum", results)

    # -- attention-window meta packing -------------------------------------
    @jax.jit
    def edges_of(node_img, level, node_xy):
        return build_adjacency_canonical(node_img, level, node_xy, gcfg,
                                         src_view=False)

    e_all = [edges_of(node_imgs[i], levels[i], node_xys[i]) for i in range(k)]
    srcs = jnp.stack([e[0] for e in e_all])
    dsts = jnp.stack([e[1] for e in e_all])
    attrs = jnp.stack([e[3] for e in e_all])

    def run_attn_meta(carry, x):
        src, dst, attr, n_nodes = x
        meta, ovf = attn_tile_meta(src, dst, attr, gcfg.n_max,
                                   gcfg.agg_nt, gcfg.agg_eb, gcfg.agg_sw,
                                   n_nodes=n_nodes)
        return carry + meta.s0.sum().astype(jnp.float32) + ovf, None

    bench_scan(run_attn_meta, (srcs, dsts, attrs, n_nodes_all), k,
               "attn_meta", results)

    # -- fused attention aggregation (gates-as-heads width) ----------------
    meta0, _ = attn_tile_meta(srcs[0], dsts[0], attrs[0], gcfg.n_max,
                              gcfg.agg_nt, gcfg.agg_eb, gcfg.agg_sw,
                              n_nodes=n_nodes_all[0])
    heads, d = 8, 32  # fused GConvLSTM x/h stack: 8 gate streams x hidden 32
    hd = heads * d
    a = int(attrs.shape[-1])
    dims = AttnDims(gcfg.n_max, gcfg.agg_nt, gcfg.agg_eb, gcfg.agg_sw,
                    heads, d)
    t_tiles = int(meta0.src_rel.shape[0])
    keep = jnp.ones((t_tiles, 1, gcfg.agg_eb), jnp.float32)
    qkv0 = jnp.asarray(
        rng.standard_normal((3, gcfg.n_max, hd)).astype(np.float32),
        dtype=jnp.bfloat16)
    we = jnp.asarray(rng.standard_normal((a, hd)).astype(np.float32),
                     dtype=jnp.bfloat16)
    deltas = jnp.asarray(
        rng.standard_normal((k, gcfg.n_max, hd)).astype(np.float32) * 0.01,
        dtype=jnp.bfloat16)

    def run_attn_fwd(carry, delta):
        q = qkv0[0] + delta
        out = attn_apply(q, qkv0[1], qkv0[2], we, keep, meta0, dims)
        return carry + out.sum().astype(jnp.float32), None

    bench_scan(run_attn_fwd, deltas, k, "attn_fwd_h8d32", results)

    def loss_fn(q, kk, v, w):
        return attn_apply(q, kk, v, w, keep, meta0, dims).sum() \
            .astype(jnp.float32)

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))

    def run_attn_grad(carry, delta):
        val, grads = grad_fn(qkv0[0] + delta, qkv0[1], qkv0[2], we)
        return carry + val + grads[0].sum().astype(jnp.float32), None

    bench_scan(run_attn_grad, deltas, k, "attn_grad_h8d32", results)

    # -- H/C transfer across a remesh (per layer pair) ----------------------
    graph_a, _ = jax.jit(
        lambda f: image_to_graph(with_pe(f), gcfg, mask=mask,
                                 high_interest_region=hir,
                                 transform_func=dist_from_05)
    )(frames[0])
    graph_b, _ = jax.jit(
        lambda f: image_to_graph(with_pe(f), gcfg, mask=mask,
                                 high_interest_region=hir,
                                 transform_func=dist_from_05)
    )(frames[1])
    hidden0 = jnp.asarray(
        rng.standard_normal((gcfg.n_max, 32)).astype(np.float32),
        dtype=jnp.bfloat16)
    hdeltas = jnp.asarray(
        rng.standard_normal((k, gcfg.n_max, 32)).astype(np.float32) * 0.01,
        dtype=jnp.bfloat16)
    shape = (rows, cols)

    def run_transfer(carry, delta):
        # H and C of one layer, old mesh -> new mesh (one do_remesh's worth
        # for n_layers=1: 2 tensors)
        hc = (hidden0 + delta, hidden0 - delta)
        out = _transfer_state(hc, graph_a, graph_b, shape)
        return carry + out[0].sum().astype(jnp.float32)

    def run_transfer_scan(carry, delta):
        return run_transfer(carry, delta), None

    bench_scan(run_transfer_scan, hdeltas, k, "transfer_HC", results)

    # -- summary ------------------------------------------------------------
    step_parts = {
        "remesh": results[f"remesh_{args.adjacency}"]["ms_per_iter"],
        "transfer_HC": results["transfer_HC"]["ms_per_iter"],
        # per decoder step: x-stack + h-stack aggregations (fused gates)
        # + ~1 head-conv call (~1/8 width, charge 1/4 of one call)
        "attn_calls_est": round(
            2 * results["attn_grad_h8d32"]["ms_per_iter"]
            + 0.25 * results["attn_grad_h8d32"]["ms_per_iter"], 2),
    }
    print(json.dumps({
        "config": f"{rows}x{cols} quadtree budget={budget} "
                  f"windows={gcfg.agg_nt}/{gcfg.agg_eb}/{gcfg.agg_sw} "
                  f"adjacency={args.adjacency}",
        "platform": jax.devices()[0].platform,
        "components_ms_per_iter": {kk: v["ms_per_iter"]
                                   for kk, v in results.items()},
        "compile_s": {kk: v["compile_s"] for kk, v in results.items()},
        "decoder_step_estimate_ms": step_parts,
    }))


if __name__ == "__main__":
    main()

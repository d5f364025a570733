"""MSE-parity evidence vs the PyTorch reference implementation.

BASELINE.json's north-star has two clauses: ≥10× frames/sec AND "next-frame
MSE within 1e-3 of reference". This module provides both forms of evidence:

1. **Weight-transplant forward parity** (deterministic, the strong form):
   copy a torch ``Seq2SeqT``'s weights into the JAX ``Seq2Seq`` parameter
   pytree (:func:`torch_to_flax`) and run both models on the same videos.
   The two implementations — reference-style host-loop torch
   (baselines/torch_reference.py) vs the jit-compiled scan with on-device
   remeshing — must produce the *same numbers*: identical quadtree
   partitions (ref model/graph_functions.py:145-259 semantics on both
   sides), identical ChebConv math (sym-norm is scale-invariant, so the
   resolution factor in edge distances drops out), identical LSTM gate /
   LayerNorm / residual-head arithmetic (ref model/model.py:394-463,
   seq2seq.py:160-175). Agreement is ~1e-6 at f32, far inside the 1e-3
   parity budget — and it holds for *trained* weights too.

2. **Independent-training convergence parity** (the statistical form):
   train both implementations from their own random inits with the same
   hyper-parameters on the same Moving-MNIST split and compare converged
   next-frame MSE on a held-out set.

Run ``python baselines/parity.py`` → prints a table and writes PARITY.json;
the CI-sized version lives in tests/test_parity_torch.py.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import torch  # noqa: E402

from baselines.torch_reference import (  # noqa: E402
    Seq2SeqT,
    eval_rollout,
    run_sample,
)


# ------------------------------------------------------------- weight bridge


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def _cheb_params(cb) -> dict:
    """ChebConvT → flax ChebConv param dict (kernels transposed: torch
    Linear stores (out, in), flax Dense (in, out))."""
    out = {
        f"lin_{j}": {"kernel": _np(lin.weight).T} for j, lin in enumerate(cb.lins)
    }
    out["bias"] = _np(cb.bias)
    return out


def _gate_stack_params(stacks) -> dict:
    """Four per-gate ConvStacks → the vmapped GraphConv layout: every leaf
    gains a leading gate axis (models/cells.py gate_conv_module)."""
    n_layers = len(stacks[0].layers)
    out = {}
    for k in range(n_layers):
        layer = {
            f"lin_{j}": {
                "kernel": np.stack(
                    [_np(s.layers[k].lins[j].weight).T for s in stacks]
                )
            }
            for j in range(len(stacks[0].layers[k].lins))
        }
        layer["bias"] = np.stack([_np(s.layers[k].bias) for s in stacks])
        out[f"conv_{k}"] = layer
    return out


def _cell_params(cell) -> dict:
    """GConvLSTMT → flax GConvLSTM (fused=False) param dict. Gate order in
    both implementations is (i, f, candidate, o); peepholes w[0..2] map to
    w_c_i / w_c_f / w_c_o (ref model/model.py:375-424)."""
    return {
        "conv_x": _gate_stack_params(cell.cx),
        "conv_h": _gate_stack_params(cell.ch),
        "w_c_i": _np(cell.w[0]),
        "w_c_f": _np(cell.w[1]),
        "w_c_o": _np(cell.w[2]),
        "b_i": _np(cell.b[0]),
        "b_f": _np(cell.b[1]),
        "b_c": _np(cell.b[2]),
        "b_o": _np(cell.b[3]),
    }


def _ln_params(ln) -> dict:
    return {"scale": _np(ln.weight), "bias": _np(ln.bias)}


def torch_to_flax(tm: Seq2SeqT) -> dict:
    """Full parameter transplant torch Seq2SeqT → flax Seq2Seq pytree.

    The torch baseline shares one norm_h/norm_c across encoder and decoder
    (like its single-module layout); the flax model owns separate instances,
    so the shared tensors are copied into both — forward-equivalent.
    """
    enc = {f"rnn_{i}": _cell_params(c) for i, c in enumerate(tm.enc)}
    enc["norm_h"] = _ln_params(tm.norm_h)
    enc["norm_c"] = _ln_params(tm.norm_c)
    dec = {f"rnn_{i}": _cell_params(c) for i, c in enumerate(tm.dec)}
    dec["norm_h"] = _ln_params(tm.norm_h)
    dec["norm_c"] = _ln_params(tm.norm_c)
    dec["norm_o"] = _ln_params(tm.norm_o)
    dec["fc_out1"] = _cheb_params(tm.fc1)
    dec["fc_out2"] = _cheb_params(tm.fc2)
    return {"params": {"enc": {"encoder": enc}, "dec": {"decoder": dec}}}


# ------------------------------------------------------------ JAX-side setup


def make_jax_model(shape, t_in, t_out, hidden, n_layers, n_conv_layers,
                   thresh=0.1, max_size=8, n_max=None, e_max=None):
    """Deterministic flax Seq2Seq matching Seq2SeqT's architecture
    (unfused gate convs so the param layout lines up 1:1)."""
    from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
    from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq

    rows, cols = shape
    gcfg = GraphConfig(
        image_shape=shape, max_grid_size=max_size, thresh=thresh,
        n_max=n_max or rows * cols, e_max=e_max or rows * cols * 5,
    )
    cfg = ModelConfig(
        hidden_size=hidden, input_features=1, input_timesteps=t_in,
        output_timesteps=t_out, n_layers=n_layers,
        n_conv_layers=n_conv_layers, convolution_type="ChebConv",
        dropout=0.0, fused_gates=False, remesh_every=1,
    )
    return Seq2Seq(cfg, gcfg), cfg, gcfg


def check_tree_match(template, transplanted):
    """Shape-check the transplanted tree against a model.init template."""
    import jax

    t_paths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(template)
    }
    s_paths = {
        jax.tree_util.keystr(p): np.asarray(l).shape
        for p, l in jax.tree_util.tree_leaves_with_path(transplanted)
    }
    assert t_paths == s_paths, (
        "param tree mismatch:\n"
        + "\n".join(sorted(set(t_paths.items()) ^ set(s_paths.items())))
    )


def jax_eval_rollout(model, params, xs, ys):
    """Counterpart of torch eval_rollout → (y_hat, mse, next_mse)."""
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda p, x: model.apply(p, x))
    outs = [np.asarray(fwd(params, jnp.asarray(x)))[..., 0] for x in xs]
    y_hat = np.stack(outs)
    y = ys[..., 0]
    mse = float(np.mean((y_hat - y) ** 2))
    next_mse = float(np.mean((y_hat[:, 0] - y[:, 0]) ** 2))
    return y_hat, mse, next_mse


# ----------------------------------------------------------------- harness


def transplant_check(shape, t_in, t_out, hidden, n_layers, n_conv_layers,
                     xs, ys, torch_model=None, thresh=0.1, max_size=8):
    """Returns dict of parity numbers for (possibly trained) torch weights."""
    import jax

    if torch_model is None:
        torch.manual_seed(0)
        torch_model = Seq2SeqT(hidden, n_layers, n_conv_layers)

    model, cfg, gcfg = make_jax_model(
        shape, t_in, t_out, hidden, n_layers, n_conv_layers, thresh, max_size
    )
    template = model.init(
        jax.random.PRNGKey(0), np.zeros((t_in, *shape, 1), np.float32)
    )
    params = torch_to_flax(torch_model)
    check_tree_match(template, params)
    params = jax.tree_util.tree_map(np.asarray, params)

    yhat_t, mse_t, next_t = eval_rollout(torch_model, xs, ys, thresh, max_size)
    yhat_j, mse_j, next_j = jax_eval_rollout(model, params, xs, ys)
    return {
        "output_agreement_mse": float(np.mean((yhat_t - yhat_j) ** 2)),
        "output_agreement_max": float(np.max(np.abs(yhat_t - yhat_j))),
        "torch_next_frame_mse": next_t,
        "jax_next_frame_mse": next_j,
        "next_frame_mse_diff": abs(next_t - next_j),
        "torch_rollout_mse": mse_t,
        "jax_rollout_mse": mse_j,
    }


def main():
    # Parity numbers are backend-independent (f32); run on CPU so the JAX
    # half doesn't pay the axon tunnel's multi-minute remote compiles.
    import os

    if not os.environ.get("QTM_PARITY_TPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    from quadtree_mpnnlstm_tpu.data import DataLoader, ModMovingMNISTDataset
    from quadtree_mpnnlstm_tpu.train import NextFramePredictorS2S

    shape, t_in, t_out = (32, 32), 4, 6
    hidden, n_layers, n_conv_layers = 16, 2, 2
    n_train, n_val, epochs, lr = 32, 8, 12, 0.01

    ds = ModMovingMNISTDataset(
        n_train + n_val, input_timesteps=t_in, output_timesteps=t_out,
        canvas_size=shape, digit_size=(14, 14), pixel_noise=0.02,
        velocity_noise=0.0, seed=0,
    )
    xs_tr, ys_tr = ds.x[:n_train], ds.y[:n_train]
    xs_va, ys_va = ds.x[n_train:], ds.y[n_train:]

    report = {}

    # ---- 1) transplant at init
    torch.manual_seed(0)
    tm = Seq2SeqT(hidden, n_layers, n_conv_layers)
    report["transplant_init"] = transplant_check(
        shape, t_in, t_out, hidden, n_layers, n_conv_layers, xs_va, ys_va,
        torch_model=tm,
    )
    print("transplant@init:", json.dumps(report["transplant_init"], indent=2))

    # ---- 2) train the torch reference, transplant trained weights
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    for ep in range(epochs):
        losses = [
            run_sample(tm, opt, xs_tr[i], ys_tr[i]) for i in range(n_train)
        ]
        print(f"torch epoch {ep}: loss {np.mean(losses):.5f}")
        for g in opt.param_groups:  # StepLR(3, 0.95) like ref mpnnlstm.py:175
            g["lr"] = lr * (0.95 ** ((ep + 1) // 3))
    report["transplant_trained"] = transplant_check(
        shape, t_in, t_out, hidden, n_layers, n_conv_layers, xs_va, ys_va,
        torch_model=tm,
    )
    print(
        "transplant@trained:",
        json.dumps(report["transplant_trained"], indent=2),
    )

    # ---- 3) independently trained JAX model, same data/hparams
    pred = NextFramePredictorS2S(
        image_shape=shape, thresh=0.1, experiment_name="parity",
        decompose=True, input_features=1, input_timesteps=t_in,
        output_timesteps=t_out,
        model_kwargs=dict(
            hidden_size=hidden, dropout=0.0, n_layers=n_layers,
            n_conv_layers=n_conv_layers, convolution_type="ChebConv",
        ),
        graph_kwargs=dict(max_grid_size=8),
    )
    from quadtree_mpnnlstm_tpu.data.loader import ArrayDataset

    launch = np.zeros((len(xs_tr),), np.int64)
    loader_tr = DataLoader(
        ArrayDataset(xs_tr, ys_tr, launch), batch_size=1, shuffle=False
    )
    loader_va = DataLoader(
        ArrayDataset(xs_va, ys_va, np.zeros((len(xs_va),), np.int64)),
        batch_size=1,
    )
    pred.train(loader_tr, loader_va, n_epochs=epochs, lr=lr, lr_decay=0.95)
    yhat = pred.predict(loader_va)
    jax_next = float(np.mean((yhat[:, 0] - ys_va[:, 0]) ** 2))
    jax_full = float(np.mean((yhat - ys_va) ** 2))
    report["independent_training"] = {
        "torch_next_frame_mse": report["transplant_trained"][
            "torch_next_frame_mse"
        ],
        "jax_next_frame_mse": jax_next,
        "next_frame_mse_diff": abs(
            jax_next - report["transplant_trained"]["torch_next_frame_mse"]
        ),
        "torch_rollout_mse": report["transplant_trained"]["torch_rollout_mse"],
        "jax_rollout_mse": jax_full,
    }
    print(
        "independent training:",
        json.dumps(report["independent_training"], indent=2),
    )

    report["config"] = dict(
        shape=list(shape), t_in=t_in, t_out=t_out, hidden=hidden,
        n_layers=n_layers, n_conv_layers=n_conv_layers, n_train=n_train,
        n_val=n_val, epochs=epochs, lr=lr, thresh=0.1, max_grid_size=8,
    )
    with open("PARITY.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote PARITY.json")


if __name__ == "__main__":
    main()

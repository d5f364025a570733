"""CLI smoke tests: the experiment drivers run end-to-end on synthetic data
(the reference's only integration test is a notebook, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_mnist_demo_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from quadtree_mpnnlstm_tpu.cli import mnist_demo

    scores = mnist_demo.main([
        "--canvas", "16", "--digit", "8", "--train-samples", "8",
        "--epochs", "1", "--batch-size", "4", "--thresh", "0.1",
        "--t-out", "3", "--sweep-thresholds",
    ])
    assert np.isfinite(scores["RMSE"])


@pytest.mark.slow
def test_ice_exp_synthetic_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from quadtree_mpnnlstm_tpu.cli import ice_exp

    ice_exp.main([
        "-m", "6", "-e", "1", "--synthetic", "--epochs", "1",
        "--batch-size", "4", "--results-dir", str(tmp_path / "res"),
        "--mesh-png",
    ])
    files = os.listdir(tmp_path / "res")
    assert any(f.startswith("loss_") for f in files)
    assert any(f.startswith("valpredictions_") for f in files)
    assert any(f.endswith(".msgpack") for f in files)
    assert any(f.startswith("mesh_hir_") for f in files)
    loss_file = next(f for f in files if f.startswith("loss_"))
    loss = json.load(open(tmp_path / "res" / loss_file))
    assert np.isfinite(loss["train_loss"]).all()


def test_hir_densifies_corridor():
    """The synthetic shipping corridor forces quadtree splits: node count at
    thresh=+inf (splits only at mask/HIR overlap) must rise with HIR on
    (ref ice_exp.py:122,203 wiring; quadtree HIR force-split
    graph_functions.py:241-244)."""
    import jax.numpy as jnp

    from quadtree_mpnnlstm_tpu.cli.ice_exp import synthetic_hir
    from quadtree_mpnnlstm_tpu.config import GraphConfig
    from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
    from quadtree_mpnnlstm_tpu.utils import add_positional_encoding

    shape = (32, 32)
    hir = jnp.asarray(synthetic_hir(shape))
    cfg = GraphConfig(image_shape=shape, max_grid_size=8,
                      thresh=float("inf"))
    x = add_positional_encoding(jnp.zeros((1, *shape, 1)))
    g_off, _ = image_to_graph(x, cfg)
    g_on, _ = image_to_graph(x, cfg, high_interest_region=hir)
    assert int(g_on.n_nodes) > int(g_off.n_nodes)


@pytest.mark.slow
def test_ice_profile_runs(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    from quadtree_mpnnlstm_tpu.cli import ice_profile

    ice_profile.main(["--crop", "16", "--epochs", "1", "--batch-size", "2"])
    out = capsys.readouterr().out
    assert "[phase] train" in out and "[phase] predict" in out


def test_sweep_commands():
    from quadtree_mpnnlstm_tpu.parallel.sweep import sweep_commands

    cmds = sweep_commands(months=(6, 7), exp=3, extra_args=("--synthetic",))
    assert len(cmds) == 2
    assert cmds[0][-3:] == ["-e", "3", "--synthetic"]


@pytest.mark.slow
def test_multires_warmstart_transplant_transformerconv():
    """exp-3 multires warm-start: the half-res model's param tree must be
    transplantable onto the full-res model (``model.params = half.params``,
    cli/ice_exp.py). Advisor round-3 (high): the half model used to leave
    fused_gates at its default True while the full model passed False, so
    with TransformerConv (ATTN_FUSABLE) the trees diverged and exp 3
    crashed at the transplant. Mirrors ice_exp's kwargs for exp=3."""
    import jax

    from quadtree_mpnnlstm_tpu.cli.ice_exp import (
        NEG_INF,
        dist_from_05,
        experiment_config,
    )
    from quadtree_mpnnlstm_tpu.train.predictor import NextFramePredictorS2S

    cfg = experiment_config(3)
    assert cfg["multires_training"] and not cfg["preset_mesh"]
    common = dict(
        thresh=NEG_INF,
        input_features=5,
        input_timesteps=2,
        output_timesteps=2,
        transform_func=dist_from_05,
        # both phases must agree (False/True widens the decoder head by
        # the climatology concat channel and breaks the transplant)
        use_climatology=True,
        model_kwargs=dict(
            hidden_size=8, dropout=0.1, n_layers=1, n_conv_layers=3,
            rnn_type="LSTM", convolution_type=cfg["convolution_type"],
            fused_gates=bool(cfg["preset_mesh"]),
        ),
        graph_kwargs=dict(aggregation="grid"),
    )
    model = NextFramePredictorS2S(image_shape=(16, 24), **common)
    model_half = NextFramePredictorS2S(image_shape=(8, 12), **common)
    model.get_n_params()  # materialize both param trees
    model_half.get_n_params()

    full_shapes = jax.tree.map(lambda a: a.shape, model.params)
    half_shapes = jax.tree.map(lambda a: a.shape, model_half.params)
    assert full_shapes == half_shapes  # graph convs are resolution-agnostic
    model.params = model_half.params  # the exp-3 warm-start assignment


def test_bench_dead_backend_contract():
    """Driver contract when the TPU tunnel is down (round-3 postmortem,
    BENCH_r03.json rc=124): bench.py must exit 0 and print exactly one
    parseable JSON line that names the failure and carries the last
    builder-measured numbers, clearly labeled as not from this run."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # A probe budget no backend can meet -> deterministic dead-backend
    # path whether or not the tunnel is actually up.
    env["BENCH_PROBE_TIMEOUT_S"] = "0.01"
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=repo, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert payload["value"] == 0.0
    assert "error" in payload
    assert "vs_baseline" in payload
    last = payload.get("last_known_tpu_fps_not_this_run", {})
    assert last.get("ice_grid_b1")  # BENCH_DETAIL.json is committed

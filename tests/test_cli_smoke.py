"""CLI smoke tests: the experiment drivers run end-to-end on synthetic data
(the reference's only integration test is a notebook, SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest


def test_mnist_demo_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from quadtree_mpnnlstm_tpu.cli import mnist_demo

    scores = mnist_demo.main([
        "--canvas", "16", "--digit", "8", "--train-samples", "8",
        "--epochs", "1", "--batch-size", "4", "--thresh", "0.1",
        "--t-out", "3", "--sweep-thresholds",
    ])
    assert np.isfinite(scores["RMSE"])


def test_ice_exp_synthetic_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from quadtree_mpnnlstm_tpu.cli import ice_exp

    ice_exp.main([
        "-m", "6", "-e", "1", "--synthetic", "--epochs", "1",
        "--batch-size", "4", "--results-dir", str(tmp_path / "res"),
    ])
    files = os.listdir(tmp_path / "res")
    assert any(f.startswith("loss_") for f in files)
    assert any(f.startswith("valpredictions_") for f in files)
    assert any(f.endswith(".msgpack") for f in files)
    loss_file = next(f for f in files if f.startswith("loss_"))
    loss = json.load(open(tmp_path / "res" / loss_file))
    assert np.isfinite(loss["train_loss"]).all()


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

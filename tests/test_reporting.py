"""Reporting + profiling smoke: plots render to files, history round-trips,
step timer accumulates."""

import json
import os

import numpy as np


def test_plots_render(tmp_path):
    from qasr_ijcnlp_tpu.reporting import (
        plot_cer_distribution,
        plot_metrics_distribution,
        plot_training_results,
    )

    cers = list(np.random.default_rng(0).random(50))
    p1 = plot_cer_distribution(cers, str(tmp_path / "cer.png"))
    p2 = plot_metrics_distribution(
        {"cer": cers, "wer": cers}, str(tmp_path / "metrics.png")
    )
    epochs = [
        {"epoch": i, "train_loss": 1.0 / (i + 1), "val_cer": 0.5 - 0.01 * i}
        for i in range(5)
    ]
    p3 = plot_training_results(epochs, str(tmp_path / "train.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_history_round_trip(tmp_path):
    from qasr_ijcnlp_tpu.train.checkpoint import TrainingHistory

    h = TrainingHistory(str(tmp_path / "hist.json"))
    h.config = {"lr": 1e-3}
    h.log(epoch=0, train_loss=1.5)
    h.log(epoch=1, train_loss=1.2)
    loaded = TrainingHistory.load(str(tmp_path / "hist.json"))
    assert loaded.config == {"lr": 1e-3}
    assert len(loaded.epochs) == 2
    assert loaded.epochs[1]["train_loss"] == 1.2


def test_analyze_predictions_orders():
    from qasr_ijcnlp_tpu.reporting import analyze_predictions

    lines = []
    rows = analyze_predictions(
        ["abc", "xyz"], ["abc", "abc"], num_samples=1, log=lines.append
    )
    assert rows[0]["cer"] == 0.0 and rows[1]["cer"] == 1.0
    assert any("Best" in l for l in lines)


def test_step_timer():
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.profiling import StepTimer

    timer = StepTimer()
    out = timer.timed("square", lambda x: x * x, jnp.arange(8))
    assert out is not None
    s = timer.summary()
    assert s["square"]["count"] == 1 and s["square"]["total_s"] > 0
    lines = []
    timer.report(log=lines.append)
    assert lines


def test_save_results_json(tmp_path):
    from qasr_ijcnlp_tpu.reporting import save_results_json

    path = save_results_json(str(tmp_path / "r.json"), {"wer": 0.1})
    data = json.load(open(path))
    assert data["wer"] == 0.1 and "timestamp" in data

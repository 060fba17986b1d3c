"""Reporting: prediction analysis, metric-distribution plots, result JSONs.

Equivalents of the reference's reporting half of utils.py
(/root/reference/utils.py:141-473): ``analyze_predictions``,
``plot_cer_distribution`` / ``plot_metrics_distribution`` /
``plot_training_results``, JSON history/result savers, and the console
pretty-printers.  Matplotlib uses the Agg backend (headless TPU hosts).
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Dict, List

import numpy as np

from . import metrics as qmetrics


def analyze_predictions(
    predictions: List[str], targets: List[str], num_samples: int = 5,
    log=print,
) -> List[Dict]:
    """Show best/worst samples by per-sample CER (utils.py:141-184)."""
    rows = []
    for pred, tgt in zip(predictions, targets):
        cer = (
            qmetrics.levenshtein(tgt, pred) / len(tgt)
            if len(tgt)
            else (0.0 if not pred else 1.0)
        )
        rows.append({"prediction": pred, "target": tgt, "cer": cer})
    ordered = sorted(rows, key=lambda r: r["cer"])
    log(f"\nBest {num_samples} predictions:")
    for r in ordered[:num_samples]:
        log(f"  CER={r['cer']:.3f}  '{r['prediction'][:60]}' vs '{r['target'][:60]}'")
    log(f"\nWorst {num_samples} predictions:")
    for r in ordered[-num_samples:]:
        log(f"  CER={r['cer']:.3f}  '{r['prediction'][:60]}' vs '{r['target'][:60]}'")
    return rows


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_cer_distribution(cers: List[float], save_path: str = "cer_distribution.png"):
    if not cers:
        return None  # nothing to plot
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.hist(cers, bins=30, edgecolor="black", alpha=0.75)
    ax.axvline(float(np.mean(cers)), linestyle="--", color="red",
               label=f"mean {np.mean(cers):.3f}")
    ax.set_xlabel("Character Error Rate")
    ax.set_ylabel("Count")
    ax.set_title("CER distribution")
    ax.legend()
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def plot_metrics_distribution(
    per_sample: Dict[str, List[float]], save_path: str = "metrics_distribution.png"
):
    """One histogram panel per metric (utils.py:221-276)."""
    plt = _plt()
    names = [n for n in per_sample if len(per_sample[n])]
    if not names:
        return None  # nothing to plot (all metrics skipped/empty)
    fig, axes = plt.subplots(1, len(names), figsize=(6 * len(names), 4.5))
    if len(names) == 1:
        axes = [axes]
    for ax, name in zip(axes, names):
        vals = per_sample[name]
        ax.hist(vals, bins=30, edgecolor="black", alpha=0.75)
        ax.axvline(float(np.mean(vals)), linestyle="--", color="red",
                   label=f"mean {np.mean(vals):.3f}")
        ax.set_title(name)
        ax.legend()
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def plot_training_results(
    history_epochs: List[dict], save_path: str = "training_results.png"
):
    """Loss + metric curves from a TrainingHistory (utils.py:278-356)."""
    plt = _plt()
    keys = [k for k in history_epochs[0] if k not in ("epoch", "time_s")]
    n = len(keys)
    cols = min(n, 3)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 4 * rows),
                             squeeze=False)
    xs = [e.get("epoch", i) for i, e in enumerate(history_epochs)]
    for i, key in enumerate(keys):
        ax = axes[i // cols][i % cols]
        ax.plot(xs, [e.get(key) for e in history_epochs], marker="o")
        ax.set_xlabel("epoch")
        ax.set_title(key)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


def save_results_json(path: str, results: dict) -> str:
    """Timestamped result JSON (the reference's *_evaluation_results.json
    pattern, e.g. evaluate_pretrained_whisper.py:182-205)."""
    results = {**results, "timestamp": datetime.now().isoformat()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    return path


def print_model_info(name: str, n_params: int, n_trainable: int, log=print):
    log(f"Model: {name}")
    log(f"  total parameters:     {n_params:,}")
    log(f"  trainable parameters: {n_trainable:,}"
        f" ({100.0 * n_trainable / max(n_params, 1):.2f}%)")


def print_training_header(task: str, epochs: int, lr: float, batch_size: int,
                          log=print):
    log("=" * 60)
    log(f"Training: {task}")
    log(f"  epochs={epochs}  lr={lr}  batch_size={batch_size}  "
        f"backend={_backend_name()}")
    log("=" * 60)


def _backend_name() -> str:
    try:
        import jax

        return f"{jax.default_backend()} x{jax.device_count()}"
    except Exception:
        return "unknown"

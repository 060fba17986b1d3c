"""Checkpointing: orbax pytree checkpoints + JSON history + best-k tracking.

The reference saves ``state_dict`` .pth files per tracked metric — dual
best-CER/WER (/root/reference/train_quantum_whisper_asr.py:245-265), triple
best-acc/loss/WER (train_quantum_whisper.py:279-296), best+optimizer-state+
periodic epochs (train_classical_whisper_asr.py:500-525) — plus
``*_training_history.json`` files (utils.py:358-366).  This module provides
the same strategies over orbax, adds the resume path the reference never
wired (SURVEY.md §5 "No resume flag"), and can export the Whisper trunk back
to the official ``.pt`` format via models.convert for interop.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np


def _np_tree(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def _leaf_dtype(leaf):
    """dtype of a template leaf WITHOUT materializing it to host — a sharded
    jax.Array exposes .dtype directly; np.asarray would gather the whole
    (possibly multi-GB) buffer device→host just to read the same field."""
    dt = getattr(leaf, "dtype", None)
    return dt if dt is not None else np.asarray(leaf).dtype


def save_pytree(path: str, tree: Any, metadata: Optional[dict] = None) -> None:
    """Save a pytree checkpoint (orbax if available, pickle fallback)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _np_tree(tree), force=True)
    except Exception as e:
        import pickle
        import warnings

        with open(path + ".pkl", "wb") as f:
            pickle.dump(_np_tree(tree), f)
        warnings.warn(
            f"orbax save of {path} failed ({type(e).__name__}: {e}); "
            f"wrote pickle fallback {path}.pkl instead"
        )
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def _newest_format(path: str) -> str:
    """'orbax' | 'pkl' — whichever copy of the checkpoint is newer, so a
    pickle written by save_pytree's fallback is never shadowed by a stale
    orbax directory from an earlier epoch (and vice versa)."""
    has_dir = os.path.isdir(path)
    pkl = path + ".pkl"
    has_pkl = os.path.exists(pkl)
    if has_dir and has_pkl:
        return "orbax" if os.path.getmtime(path) >= os.path.getmtime(pkl) else "pkl"
    return "pkl" if has_pkl else "orbax"


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    if _newest_format(path) == "pkl":
        import pickle

        with open(path + ".pkl", "rb") as f:
            restored = pickle.load(f)
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
    if target is not None:
        import jax

        restored = jax.tree.map(
            lambda t, r: np.asarray(r).astype(_leaf_dtype(t)), target, restored
        )
    return restored


def load_metadata(path: str) -> Optional[dict]:
    meta = path + ".meta.json"
    if os.path.exists(meta):
        with open(meta) as f:
            return json.load(f)
    return None


@dataclass
class BestTracker:
    """Keeps the best checkpoint per metric (lower- or higher-is-better)."""

    directory: str
    metrics: Dict[str, str]  # name -> "min" | "max"
    best: Dict[str, float] = field(default_factory=dict)

    def seed_from_disk(self) -> Dict[str, float]:
        """Re-seed ``best`` from existing ``best_<metric>.meta.json`` files.

        Called on resume so the first post-resume validation competes
        against the pre-interrupt best instead of overwriting
        ``best_<metric>`` with whatever value it happens to produce."""
        for name in self.metrics:
            meta = load_metadata(os.path.join(self.directory, f"best_{name}"))
            if meta is not None and "value" in meta:
                try:
                    self.best[name] = float(meta["value"])
                except (TypeError, ValueError):
                    pass
        return dict(self.best)

    def update(self, values: Dict[str, float], tree: Any,
               metadata: Optional[dict] = None) -> Dict[str, bool]:
        """Check each tracked metric; save ``best_<metric>`` on improvement."""
        improved = {}
        for name, mode in self.metrics.items():
            if name not in values:
                continue
            v = float(values[name])
            cur = self.best.get(name)
            better = cur is None or (v < cur if mode == "min" else v > cur)
            improved[name] = better
            if better:
                self.best[name] = v
                save_pytree(
                    os.path.join(self.directory, f"best_{name}"),
                    tree,
                    {**(metadata or {}), "metric": name, "value": v},
                )
        return improved


class TrainingHistory:
    """Per-epoch metric log with JSON persistence (reference
    ``save_training_history``, utils.py:358-366)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.epochs: list = []
        self.config: dict = {}

    def log(self, **metrics) -> dict:
        entry = {k: (float(v) if isinstance(v, (int, float, np.floating)) else v)
                 for k, v in metrics.items()}
        self.epochs.append(entry)
        if self.path:
            self.save(self.path)
        return entry

    def to_dict(self) -> dict:
        return {"config": self.config, "epochs": self.epochs}

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)

    @classmethod
    def load(cls, path: str) -> "TrainingHistory":
        h = cls(path)
        with open(path) as f:
            data = json.load(f)
        h.config = data.get("config", {})
        h.epochs = data.get("epochs", [])
        return h


def save_train_state(path: str, state, metadata: Optional[dict] = None) -> None:
    """Save a FULL TrainState (params + optimizer moments + step counter).

    Beyond the reference's params-only ``.pth`` saves: restoring this
    resumes optimization exactly (Adam moments and the schedule step come
    back too).  Sharded states save transparently in a single-process run —
    leaves gather to host on save and re-shard on restore via ``mesh``.

    The leaf list is keyed by index so restore only needs a structurally
    identical template (optax states nest NamedTuples, which generic
    checkpoint formats don't round-trip by themselves).
    """
    import jax

    leaves = jax.tree.leaves(state)
    save_pytree(
        path, {f"{i:05d}": leaf for i, leaf in enumerate(leaves)}, metadata
    )


def restore_train_state(path: str, template, mesh=None, fsdp: bool = False):
    """Restore a TrainState saved by :func:`save_train_state`.

    ``template`` is a structurally matching state (e.g. a fresh
    ``train.init_state(params, tx)``); leaf dtypes are coerced to the
    template's.  With ``mesh``, the restored state is placed with its
    TP/replicated shardings (``train.shard_state``) ready for the sharded
    step; ``fsdp=True`` re-slices params + moments along the data axis
    (resume works across layouts — the save gathers to host).
    """
    import jax

    leaves = jax.tree.leaves(template)
    restored = load_pytree(path)
    new = [
        np.asarray(restored[f"{i:05d}"]).astype(_leaf_dtype(t))
        for i, t in enumerate(leaves)
    ]
    state = jax.tree.unflatten(jax.tree.structure(template), new)
    if mesh is not None:
        from .step import shard_state

        state = shard_state(state, mesh, fsdp=fsdp)
    return state


def save_whisper_pt(path: str, params, dims) -> None:
    """Export the Whisper trunk in the official checkpoint format so the
    PyTorch reference can load it (models/convert.save_torch_checkpoint)."""
    from ..models.convert import save_torch_checkpoint

    save_torch_checkpoint(path, params, dims)

"""Epoch-driven trainers for the three task families.

Functional equivalents of the reference trainers, with their checkpoint
strategies and history files, minus their defects (SURVEY.md §2.4):

* char-level ASR (quantum or classical encoder + MLP/LSTM char decoder) —
  /root/reference/train_quantum_whisper_asr.py:130-267.  Validation CER/WER
  is computed from REAL greedy decoding (the reference scored placeholder
  strings, :217-218).
* classification (Speech Commands / LibriSpeech-as-classification) —
  /root/reference/train_quantum_whisper.py:171-300, with the triple
  best-acc/loss/WER checkpointing; the "WER over stringified class ids"
  metric is reproduced deliberately (:131-144).
* token-level Whisper ASR — /root/reference/train_classical_whisper_asr.py:
  178-321 with AdamW(0.9,0.98,1e-6) + warmup-cosine and best-WER checkpoints.

Each trainer jits ONE step function (batch shapes static via pad_batch_to)
and streams batches through the device prefetcher.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import metrics as qmetrics
from ..data import CharVocabulary, END, PAD, START
from ..data.loader import DataLoader, pad_batch_to, prefetch_to_device
from ..models import asr as asr_model
from ..models import classifier as clf_model
from ..models import whisper as cmodel
from ..models.quantum import quantum_encoder_apply
from .checkpoint import BestTracker, TrainingHistory
from .loss import masked_cross_entropy
from .step import init_state, make_train_step


def _own(tree):
    """Copy a param tree so the donating jitted step never consumes the
    caller's arrays (donation would delete them)."""
    return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)


def encoder_fn_for(model_obj) -> Callable:
    """(params_enc, mel) -> (B, Ta, D) for classical or quantum encoders."""
    dims = model_obj.dims
    quantum = "qconv1" in model_obj.params["encoder"]

    def apply(enc_params, mel):
        if quantum:
            return quantum_encoder_apply(enc_params, mel, dims)
        return cmodel.encoder_apply(enc_params, mel, dims)

    return apply


# ---------------------------------------------------------------------------
# Char-level ASR
# ---------------------------------------------------------------------------


def char_asr_loss_fn(encoder_apply: Callable, head_kind: str) -> Callable:
    """(params {encoder, head}, mel, char_ids) -> CE over next-char targets,
    ignoring <PAD> (the reference's CE(ignore_index=0), :164-171 — with the
    output/target rows correctly aligned)."""

    def loss(params, mel, char_ids):
        enc = encoder_apply(params["encoder"], mel)
        if head_kind == "lstm":
            logits = asr_model.lstm_teacher_forced(params["head"], enc, char_ids)
        else:
            logits = asr_model.mlp_head_char_logits(params["head"], enc, char_ids)
        targets = char_ids[:, 1:]
        return masked_cross_entropy(logits, targets, ignore_index=PAD)

    return loss


def _cached_jit(cache, key, builder):
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = jax.jit(builder())
        # Bounded LRU: keys capture encoder closures, so an unbounded cache
        # would pin compiled executables for every model ever evaluated in
        # the process.
        while len(cache) > _EVAL_JITS_MAX:
            cache.popitem(last=False)
    else:
        cache.move_to_end(key)
    return fn


from collections import OrderedDict  # noqa: E402

_EVAL_JITS: "OrderedDict" = OrderedDict()
_EVAL_JITS_MAX = 32


def _epoch_stats(step_metrics) -> Dict[str, float]:
    """Aggregate per-step metric dicts (device scalars) in ONE host transfer
    per epoch — appending ``float(m['loss'])`` per step would block dispatch
    on every iteration and starve the prefetch pipeline.

    Batches skipped by the non-finite guard keep their inf/NaN loss out of
    the epoch mean and are surfaced as ``skipped`` so the guard is visible.
    """
    if not step_metrics:
        return {"train_loss": 0.0, "skipped": 0}
    losses = np.asarray(jax.device_get([m["loss"] for m in step_metrics]),
                        dtype=np.float64)
    skipped = int(np.sum(jax.device_get([m["skipped"] for m in step_metrics])))
    finite = losses[np.isfinite(losses)]
    return {
        "train_loss": float(finite.mean()) if finite.size else 0.0,
        "skipped": skipped,
    }


def evaluate_char_asr(
    params,
    encoder_apply: Callable,
    head_kind: str,
    loader: DataLoader,
    vocab: CharVocabulary,
    max_len: int = 100,
    real_decode: bool = False,
) -> Dict[str, float]:
    """Greedy-decode validation with real CER/WER.

    ``real_decode`` switches the MLP head from the reference's optimistic
    teacher-forced argmax to true autoregressive greedy decoding
    (:func:`models.asr.mlp_greedy_decode`); the LSTM head always decodes
    autoregressively."""
    preds, refs, losses = [], [], []
    # jit wrappers cached per (encoder, head) so per-epoch validation reuses
    # the compiled programs instead of rebuilding closures each call.
    jloss = _cached_jit(
        _EVAL_JITS, ("char_loss", encoder_apply, head_kind),
        lambda: char_asr_loss_fn(encoder_apply, head_kind),
    )
    embed = _cached_jit(
        _EVAL_JITS, ("embed", encoder_apply),
        lambda: (lambda params, mel: encoder_apply(params["encoder"], mel)),
    )

    for batch in loader:
        # Padded rows are filled with <PAD> targets, so the masked CE gives
        # them zero weight (the loss matches the unpadded batch exactly).
        (mel, char_ids), real = pad_batch_to(batch, loader.batch_size,
                                             (None, PAD))
        losses.append(float(jloss(params, mel, char_ids)))
        if head_kind == "lstm":
            out, _ = asr_model.lstm_greedy_decode(
                params["head"], embed(params, mel), START, END, max_len
            )
            out = np.asarray(out)
        elif real_decode:
            out, _ = asr_model.mlp_greedy_decode(
                params["head"], embed(params, mel), START, END, max_len
            )
            out = np.asarray(out)
        else:
            # Teacher-forced argmax — the reference's optimistic validation
            # quirk, kept as the default for parity (real_decode opts out).
            tf_argmax = _cached_jit(
                _EVAL_JITS, ("tf_argmax", encoder_apply),
                lambda: (lambda p, m_, ids: jnp.argmax(
                    asr_model.mlp_head_char_logits(
                        p["head"], encoder_apply(p["encoder"], m_), ids
                    ),
                    axis=-1,
                )),
            )
            out = np.asarray(tf_argmax(params, mel, char_ids))
        for b in range(real):
            preds.append(vocab.decode(out[b]))
            refs.append(vocab.decode(np.asarray(char_ids[b][1:])))
    return {
        "loss": float(np.mean(losses)) if losses else 0.0,
        "cer": qmetrics.calculate_cer(preds, refs),
        "wer": qmetrics.calculate_wer(preds, refs),
    }


def train_char_asr(
    params: Dict,
    encoder_apply: Callable,
    train_loader: DataLoader,
    val_loader: Optional[DataLoader],
    vocab: CharVocabulary,
    *,
    head_kind: str = "lstm",
    epochs: int = 10,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    trainable_mask: Optional[Dict] = None,
    checkpoint_dir: str = "checkpoints/char_asr",
    history_path: Optional[str] = None,
    resume_from: Optional[str] = None,
    real_decode: bool = False,
    log: Callable = print,
) -> Dict:
    """AdamW + cosine, grad-clip 1.0, dual best-CER/WER checkpoints.

    ``resume_from`` restores a prior checkpoint's params before training -
    the resume capability the reference documents but never wires
    (SURVEY.md §5 "No resume flag")."""
    from .schedule import cosine
    from .step import make_optimizer

    if resume_from:
        from .checkpoint import load_pytree

        params = load_pytree(resume_from, target=params)
        log(f"resumed params from {resume_from}")

    steps_per_epoch = max(len(train_loader), 1)
    tx = make_optimizer(
        cosine(learning_rate, epochs * steps_per_epoch),
        weight_decay=weight_decay,
        trainable_mask=trainable_mask,
    )
    state = init_state(_own(params), tx)
    step = jax.jit(make_train_step(char_asr_loss_fn(encoder_apply, head_kind), tx),
                   donate_argnums=(0,))

    tracker = BestTracker(checkpoint_dir, {"cer": "min", "wer": "min"})
    if resume_from:
        tracker.seed_from_disk()
    history = TrainingHistory(history_path)
    history.config = {
        "head": head_kind, "epochs": epochs, "lr": learning_rate,
        "num_chars": vocab.num_chars,
    }

    for epoch in range(epochs):
        t0 = time.time()
        step_metrics = []
        for batch in prefetch_to_device(iter(train_loader)):
            (mel, char_ids), _ = pad_batch_to(batch, train_loader.batch_size,
                                              (None, PAD))
            state, m = step(state, mel, char_ids)
            step_metrics.append(m)
        entry = {
            "epoch": epoch,
            **_epoch_stats(step_metrics),
            "time_s": time.time() - t0,
        }
        if val_loader is not None:
            val = evaluate_char_asr(
                state.params, encoder_apply, head_kind, val_loader, vocab,
                real_decode=real_decode,
            )
            entry.update({f"val_{k}": v for k, v in val.items()})
            tracker.update(
                {"cer": val["cer"], "wer": val["wer"]},
                state.params,
                {"epoch": epoch, "char_vocab": vocab.to_json()},
            )
        history.log(**entry)
        log(f"epoch {epoch}: " + "  ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in entry.items()))
    return {"params": state.params, "history": history, "tracker": tracker}


# ---------------------------------------------------------------------------
# Classification
# ---------------------------------------------------------------------------


def classifier_loss_fn(encoder_apply: Callable) -> Callable:
    def loss(params, mel, labels):
        enc = encoder_apply(params["encoder"], mel)
        logits = clf_model.classifier_apply(params["head"], enc)
        # Negative labels mark batch-padding rows; mask them out of the mean
        # so a padded final batch weights samples exactly once.
        valid = (labels >= 0).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(labels, 0)
        )
        return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    return loss


def evaluate_classifier(
    params, encoder_apply: Callable, loader: DataLoader
) -> Dict[str, float]:
    def _build():
        def infer(params, mel):
            enc = encoder_apply(params["encoder"], mel)
            return clf_model.classifier_apply(params["head"], enc)

        return infer

    infer = _cached_jit(_EVAL_JITS, ("clf_infer", encoder_apply), _build)

    correct = total = 0
    losses, pred_ids, true_ids = [], [], []
    for batch in loader:
        (mel, labels), real = pad_batch_to(batch, loader.batch_size)
        logits = np.asarray(infer(params, mel))
        pred = logits.argmax(-1)
        labels = np.asarray(labels)
        losses.append(
            float(
                np.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        jnp.asarray(logits[:real]), jnp.asarray(labels[:real])
                    )
                )
            )
        )
        correct += int((pred[:real] == labels[:real]).sum())
        total += real
        pred_ids.extend(str(p) for p in pred[:real])
        true_ids.extend(str(t) for t in labels[:real])
    # "WER" over stringified class ids - the reference's quirky metric
    # (train_quantum_whisper.py:131-144), kept for checkpoint parity.
    wer = qmetrics.calculate_wer(pred_ids, true_ids)
    return {
        "loss": float(np.mean(losses)) if losses else 0.0,
        "accuracy": correct / max(total, 1),
        "wer": wer,
    }


def train_classifier(
    params: Dict,
    encoder_apply: Callable,
    train_loader: DataLoader,
    val_loader: Optional[DataLoader],
    *,
    epochs: int = 10,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    trainable_mask: Optional[Dict] = None,
    checkpoint_dir: str = "checkpoints/classifier",
    history_path: Optional[str] = None,
    log: Callable = print,
) -> Dict:
    """AdamW + cosine; triple best-acc/loss/WER checkpoints
    (train_quantum_whisper.py:279-296)."""
    from .schedule import cosine
    from .step import make_optimizer

    steps_per_epoch = max(len(train_loader), 1)
    tx = make_optimizer(
        cosine(learning_rate, epochs * steps_per_epoch),
        weight_decay=weight_decay,
        trainable_mask=trainable_mask,
    )
    state = init_state(_own(params), tx)
    step = jax.jit(make_train_step(classifier_loss_fn(encoder_apply), tx),
                   donate_argnums=(0,))

    tracker = BestTracker(
        checkpoint_dir, {"accuracy": "max", "loss": "min", "wer": "min"}
    )
    history = TrainingHistory(history_path)
    history.config = {"epochs": epochs, "lr": learning_rate}

    for epoch in range(epochs):
        t0 = time.time()
        step_metrics = []
        for batch in prefetch_to_device(iter(train_loader)):
            (mel, labels), _ = pad_batch_to(batch, train_loader.batch_size,
                                            (None, -1))
            state, m = step(state, mel, labels)
            step_metrics.append(m)
        entry = {
            "epoch": epoch,
            **_epoch_stats(step_metrics),
            "time_s": time.time() - t0,
        }
        if val_loader is not None:
            val = evaluate_classifier(state.params, encoder_apply, val_loader)
            entry.update({f"val_{k}": v for k, v in val.items()})
            tracker.update(val, state.params, {"epoch": epoch})
        history.log(**entry)
        log(f"epoch {epoch}: " + "  ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in entry.items()))
    return {"params": state.params, "history": history, "tracker": tracker}


# ---------------------------------------------------------------------------
# Token-level Whisper ASR
# ---------------------------------------------------------------------------


def train_token_asr(
    params: Dict,
    dims,
    tokenizer,
    train_loader: DataLoader,
    val_loader: Optional[DataLoader],
    *,
    epochs: int = 10,
    learning_rate: float = 1e-4,
    warmup_steps: int = 500,
    weight_decay: float = 0.01,
    checkpoint_dir: str = "checkpoints/token_asr",
    history_path: Optional[str] = None,
    compute_dtype: str = "float32",
    mesh=None,
    fsdp: bool = False,
    grad_accum: int = 1,
    save_state_every: int = 0,
    resume_state: Optional[str] = None,
    log: Callable = print,
) -> Dict:
    """Classical token-level training (train_classical_whisper_asr.py:323-608):
    AdamW(0.9, 0.98, eps 1e-6) + linear-warmup-cosine, best-WER checkpoint.

    Pass a ``jax.sharding.Mesh`` to train SPMD: params/optimizer sharded by
    parallel.param_specs (TP on the 'model' axis), batches on 'data'.
    ``fsdp=True`` (ZeRO-3) additionally slices params + Adam moments along
    the data axis — per-device optimizer memory shrinks ~linearly with the
    data extent (parallel.param_specs fsdp mode).

    ``save_state_every`` > 0 writes a FULL TrainState (params + Adam moments
    + step) checkpoint every N epochs, and the best-WER save includes the
    full state too — mirroring the reference's best+optimizer-state+periodic
    strategy (:500-525).  ``resume_state`` restores such a checkpoint
    (re-sharded onto ``mesh``) and continues optimization exactly
    (tests/test_checkpoint.py pins resume parity).

    ``grad_accum`` > 1 accumulates gradients over that many microbatches per
    optimizer step (exact full-batch-mean equivalence — see
    step.make_accum_train_step); batch_size must be divisible by it."""
    import os

    from .checkpoint import restore_train_state, save_train_state
    from .schedule import warmup_cosine
    from .step import (
        make_accum_train_step,
        make_optimizer,
        make_sharded_train_step,
        shard_state,
        whisper_loss_fn,
        whisper_sum_loss_fn,
    )

    steps_per_epoch = max(len(train_loader), 1)
    tx = make_optimizer(
        warmup_cosine(learning_rate, warmup_steps, epochs * steps_per_epoch),
        weight_decay=weight_decay,
    )
    state = init_state(_own(params), tx)
    # With a mesh, the loss routes the encoder through the explicit
    # tensor/sequence-parallel shard_map trunk (parallel/sharded.py) and
    # keys the jit cache per mesh.
    loss_fn = whisper_loss_fn(dims, compute_dtype, mesh=mesh)
    accum_step = None
    if grad_accum > 1:
        accum_step = make_accum_train_step(
            whisper_sum_loss_fn(dims, compute_dtype, mesh=mesh), tx, grad_accum
        )
    if mesh is not None:
        state = shard_state(state, mesh, fsdp=fsdp)
        step = make_sharded_train_step(loss_fn, tx, mesh, step_fn=accum_step)
    else:
        step = jax.jit(accum_step or make_train_step(loss_fn, tx),
                       donate_argnums=(0,))
    start_epoch = 0
    if resume_state:
        state = restore_train_state(resume_state, state, mesh=mesh, fsdp=fsdp)
        # Resume the EPOCH loop where the restored optimizer step left off:
        # the step counter increments once per loader batch, so step //
        # steps_per_epoch is the number of completed epochs.  Without this
        # the LR schedule (whose horizon is epochs * steps_per_epoch) would
        # run past its cosine floor, epoch-keyed shuffles would replay from
        # epoch 0, and state_epoch_N saves would clobber earlier ones.
        start_epoch = min(int(state.step) // steps_per_epoch, epochs)
        for ldr in (train_loader, val_loader):
            if hasattr(ldr, "epoch"):
                ldr.epoch = start_epoch
        log(f"resumed full train state from {resume_state} "
            f"(step {int(state.step)}, continuing at epoch {start_epoch})")
    jloss = jax.jit(loss_fn)

    @jax.jit
    def tf_logits(params, mel, tokens):
        # Same dtype + mesh routing as the train/val loss — a separate fp32
        # no-mesh forward would compile (and hold) a second full program and
        # score WER under different numerics than the loss beside it.
        return cmodel.forward(
            params, mel, jnp.maximum(tokens, 0), dims,
            jnp.dtype(compute_dtype), mesh=mesh,
        )

    tracker = BestTracker(checkpoint_dir, {"wer": "min"})
    if resume_state:
        tracker.seed_from_disk()
    history = TrainingHistory(history_path)
    history.config = {"epochs": epochs, "lr": learning_rate, "warmup": warmup_steps}

    for epoch in range(start_epoch, epochs):
        t0 = time.time()
        step_metrics = []
        for batch in prefetch_to_device(iter(train_loader)):
            (mel, tokens), _ = pad_batch_to(batch, train_loader.batch_size,
                                            (None, -100))
            state, m = step(state, mel, tokens)
            step_metrics.append(m)
        entry = {
            "epoch": epoch,
            **_epoch_stats(step_metrics),
            "time_s": time.time() - t0,
        }
        if val_loader is not None:
            preds, refs, vlosses = [], [], []
            for batch in val_loader:
                (mel, tokens), real = pad_batch_to(batch, val_loader.batch_size,
                                                   (None, -100))
                vlosses.append(float(jloss(state.params, mel, tokens)))
                # Teacher-forced argmax decode, like the reference's
                # validation (:284-296; optimistic but cheap - documented).
                out = np.asarray(jnp.argmax(tf_logits(state.params, mel, tokens),
                                            axis=-1))
                tok_np = np.asarray(tokens)
                for b in range(real):
                    valid = tok_np[b] != -100
                    ref_ids = [t for t in tok_np[b][valid].tolist()
                               if t < tokenizer.eot]
                    hyp_rows = out[b][:-1][valid[1:]]
                    hyp_ids = [t for t in hyp_rows.tolist() if t < tokenizer.eot]
                    refs.append(tokenizer.decode(ref_ids))
                    preds.append(tokenizer.decode(hyp_ids))
            entry.update(
                val_loss=float(np.mean(vlosses)) if vlosses else 0.0,
                val_wer=qmetrics.calculate_wer(preds, refs),
                val_cer=qmetrics.calculate_cer(preds, refs),
            )
            improved = tracker.update(
                {"wer": entry["val_wer"]}, state.params, {"epoch": epoch}
            )
            if improved.get("wer") and save_state_every:
                # Best checkpoint with optimizer state, like the reference
                # (:500-511 saves model + optimizer state dicts together).
                save_train_state(
                    os.path.join(checkpoint_dir, "best_wer_state"),
                    state, {"epoch": epoch, "val_wer": entry["val_wer"]},
                )
        if save_state_every and (epoch + 1) % save_state_every == 0:
            save_train_state(
                os.path.join(checkpoint_dir, f"state_epoch_{epoch}"),
                state, {"epoch": epoch},
            )
        history.log(**entry)
        log(f"epoch {epoch}: " + "  ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in entry.items()))
    return {"params": state.params, "history": history, "tracker": tracker}

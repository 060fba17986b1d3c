"""Draft-model distillation for speculative decoding.

Speculative decoding (decode/speculative.py) pays off in proportion to how
often the draft's filtered argmax agrees with the target's — a randomly
initialized or off-domain draft accepts ~nothing.  This module trains a
small draft to imitate a frozen target ON THE TARGET'S OWN GREEDY OUTPUTS
(sequence-level distillation): the student sees exactly the (prefix ->
next-token) distribution the verifier will test it on, which directly
maximizes the acceptance rate rather than generic language-model quality.

No reference analog (the reference trains nothing smaller than its main
model); the trainer reuses the framework's own pieces: teacher labels come
from the jitted greedy loop, the student step is a standard
``make_train_step`` over a KL-to-teacher loss, and everything shards over a
mesh the same way whisper_loss_fn does.

Recipe (cli/distill_draft.py wires it):
  1. label: run the frozen target's greedy decode over audio batches,
  2. train: teacher-forced forward of BOTH models on the teacher tokens;
     loss = KL(teacher || student) at temperature tau (tau=1 equals CE to
     the teacher's soft distribution),
  3. measure: top-1 agreement on held-out teacher-forced positions — the
     direct proxy for the verifier's per-token acceptance probability.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import whisper as model
from ..models.dims import ModelDimensions
from .step import TrainState, init_state, make_train_step


def distill_loss_fn(
    t_dims: ModelDimensions,
    s_dims: ModelDimensions,
    compute_dtype="float32",
    tau: float = 1.0,
    mesh=None,
) -> Callable:
    """(s_params, t_params, mel, tokens) -> scalar distillation loss.

    KL(teacher || student) over the next-token distributions at every
    non-pad position (pad = -100, same convention as whisper_loss_fn).
    ``tau`` softens both distributions; the loss carries the standard
    tau^2 factor so gradient scale is tau-independent.
    """
    dt = jnp.dtype(compute_dtype)

    def loss_fn(s_params, t_params, mel, tokens):
        inputs = jnp.maximum(tokens, 0)
        t_logits = jax.lax.stop_gradient(
            model.forward(t_params, mel, inputs, t_dims, dt, mesh=mesh)
        )
        s_logits = model.forward(s_params, mel, inputs, s_dims, dt, mesh=mesh)
        # predict token t+1 from prefix ..t (shifted like shifted_token_loss)
        t_lp = jax.nn.log_softmax(t_logits[:, :-1].astype(jnp.float32) / tau)
        s_lp = jax.nn.log_softmax(s_logits[:, :-1].astype(jnp.float32) / tau)
        kl = jnp.sum(jnp.exp(t_lp) * (t_lp - s_lp), axis=-1)  # (B, T-1)
        mask = (tokens[:, 1:] != -100).astype(jnp.float32)
        return (tau * tau) * jnp.sum(kl * mask) / jnp.maximum(
            jnp.sum(mask), 1.0
        )

    return loss_fn


def make_teacher_labeler(
    target_model, sample_len: int = 48, language: str = "en"
) -> Callable[[np.ndarray], np.ndarray]:
    """mels (B, n_mels, T) -> teacher greedy tokens (B, L) padded with -100.

    Tokens INCLUDE the sot prompt prefix and the final eot, exactly the
    sequence shape the student is verified on; every batch pads to the same
    ``sample_begin + sample_len + 1`` so the train step compiles once.
    """
    from ..decode import DecodingOptions, _get_task

    options = DecodingOptions(
        language=language, sample_len=sample_len, without_timestamps=True,
        fp16=str(target_model.compute_dtype) != "float32",
    )
    task = _get_task(target_model, options)
    width = task.sample_begin + sample_len + 1

    def label(mels: np.ndarray) -> np.ndarray:
        results = task.run(jnp.asarray(mels))
        out = np.full((len(results), width), -100, np.int32)
        for i, r in enumerate(results):
            seq = list(task.initial_tokens) + list(r.tokens) + [
                task.tokenizer.eot
            ]
            out[i, : len(seq)] = seq[:width]
        return out

    return label


def agreement_rate(
    t_model, s_model, mels: np.ndarray, tokens: np.ndarray
) -> float:
    """Fraction of teacher-forced positions where the student's argmax
    matches the teacher's — the per-token acceptance-probability proxy
    the speculative verifier realizes (filters are shared, so raw-logit
    agreement tracks filtered agreement)."""
    agree, total = _agreement_jit(
        t_model.params, s_model.params, t_model.dims, s_model.dims,
        jnp.asarray(mels), jnp.asarray(tokens),
    )
    return float(agree) / max(float(total), 1.0)


@partial(jax.jit, static_argnames=("t_dims", "s_dims"))
def _agreement_jit(t_params, s_params, t_dims, s_dims, mel, tokens):
    inputs = jnp.maximum(tokens, 0)
    t_logits = model.forward(t_params, mel, inputs, t_dims, jnp.float32)
    s_logits = model.forward(s_params, mel, inputs, s_dims, jnp.float32)
    t_arg = jnp.argmax(t_logits[:, :-1], axis=-1)
    s_arg = jnp.argmax(s_logits[:, :-1], axis=-1)
    mask = tokens[:, 1:] != -100
    return jnp.sum((t_arg == s_arg) & mask), jnp.sum(mask)


def distill_draft(
    target_model,
    draft_model,
    mel_batches: Iterable[np.ndarray],
    steps: int,
    learning_rate: float = 1e-3,
    tau: float = 1.0,
    sample_len: int = 48,
    language: str = "en",
    mesh=None,
    log_every: int = 50,
    on_log: Optional[Callable[[int, float], None]] = None,
) -> Tuple[object, list]:
    """Train ``draft_model``'s params toward the frozen target; returns the
    updated draft model (params swapped in place) and the loss history.

    ``mel_batches`` yields (B, n_mels, T) arrays and is cycled as needed;
    teacher labels are computed once per distinct batch and cached (the
    teacher is frozen, so labels never change).
    """
    label = make_teacher_labeler(target_model, sample_len, language)
    loss_fn = distill_loss_fn(
        target_model.dims, draft_model.dims,
        compute_dtype=str(draft_model.compute_dtype), tau=tau, mesh=mesh,
    )
    tx = optax.adamw(learning_rate, b1=0.9, b2=0.98, eps=1e-6)
    step_fn = jax.jit(make_train_step(loss_fn, tx), donate_argnums=0)
    state = init_state(draft_model.params, tx)

    batches = list(mel_batches)
    labels = [None] * len(batches)
    history = []
    for i in range(steps):
        j = i % len(batches)
        if labels[j] is None:
            labels[j] = label(batches[j])
        state, metrics = step_fn(
            state, target_model.params, jnp.asarray(batches[j]),
            jnp.asarray(labels[j]),
        )
        if (i + 1) % log_every == 0 or i + 1 == steps:
            loss = float(metrics["loss"])
            history.append((i + 1, loss))
            if on_log is not None:
                on_log(i + 1, loss)

    draft_model.params = state.params
    return draft_model, history

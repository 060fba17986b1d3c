"""Sharded training step: optax AdamW + grad-clip + freeze masks under jit.

Functional equivalent of the reference training loops
(/root/reference/train_classical_whisper_asr.py:178-241 — AdamW(0.9, 0.98,
eps 1e-6), clip 1.0, per-step schedule; /root/reference/quantum_whisper.py:320-341
— ``requires_grad`` freezing, expressed here as an ``optax.multi_transform``
mask so frozen params get ``set_to_zero`` updates and stay bit-identical).

The step is one jitted function over a (data, model) mesh: batch sharded
along ``data``, params sharded by ``parallel.param_specs`` (TP along
``model``).  Sharding is carried by the *placement* of the inputs —
``shard_state``/``parallel.shard_batch`` device_put the pytrees once and jit
propagates, so XLA inserts the gradient all-reduce (data axis) and the TP
collectives (model axis) automatically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import whisper as model
from ..models.dims import ModelDimensions
from .. import parallel
from .loss import shifted_token_loss, shifted_token_loss_sum


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(
    learning_rate,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
    clip_norm: Optional[float] = 1.0,
    trainable_mask: Optional[Dict] = None,
) -> optax.GradientTransformation:
    """AdamW chained with global-norm clipping; optionally frozen params."""
    tx = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    if trainable_mask is not None:
        labels = jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def init_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def shard_state(
    state: TrainState,
    mesh: Mesh,
    fsdp: bool = False,
    fsdp_min_size: int = 65536,
) -> TrainState:
    """Place a TrainState on the mesh: params take the TP specs; optimizer
    moments (same tree structure as params, nested inside the optax state)
    take the matching param spec; scalars/schedule counters are replicated.

    ``fsdp=True`` = ZeRO-3: large weight leaves (and their Adam moments,
    which inherit the param specs below) are additionally sliced along the
    ``data`` axis, so per-device optimizer memory shrinks ~linearly with the
    data extent; XLA all-gathers params where used and reduce-scatters the
    gradients (see parallel.param_specs).

    Note: device_put may alias the input buffers (e.g. replicated leaves
    already on a mesh device).  The sharded step donates its state, so treat
    the un-sharded state as consumed after this call."""
    pspecs = parallel.param_specs(
        state.params, mesh, fsdp=fsdp, fsdp_min_size=fsdp_min_size
    )
    pdef = jax.tree.structure(state.params)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree.map(put, state.params, pspecs)

    def place_opt(node):
        # Any subtree shaped like the param tree (Adam mu/nu, masked wrappers)
        # gets the param shardings; everything else is replicated.
        try:
            if jax.tree.structure(node) == pdef:
                return jax.tree.map(put, node, pspecs)
        except Exception:
            pass
        return jax.tree.map(lambda x: put(x, P()), node)

    is_param_tree = lambda n: n is not state.opt_state and (
        isinstance(n, dict) and jax.tree.structure(n) == pdef
    )
    opt_state = jax.tree.map(
        place_opt, state.opt_state, is_leaf=is_param_tree
    )
    return TrainState(params, opt_state, put(state.step, P()))


def whisper_loss_fn(
    dims: ModelDimensions, compute_dtype="float32", mesh: Optional[Mesh] = None
) -> Callable:
    """(params, mel, tokens) -> scalar next-token CE (ignore −100).

    Pass the training ``mesh`` to route the encoder through the explicit
    tensor-parallel shard_map trunk (parallel/sharded.py); without it the
    step still shards correctly via GSPMD propagation."""

    def loss_fn(params, mel, tokens):
        inputs = jnp.maximum(tokens, 0)  # −100 pads are placeholders, masked in CE
        logits = model.forward(
            params, mel, inputs, dims, jnp.dtype(compute_dtype), mesh=mesh
        )
        return shifted_token_loss(logits, tokens)

    return loss_fn


def whisper_sum_loss_fn(
    dims: ModelDimensions, compute_dtype="float32", mesh: Optional[Mesh] = None
) -> Callable:
    """(params, mel, tokens) -> (CE sum, valid count) — the accumulation
    form of :func:`whisper_loss_fn` (see loss.masked_cross_entropy_sum)."""

    def loss_fn(params, mel, tokens):
        inputs = jnp.maximum(tokens, 0)
        logits = model.forward(
            params, mel, inputs, dims, jnp.dtype(compute_dtype), mesh=mesh
        )
        return shifted_token_loss_sum(logits, tokens)

    return loss_fn


def make_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    skip_nonfinite: bool = True,
) -> Callable:
    """(state, *batch) -> (state, metrics) — pure; jit with donate_argnums=0.

    ``skip_nonfinite`` is the failure-detection guard (SURVEY.md §5): a batch
    producing a non-finite loss/grad-norm leaves params and optimizer state
    untouched (``metrics['skipped']`` = 1) instead of poisoning the run.
    """

    def train_step(state: TrainState, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, *batch)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), params, state.params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state,
                state.opt_state,
            )
            skipped = (~ok).astype(jnp.int32)
        else:
            skipped = jnp.zeros((), jnp.int32)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "grad_norm": gnorm, "skipped": skipped},
        )

    return train_step


def make_accum_train_step(
    sum_loss_fn: Callable,
    tx: optax.GradientTransformation,
    accum: int,
    skip_nonfinite: bool = True,
) -> Callable:
    """Gradient-accumulation step: one optimizer update per call, gradients
    summed over ``accum`` microbatches via ``lax.scan``.

    ``sum_loss_fn`` must return ``(CE sum, valid count)`` (e.g.
    :func:`whisper_sum_loss_fn`); dividing the accumulated grad-of-sum by
    the total count reproduces the full-batch mean gradient EXACTLY, so
    ``accum=k`` at batch B matches a single step at batch B (pinned by
    tests/test_train.py).  The scan re-materializes activations per
    microbatch — the memory win that lets a small chip train at large
    effective batch.  Batch arrays must have a leading dim divisible by
    ``accum``.  Jit with ``donate_argnums=(0,)``.
    """

    def f(params, *micro):
        s, c = sum_loss_fn(params, *micro)
        return s, c

    def train_step(state: TrainState, *batch):
        micro = tuple(
            x.reshape((accum, x.shape[0] // accum) + x.shape[1:]) for x in batch
        )
        zeros = jax.tree.map(jnp.zeros_like, state.params)

        def body(carry, mb):
            gacc, sacc, cacc = carry
            (s, c), g = jax.value_and_grad(f, has_aux=True)(state.params, *mb)
            gacc = jax.tree.map(jnp.add, gacc, g)
            return (gacc, sacc + s, cacc + c), None

        (gsum, ssum, csum), _ = jax.lax.scan(
            body, (zeros, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            micro,
        )
        csum = jnp.maximum(csum, 1.0)
        grads = jax.tree.map(lambda x: x / csum, gsum)
        loss = ssum / csum
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if skip_nonfinite:
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), params, state.params
            )
            opt_state = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                opt_state,
                state.opt_state,
            )
            skipped = (~ok).astype(jnp.int32)
        else:
            skipped = jnp.zeros((), jnp.int32)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "grad_norm": gnorm, "skipped": skipped},
        )

    return train_step


def make_sharded_train_step(
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    step_fn: Optional[Callable] = None,
) -> Callable:
    """Jitted train step whose inputs carry mesh shardings.

    Call with a state from :func:`shard_state`; batch arrays are data-sharded
    on entry.  The state buffers are donated so parameter/optimizer updates
    happen in place in HBM.  ``step_fn`` overrides the default
    :func:`make_train_step` body (e.g. a :func:`make_accum_train_step`).
    """
    jitted = jax.jit(step_fn or make_train_step(loss_fn, tx),
                     donate_argnums=(0,))

    def run(state: TrainState, *batch):
        batch = tuple(parallel.shard_batch(b, mesh) for b in batch)
        return jitted(state, *batch)

    return run

"""Mixture-of-experts encoder variant with expert parallelism (EP).

Beyond-reference capability: the reference repo has no MoE anywhere
(SURVEY.md §2.5 lists EP as N/A — no expert layers exist in Whisper), so
this module is NOT part of the parity surface.  It exists to complete the
framework's parallelism menu (dp/tp/sp/pp/**ep**) with the TPU-idiomatic
design for sparse expert layers:

* **Model**: each encoder block's dense 4x MLP is replaced by ``n_experts``
  independent MLPs plus a linear router.  Top-1 ("switch") routing: every
  token goes to its argmax expert, scaled by the router probability, with a
  fixed per-expert **capacity** so all shapes stay static under jit
  (overflow tokens fall through to the residual only — the standard switch
  behavior).  A load-balancing auxiliary loss (``n_experts * sum(f_e *
  P_e)``) keeps routing uniform.
* **Dispatch algebra**: routing is expressed as two one-hot einsum tensors
  (``dispatch``: token -> (expert, capacity slot); ``combine`` = dispatch *
  gate) — the GShard formulation that XLA turns into pure gather/matmul
  work with no dynamic shapes.
* **Expert parallelism** (parallel/sharded.py::ep_trunk): experts shard
  over the mesh's model axis; tokens reach their expert's shard through
  ``jax.lax.all_to_all`` and return the same way.  The encoder TIME axis is
  sharded over the same axis (SP-style attention with all-gathered K/V), so
  no compute is replicated.

The flagship Whisper parity paths never touch this module: the dense model
(models/whisper.py) is unchanged, and MoE params are a separate tree layout
(``mlp`` -> ``router`` + ``experts``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .dims import ModelDimensions
from . import whisper as w

Params = Dict[str, Any]


@dataclass(frozen=True)
class MoEConfig:
    """Static (hashable) MoE hyperparameters — usable as a jit static arg.

    ``capacity_factor`` scales the per-expert token budget: capacity
    ``C = ceil(cf * n_tokens / n_experts)`` (rounded up to a multiple of 8
    for lane alignment).  Under expert parallelism the budget applies per
    (device shard, expert) — each shard routes its local tokens
    independently, the standard GShard grouping.
    """

    n_experts: int
    capacity_factor: float = 1.25
    d_ff: Optional[int] = None  # default 4 * d_model
    aux_weight: float = 1e-2

    def ff(self, d_model: int) -> int:
        return self.d_ff if self.d_ff is not None else 4 * d_model

    def capacity(self, n_tokens: int) -> int:
        c = math.ceil(self.capacity_factor * n_tokens / self.n_experts)
        return max(8, -(-c // 8) * 8)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _init_moe_mlp(key, d: int, moe: MoEConfig) -> Params:
    """Router + per-expert MLP stacks, torch-Linear-style U(-1/sqrt(in), ..)
    init per expert (matches w._init_linear so a 1-expert MoE initializes
    like the dense block's MLP family)."""
    F = moe.ff(d)
    E = moe.n_experts
    kr, kf1, kf2, kp1, kp2 = jax.random.split(key, 5)
    bf, bp = 1.0 / math.sqrt(d), 1.0 / math.sqrt(F)
    return {
        "router": {
            "w": jax.random.uniform(kr, (d, E), jnp.float32, -bf, bf)
        },
        "experts": {
            "fc": {
                "w": jax.random.uniform(kf1, (E, d, F), jnp.float32, -bf, bf),
                "b": jax.random.uniform(kf2, (E, F), jnp.float32, -bf, bf),
            },
            "proj": {
                "w": jax.random.uniform(kp1, (E, F, d), jnp.float32, -bp, bp),
                "b": jax.random.uniform(kp2, (E, d), jnp.float32, -bp, bp),
            },
        },
    }


def init_moe_whisper_params(key, dims: ModelDimensions, moe: MoEConfig) -> Params:
    """Full Whisper param tree whose ENCODER blocks carry MoE MLPs.

    The decoder stays dense (identical layout to models/whisper.py), so the
    whole decode/serving stack works unchanged on the encoder output.
    """
    params = w.init_params(key, dims)
    k_moe = jax.random.fold_in(key, 0x40E)
    d = dims.n_audio_state
    moe_mlps = [
        _init_moe_mlp(jax.random.fold_in(k_moe, i), d, moe)
        for i in range(dims.n_audio_layer)
    ]
    blocks = dict(params["encoder"]["blocks"])
    blocks["mlp"] = jax.tree.map(lambda *xs: jnp.stack(xs), *moe_mlps)
    params["encoder"] = dict(params["encoder"], blocks=blocks)
    return params


# ---------------------------------------------------------------------------
# Routing (shared by the dense and expert-parallel paths)
# ---------------------------------------------------------------------------


def route(t, router_w, moe: MoEConfig, capacity: int, valid=None):
    """Top-1 switch routing over tokens ``t`` (N, D).

    Returns ``(dispatch, combine, aux)``:

    * ``dispatch`` (N, E, C) 0/1 — token n occupies capacity slot c of
      expert e.  Tokens beyond an expert's capacity get an all-zero row
      (one_hot of an out-of-range slot), i.e. they are dropped from the
      expert and only the residual passes through.
    * ``combine`` (N, E, C) f32 — dispatch scaled by the router gate.
    * ``aux`` — switch load-balancing loss ``E * sum_e f_e * P_e`` over the
      valid tokens (f_e = routed fraction, P_e = mean router prob).

    ``valid`` (N,) optionally masks padding tokens out of routing entirely
    (they neither consume capacity nor contribute to aux).
    """
    E = moe.n_experts
    logits = t.astype(jnp.float32) @ router_w.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # (N, E)
    gate = jnp.max(probs, axis=-1)
    onehot = jax.nn.one_hot(jnp.argmax(probs, axis=-1), E, dtype=jnp.int32)
    if valid is not None:
        onehot = onehot * valid.astype(jnp.int32)[:, None]
        gate = gate * valid.astype(gate.dtype)
    # Position of each token in its expert's arrival queue; -1 off-expert.
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1
    slot = jnp.max(pos, axis=-1)  # (N,): queue slot, -1 for masked tokens
    dispatch = (
        jax.nn.one_hot(slot, capacity, dtype=jnp.float32)[:, None, :]
        * onehot.astype(jnp.float32)[:, :, None]
    )  # (N, E, C)
    combine = dispatch * gate[:, None, None]

    n_valid = (
        jnp.sum(valid.astype(jnp.float32)) if valid is not None
        else jnp.float32(t.shape[0])
    )
    frac = jnp.sum(onehot, axis=0) / jnp.maximum(n_valid, 1.0)
    if valid is not None:
        probs = probs * valid.astype(jnp.float32)[:, None]
    pmean = jnp.sum(probs, axis=0) / jnp.maximum(n_valid, 1.0)
    aux = E * jnp.sum(frac * pmean)
    return dispatch, combine, aux


def _expert_ffn(buf, ep, dt):
    """Per-expert MLP over a (E, C, D) dispatch buffer -> (E, C, D)."""
    h = jnp.einsum("ecd,edf->ecf", buf, ep["fc"]["w"].astype(dt))
    h = jax.nn.gelu(h + ep["fc"]["b"].astype(dt)[:, None, :], approximate=False)
    y = jnp.einsum("ecf,efd->ecd", h, ep["proj"]["w"].astype(dt))
    return y + ep["proj"]["b"].astype(dt)[:, None, :]


def moe_mlp(mp: Params, x, moe: MoEConfig, valid=None):
    """Dense (single-shard) MoE MLP on (B, T, D) -> ((B, T, D), aux).

    The reference computation for the expert-parallel path
    (parallel/sharded.py::ep_trunk runs this exact algebra with the E axis
    sharded and two all_to_alls around the expert FFN).
    """
    B, T, D = x.shape
    dt = x.dtype
    t = x.reshape(B * T, D)
    C = moe.capacity(B * T)
    dispatch, combine, aux = route(
        t, mp["router"]["w"], moe, C,
        valid=None if valid is None else valid.reshape(B * T),
    )
    buf = jnp.einsum("nec,nd->ecd", dispatch.astype(dt), t)
    y = _expert_ffn(buf, mp["experts"], dt)
    out = jnp.einsum("nec,ecd->nd", combine.astype(dt), y)
    return out.reshape(B, T, D), aux


# ---------------------------------------------------------------------------
# Encoder trunk / full forward
# ---------------------------------------------------------------------------


def moe_trunk(params: Params, x, dims: ModelDimensions, moe: MoEConfig,
              t_real: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoE encoder stack on an embedded (B, T, D) input -> (out, mean aux).

    Attention is the standard dense pre-LN self-attention (flash-eligible
    via models/whisper.py); only the MLP is sparse.
    """
    n_head = dims.n_audio_head
    T = t_real if t_real is not None else x.shape[1]
    # Padding rows (>= t_real) are masked out of attention AND routing:
    # unrouted garbage rows would otherwise consume per-expert capacity
    # (evicting real tokens to residual-only) and skew the load-balance aux.
    valid = (
        None
        if x.shape[1] == T
        else jnp.broadcast_to(
            jnp.arange(x.shape[1]) < T, (x.shape[0], x.shape[1])
        )
    )

    def layer(xc, bp):
        xc = xc + w._self_attn(
            bp["attn"], w.layer_norm(xc, bp["attn_ln"]), n_head, t_real=T
        )
        y, aux = moe_mlp(bp["mlp"], w.layer_norm(xc, bp["mlp_ln"]), moe,
                         valid=valid)
        return xc + y, aux

    x, auxes = jax.lax.scan(w._maybe_remat(layer), x, params["blocks"])
    if x.shape[1] != T:
        x = x[:, :T]
    return w.layer_norm(x, params["ln_post"]), jnp.mean(auxes)


def moe_encoder_apply(params: Params, mel, dims: ModelDimensions,
                      moe: MoEConfig, compute_dtype=jnp.float32, mesh=None):
    """MoE audio encoder forward: (B, n_mels, 2*ctx) -> ((B, ctx, D), aux).

    With a ``mesh`` whose model axis divides ``n_experts`` (and the padded
    time axis), the trunk runs expert-parallel under shard_map
    (parallel/sharded.py::ep_trunk); otherwise the dense trunk runs (and
    still shards over meshes through GSPMD — experts partition on their
    leading E axis via parallel.param_specs).
    """
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(w._conv1d(x, params["conv1"], 1), approximate=False)
    x = jax.nn.gelu(w._conv1d(x, params["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1)
    x = x + params["pos"].astype(x.dtype)

    if mesh is not None:
        from ..parallel import sharded as _sharded

        if _sharded.ep_trunk_applicable(dims, moe, mesh, x.shape[0],
                                        dims.n_audio_ctx):
            return _sharded.ep_trunk(params, x, dims, moe,
                                     dims.n_audio_ctx, mesh)
    return moe_trunk(params, x, dims, moe)


def moe_whisper_loss_fn(dims: ModelDimensions, moe: MoEConfig,
                        compute_dtype="float32", mesh=None):
    """(params, mel, tokens) -> CE + aux_weight * load-balance loss.

    Drop-in for train.whisper_loss_fn over an MoE-encoder Whisper; the
    decoder and token loss are the shared dense implementations.
    """
    from ..train.loss import shifted_token_loss

    def loss_fn(params, mel, tokens):
        inputs = jnp.maximum(tokens, 0)
        xa, aux = moe_encoder_apply(
            params["encoder"], mel, dims, moe, jnp.dtype(compute_dtype),
            mesh=mesh,
        )
        logits = w.decoder_apply(
            params["decoder"], inputs, xa, dims, jnp.dtype(compute_dtype)
        )
        return shifted_token_loss(logits, tokens) + moe.aux_weight * aux

    return loss_fn

"""Fused blocked attention Pallas kernel for the audio encoder.

Replaces torch SDPA (/root/reference/whisper/whisper/model.py:17-22,123-127)
on the TPU compute path.  The encoder's sequence is a fixed 1500 frames, so a
single-level blocking is the right shape: each grid step owns one (BQ, Dh)
query tile, streams the full K/V for its (batch, head) row through VMEM, and
fuses  QK^T -> masked softmax -> PV  in one kernel - the (T, T) logits matrix
never exists in HBM.  (A multi-block streaming-softmax "true flash" is
unnecessary at T=1500: K/V for one head is ~0.8 MB, far under VMEM.)

Inputs arrive pre-scaled by d_head^-0.25 on both q and k (the reference's
4th-root convention, model.py:118), so the kernel applies no extra scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128  # query tile (sublane-aligned)


from . import round_up as _round_up  # noqa: E402


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int):
    # The MXU dots run in the input dtype (bf16 on the production path) with
    # fp32 accumulation - the MXU is a bf16 systolic array, so upcasting the
    # operands to fp32 here would quarter its throughput (profiled: 32.6 ->
    # ~9 ms per tiny layer at B=512).  Softmax stays fp32; the probabilities
    # are cast back to the input dtype for the PV dot, exactly matching the
    # XLA formulation this kernel replaces (models/whisper.py attention():
    # ``softmax(logits).astype(q.dtype)``).
    q = q_ref[0]  # (BQ, Dh)
    k = k_ref[0]  # (Tp, Dh)
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, Tp) fp32
    if t_real != k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < t_real, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / s
    o_ref[0] = out.astype(o_ref.dtype)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused attention: q/k/v (B, H, T, Dh), no mask -> (B, H, T, Dh).

    Compiles the Mosaic kernel on TPU; elsewhere runs the same kernel in
    interpreter mode (numerics testing) - enable only on TPU for speed.

    Differentiable: the backward pass is the VJP of the mathematically
    identical XLA formulation (the kernel saves no softmax residuals), so
    encoder training works with the kernel on the forward path.
    """
    return _sharded_flash_op(jax.default_backend() != "tpu")(q, k, v)


@functools.lru_cache(maxsize=None)
def _sharded_flash_op(interpret: bool):
    """Batch-partitioned 4D flash kernel (ops/partition.py): q/k/v and the
    output share the leading batch dim under GSPMD."""
    from .partition import batch_partitioned

    def impl(q, k, v):
        return _flash_attention(q, k, v, interpret)

    return batch_partitioned(impl, (4, 4, 4), 4, n_batched=3)


def _xla_attention(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _flash_fwd(q, k, v):
    return flash_attention(q, k, v), (q, k, v)


def _flash_bwd(residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Packed-layout kernel: heads stay interleaved in the model's (B, T, D) tensor
# ---------------------------------------------------------------------------
#
# The (B, H, T, Dh) interface below forces XLA to materialize three layout
# transposes and three 1500->1536 pads per layer around the kernel (profiled
# at ~7 ms of the 15 ms flash path at B=128 - half the cost was plumbing).
# This variant reads q/k/v exactly as the model holds them - (B, T, D) with
# D = H*Dh packed on lanes - and grids over PAIRS of 64-wide heads so every
# block is a full 128-lane tile.  No transpose, no pad, no output slice.


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, t_real: int, dh: int):
    q2 = q_ref[0]  # (BQ, HB*dh)
    k2 = k_ref[0]  # (Tkp, HB*dh)
    v2 = v_ref[0]
    outs = []
    for h in range(q2.shape[-1] // dh):
        qh = q2[:, h * dh:(h + 1) * dh]
        kh = k2[:, h * dh:(h + 1) * dh]
        vh = v2[:, h * dh:(h + 1) * dh]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, Tkp) fp32
        if t_real != k2.shape[0]:
            col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(col < t_real, logits, -jnp.inf)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        outs.append(
            jax.lax.dot_general(
                p.astype(vh.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / s
        )
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def packed_applicable(n_head: int, d_model: int) -> bool:
    dh = d_model // n_head
    if dh > 128 or 128 % dh:
        return False
    return n_head % max(1, 128 // dh) == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_packed(q, k, v, n_head: int, t_real: int):
    """Fused attention on packed (B, T, D) tensors -> (B, T, D).

    q and k arrive pre-scaled by d_head^-0.25 (as for :func:`flash_attention`).
    Keys/values at positions >= ``t_real`` are masked out (the caller may run
    the whole encoder at a tile-aligned padded length); query rows >= t_real
    compute unmasked garbage the caller slices away.
    """
    op = _sharded_flash_packed_op(
        n_head, t_real, jax.default_backend() != "tpu"
    )
    return op(q, k, v)


@functools.lru_cache(maxsize=None)
def _sharded_flash_packed_op(n_head: int, t_real: int, interpret: bool):
    """Batch-partitioned packed flash kernel (ops/partition.py)."""
    from .partition import batch_partitioned

    def impl(q, k, v):
        return _flash_packed(q, k, v, n_head, t_real, interpret)

    return batch_partitioned(impl, (3, 3, 3), 3, n_batched=3)


def _xla_attention_packed(q, k, v, n_head, t_real):
    B, T, D = q.shape
    dh = D // n_head
    def split(x):
        return x.reshape(B, -1, n_head, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)).astype(jnp.float32)
    if t_real != k.shape[1]:
        logits = jnp.where(jnp.arange(k.shape[1]) < t_real, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, split(v))
    return out.transpose(0, 2, 1, 3).reshape(B, T, D)


def _flash_packed_fwd(q, k, v, n_head, t_real):
    return flash_attention_packed(q, k, v, n_head, t_real), (q, k, v)


def _flash_packed_bwd(n_head, t_real, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(lambda a, b, c: _xla_attention_packed(a, b, c, n_head,
                                                           t_real), q, k, v)
    return vjp(g)


flash_attention_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


@functools.partial(jax.jit, static_argnames=("n_head", "t_real", "interpret"))
def _flash_packed(q, k, v, n_head: int, t_real: int, interpret: bool):
    B, T, D = q.shape
    Tk = k.shape[1]
    dh = D // n_head
    HB = 128 // dh  # heads per 128-lane block
    assert n_head % HB == 0, "use flash_attention for this head geometry"
    Tp = _round_up(T, BQ)
    Tkp = _round_up(Tk, BQ)

    def pad_t(x, L):
        return jnp.pad(x, ((0, 0), (0, L - x.shape[1]), (0, 0))) \
            if x.shape[1] != L else x

    qf, kf, vf = pad_t(q, Tp), pad_t(k, Tkp), pad_t(v, Tkp)
    grid = (B, n_head // HB, Tp // BQ)  # query tiles innermost: k/v blocks
    # are constant in the fastest grid dim, so Pallas keeps them resident.
    W = HB * dh  # = 128

    out = pl.pallas_call(
        functools.partial(_packed_kernel, t_real=min(t_real, Tk), dh=dh),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, W), lambda b, hp, i: (b, i, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tkp, W), lambda b, hp, i: (b, 0, hp),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tkp, W), lambda b, hp, i: (b, 0, hp),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, W), lambda b, hp, i: (b, i, hp),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :T] if Tp != T else out


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    B, H, T, Dh = q.shape
    Tk = k.shape[2]
    Tp = _round_up(T, BQ)
    Tkp = _round_up(Tk, BQ)

    def prep(x, L):
        x = x.reshape(B * H, x.shape[2], Dh)
        pad = L - x.shape[1]
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    qf, kf, vf = prep(q, Tp), prep(k, Tkp), prep(v, Tkp)
    grid = (B * H, Tp // BQ)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_real=Tk),
        out_shape=jax.ShapeDtypeStruct((B * H, Tp, Dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, Dh), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tkp, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tkp, Dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, Dh), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :T].reshape(B, H, T, Dh)

"""Fused int8 cross-attention decode kernel.

The decode loop's dominant HBM stream is the cross-attention K/V re-read
every token step: at tiny/B=64 it is ~590 MB/step of the ~710 MB total
(profiled via scripts/profile_decode.py).  This kernel stores the cross K/V
quantized to int8 with per-(head, position) scales and fuses

    dequant(K) -> QK^T -> softmax(f32) -> dequant-weights -> PV

in one pass per (batch, head) grid cell, halving the dominant stream.  The
dequantization happens in VMEM registers after the int8 HBM load — the
whole point is that only int8 bytes ever cross HBM.

Layout: K and V are stored (B, H, Dh, Tp) with the audio TIME axis on lanes
(Tp = 1500 padded to 1536 = 12x128) — the "T-on-lanes" layout from the r1
int8 experiment notes: Dh=64 on sublanes satisfies the int8 (32, 128) tile
with no padding waste, unlike Dh-on-lanes which pads 64 -> 128 and eats the
byte savings.

Replaces: the per-step cross-attention of the reference's serial decode loop
(whisper/decoding.py:680-710 via model.py:123-139).  Opt-in via
DecodingOptions(kv_int8=True): int8 rounding changes logits at the 1e-2
level, so exact token parity with the fp path is not guaranteed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


from . import round_up as _round_up  # noqa: E402


@functools.partial(jax.jit, static_argnames=("heads",))
def quantize_kv(x: jnp.ndarray, heads: int):
    """(B, Ta, D) float -> ((B, H, Dh, Tp) int8, (B, H, Tp) f32 scales).

    Per-(b, h, t) symmetric scales: max|x| over the Dh lane / 127.  Padding
    positions get scale 0, so their dequantized keys contribute -0 logits
    and are additionally masked in the kernel.
    """
    B, Ta, D = x.shape
    Dh = D // heads
    Tp = _round_up(Ta, LANE)
    xh = x.astype(jnp.float32).reshape(B, Ta, heads, Dh)
    xh = xh.transpose(0, 2, 3, 1)  # (B, H, Dh, Ta)
    amax = jnp.max(jnp.abs(xh), axis=2)  # (B, H, Ta)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.maximum(scale, 1e-30), 0.0)
    q = jnp.clip(jnp.round(xh * inv[:, :, None, :]), -127, 127).astype(jnp.int8)
    if Tp != Ta:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, Tp - Ta)))
        scale = jnp.pad(scale, ((0, 0), (0, 0), (0, Tp - Ta)))
    return q, scale


def _kernel(q_ref, k8_ref, sk_ref, v8_ref, sv_ref, o_ref, *, t_real: int):
    # q: (1, R, Dh) f32 rows (G hypotheses x T_new tokens of one batch/head);
    # k8/v8: (1, Dh, Tp) int8; sk/sv: (1, 1, Tp) f32.
    q = q_ref[0]  # (R, Dh)
    k = k8_ref[0].astype(jnp.float32)  # (Dh, Tp) — dequant in registers
    sk = sk_ref[0]  # (1, Tp)

    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * sk  # (R, Tp): per-position scale folded in after the matmul
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < t_real, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)  # (R, Tp) f32

    v = v8_ref[0].astype(jnp.float32)  # (Dh, Tp)
    wv = w * sv_ref[0]  # fold V's per-position scale into the tiny weights
    out = jax.lax.dot_general(
        wv, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, Dh)
    o_ref[0] = out


@functools.partial(jax.jit, static_argnames=("t_real", "interpret"))
def _attend(q, k8, sk, v8, sv, t_real: int, interpret: bool):
    BH, R, Dh = q.shape
    Tp = k8.shape[-1]
    return pl.pallas_call(
        functools.partial(_kernel, t_real=t_real),
        out_shape=jax.ShapeDtypeStruct((BH, R, Dh), jnp.float32),
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, R, Dh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh, Tp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dh, Tp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, Dh), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k8, sk, v8, sv)


@functools.lru_cache(maxsize=None)
def _sharded_attend_op(t_real: int, interpret: bool):
    """Batch-partitioned int8 decode kernel (ops/partition.py): every
    operand shares the (batch*heads) leading dim, so a data-sharded decode
    runs each shard's kernel locally under GSPMD."""
    from .partition import batch_partitioned

    def impl(q, k8, sk, v8, sv):
        return _attend(q, k8, sk, v8, sv, t_real, interpret)

    return batch_partitioned(impl, (3, 3, 3, 3, 3), 3, n_batched=5)


def int8_cross_attention(
    q: jnp.ndarray,      # (B*G, T_new, D) queries (pre-LN/projection output)
    k8: jnp.ndarray,     # (B, H, Dh, Tp) int8
    sk: jnp.ndarray,     # (B, H, Tp) f32
    v8: jnp.ndarray,     # (B, H, Dh, Tp) int8
    sv: jnp.ndarray,     # (B, H, Tp) f32
    n_head: int,
    t_real: int,
) -> jnp.ndarray:
    """Grouped cross-attention over the int8 cache -> (B*G, T_new, D).

    ``B*G`` query rows share each of the B cached segments (G = beam /
    best-of group size); rows are group-major, matching the fp grouped path
    (models/whisper.py _grouped_cross_attention).
    """
    BG, T_new, D = q.shape
    B = k8.shape[0]
    G = BG // B
    Dh = D // n_head
    scale = float(Dh) ** -0.5  # both 4th-root factors folded into q

    qh = (q.astype(jnp.float32) * scale).reshape(B, G, T_new, n_head, Dh)
    qh = qh.transpose(0, 3, 1, 2, 4).reshape(B * n_head, G * T_new, Dh)

    op = _sharded_attend_op(t_real, jax.default_backend() != "tpu")
    out = op(
        qh,
        k8.reshape(B * n_head, Dh, k8.shape[-1]),
        sk.reshape(B * n_head, 1, sk.shape[-1]),
        v8.reshape(B * n_head, Dh, v8.shape[-1]),
        sv.reshape(B * n_head, 1, sv.shape[-1]),
    )  # (B*H, G*T_new, Dh)
    out = out.reshape(B, n_head, G, T_new, Dh).transpose(0, 2, 3, 1, 4)
    return out.reshape(BG, T_new, D)

"""Fused encoder conv stem: mel -> conv1 -> gelu -> conv2(s2) -> gelu -> +pos.

At B=512 the XLA stem costs ~17-20 ms/call: the (B, 80, 3000) -> (B, T, D)
path materializes channel-major/time-major relayouts around the two
convolutions plus a separate 1500 -> 1536 pad.  This kernel emits the
transformer trunk's input directly — row-major (B, 1536, D), position
embeddings added, padding rows zeroed — in one pass per batch item.

Stride-2 trick: the caller splits mel into even/odd time phases (an XLA
strided slice, the only relayout left).  With x_e[t] = x[2t], x_o[t] =
x[2t+1] every tap of both convolutions becomes a whole-array single-row
shift (concat of slices), never a strided access:

    conv1 (k3, p1):  y1_e[t] = x_o[t-1] Wa + x_e[t] Wb + x_o[t] Wc
                     y1_o[t] = x_e[t]   Wa + x_o[t] Wb + x_e[t+1] Wc
    conv2 (k3, s2, p1): y2[t] = y1_o[t-1] V0 + y1_e[t] V1 + y1_o[t] V2

Replaces: the Conv1d stem of the reference encoder
(/root/reference/whisper/whisper/model.py:148-169) on the TPU path.
Weights arrive in the model's (O, I, K) layout and are re-cut to per-tap
(I, O) matrices host-side.  Numerics: dots accumulate in fp32 and round
once to the compute dtype per output (vs one fused conv accumulation in
XLA) — differences are at rounding level; the f32 interpret path is exact
to ~1e-6 (tests/test_conv_stem.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encoder_block import _gelu_exact


def stem_applicable(
    n_mels: int, t_mel: int, t_out: int, t_pad: int, d_model: int = 512
) -> bool:
    # n_mels must be sublane-tile aligned for the kernel's static weight
    # row slices (80 and 128 both qualify).  D capped at 512 (tiny/base):
    # the kernel holds both phase activations, the conv2 weights and the
    # padded output per cell, which passes 16 MB VMEM above that — bigger
    # members keep the XLA stem (their trunks still fuse).
    return (
        n_mels % 16 == 0
        and d_model <= 512
        and t_mel == 2 * t_out
        and t_mel % 2 == 0
        and t_pad >= t_out
    )


def _shift_down(x):
    """rows 1.. get x[:-1]; row 0 is zero (conv left padding).
    (concat of slices: Mosaic's rotate only supports 32-bit data.)"""
    zero = jnp.zeros((1, x.shape[1]), x.dtype)
    return jnp.concatenate([zero, x[:-1]], axis=0)


def _shift_up(x):
    """rows ..-2 get x[1:]; last row is zero (conv right padding)."""
    zero = jnp.zeros((1, x.shape[1]), x.dtype)
    return jnp.concatenate([x[1:], zero], axis=0)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _stem_kernel(
    mel_e_ref, mel_o_ref, w1_ref, b1_ref, w2_ref, b2_ref, pos_ref, o_ref,
    *, t_out: int,
):
    dt = o_ref.dtype
    # (T/2, C0) compute-dtype phases, pre-transposed by the caller (XLA
    # fuses transpose+convert into the strided phase split).
    x_e = mel_e_ref[0]
    x_o = mel_o_ref[0]
    C0 = x_e.shape[1]

    # Each tap's dot accumulates in fp32 on the MXU and rounds to the
    # compute dtype before the tap sum (keeps one (T/2, D) fp32 temporary
    # live instead of three — the stem sits right at the VMEM limit).
    d = lambda a, b: _dot(a, b).astype(dt)
    wa, wb, wc = (w1_ref[i * C0:(i + 1) * C0, :] for i in range(3))
    y1_e = _gelu_exact(
        d(_shift_down(x_o), wa) + d(x_e, wb) + d(x_o, wc) + b1_ref[:]
    )
    y1_o = _gelu_exact(
        d(x_e, wa) + d(x_o, wb) + d(_shift_up(x_e), wc) + b1_ref[:]
    )

    D = y1_e.shape[1]
    v0, v1, v2 = (w2_ref[i * D:(i + 1) * D, :] for i in range(3))
    y2 = (
        d(_shift_down(y1_o), v0) + d(y1_e, v1) + d(y1_o, v2) + b2_ref[:]
    )
    y2 = _gelu_exact(y2) + pos_ref[:]

    o_ref[0, :t_out, :] = y2
    if o_ref.shape[1] != t_out:
        o_ref[0, t_out:, :] = jnp.zeros(
            (o_ref.shape[1] - t_out, y2.shape[1]), dt
        )


def _retap(w):
    """(O, I, K=3) conv weight -> (3*I, O) stacked per-tap matrices."""
    return jnp.concatenate([w[:, :, k].T for k in range(3)], axis=0)


@functools.partial(jax.jit, static_argnames=("t_pad", "interpret", "dtype"))
def _stem_impl(mel, conv1, conv2, pos, t_pad: int, interpret: bool, dtype):
    B, C0, T = mel.shape
    t_out = T // 2
    D = conv1["w"].shape[0]
    dt = jnp.dtype(dtype)

    # Phase split + transpose + convert in XLA (one fused relayout pass);
    # everything downstream is whole-array shifts and matmuls in the kernel.
    mel_e = mel[:, :, 0::2].transpose(0, 2, 1).astype(dt)  # (B, T/2, C0)
    mel_o = mel[:, :, 1::2].transpose(0, 2, 1).astype(dt)

    const = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_stem_kernel, t_out=t_out),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, D), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, t_out, C0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_out, C0), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const((3 * C0, D)), const((1, D)),
            const((3 * D, D)), const((1, D)),
            const((t_out, D)),
        ],
        out_specs=pl.BlockSpec((1, t_pad, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        mel_e, mel_o,
        _retap(conv1["w"]).astype(dt), conv1["b"].reshape(1, D).astype(dt),
        _retap(conv2["w"]).astype(dt), conv2["b"].reshape(1, D).astype(dt),
        pos.astype(dt),
    )


def _xla_stem(params, mel, t_pad: int, dtype_str: str):
    """Reference XLA formulation (conv + gelu + pad + pos) for the backward
    pass and as the numerics oracle.

    Deliberately NOT models/whisper.py's production helpers: the VJP must
    stay a pure-XLA program regardless of the kernel enable flags (calling
    the production path could recursively select a non-differentiable
    Pallas kernel).  Equivalence with the production stem is pinned by
    tests/test_conv_stem.py::test_encoder_apply_with_stem_matches_plain."""
    dt = jnp.dtype(dtype_str)
    x = mel.astype(dt)

    def conv(x, p, stride):
        return (
            jax.lax.conv_general_dilated(
                x, p["w"].astype(x.dtype), window_strides=(stride,),
                padding=[(1, 1)], dimension_numbers=("NCH", "OIH", "NCH"),
                preferred_element_type=x.dtype,
            )
            + p["b"].astype(x.dtype)[None, :, None]
        )

    x = jax.nn.gelu(conv(x, params["conv1"], 1), approximate=False)
    x = jax.nn.gelu(conv(x, params["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1)
    x = x + params["pos"].astype(x.dtype)
    T = x.shape[1]
    if t_pad != T:
        x = jnp.pad(x, ((0, 0), (0, t_pad - T), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_conv_stem(params, mel, t_pad: int, compute_dtype: str):
    """(B, n_mels, T_mel) mel -> (B, t_pad, D) trunk input (gelu'd conv
    stack + position embeddings, padding rows zeroed).

    ``params`` needs keys conv1/conv2/pos (models/whisper.py encoder
    layout); ``compute_dtype`` is a string for hashability.  Backward runs
    through the XLA formulation (custom VJP), so stem training works with
    the kernel on the forward path."""
    return _stem_impl(
        mel, params["conv1"], params["conv2"], params["pos"], t_pad,
        jax.default_backend() != "tpu", str(jnp.dtype(compute_dtype)),
    )


def _stem_fwd(params, mel, t_pad, compute_dtype):
    return fused_conv_stem(params, mel, t_pad, compute_dtype), (params, mel)


def _stem_bwd(t_pad, compute_dtype, res, g):
    params, mel = res
    _, vjp = jax.vjp(
        lambda p, m: _xla_stem(p, m, t_pad, compute_dtype), params, mel
    )
    return vjp(g)


fused_conv_stem.defvjp(_stem_fwd, _stem_bwd)

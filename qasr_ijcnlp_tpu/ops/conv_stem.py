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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encoder_block import _gelu_exact


_CHUNK = 256     # output rows per grid cell of the chunked (D > 512) stem
_HALO = 16       # lead halo rows of each x-phase slab (uses 2, tile-aligned)


def stem_applicable(
    n_mels: int, t_mel: int, t_out: int, t_pad: int, d_model: int = 512
) -> bool:
    # n_mels must be sublane-tile aligned for the kernel's static weight
    # row slices (80 and 128 both qualify).  D <= 512 (tiny/base) runs the
    # whole time axis per cell; 512 < D <= 1024 (small/medium) runs the
    # time-chunked kernel (256-row output chunks over overlapping phase
    # slabs) since the whole-axis activations pass 16 MB VMEM.  large
    # (1280) would put the resident conv2 weight block (9.8 MB) plus
    # double-buffered slabs over the limit — it keeps the XLA stem.
    return (
        n_mels % 16 == 0
        and (d_model <= 512 or (d_model <= 1024 and t_pad % _CHUNK == 0))
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


def _stem_kernel_chunked(
    xe_ref, xo_ref, w1_ref, b1_ref, w2_ref, b2_ref, pos_ref, o_ref,
    *, t_out: int, ch: int,
):
    """One (batch item, 256-row output chunk) of the stem for D > 512.

    The caller cuts each time-phase into overlapping (ch + 2*_HALO)-row
    slabs (absolute row = c*ch - _HALO + i), so every tap stays a
    whole-array shifted slice exactly as in the single-pass kernel; the
    conv2 weights are the only resident whole-model buffer.  y1 rows with
    absolute position < 0 are zeroed (they are conv2's left zero padding,
    not real conv1 outputs); output rows >= t_out are the trunk's tile
    padding and zeroed likewise.
    """
    c = pl.program_id(1)
    dt = o_ref.dtype
    x_e = xe_ref[0, 0]                  # (ch + 2*_HALO, C0)
    x_o = xo_ref[0, 0]
    C0 = x_e.shape[1]
    chy = ch + _HALO                    # y1 rows: absolute c*ch - 8 + i

    d = lambda a, b: _dot(a, b).astype(dt)
    wa, wb, wc = (w1_ref[i * C0:(i + 1) * C0, :] for i in range(3))
    # y1 row i sits at absolute t' = c*ch - 8 + i; slab row 0 is absolute
    # c*ch - 16, so its x taps t'-1 / t' / t'+1 are slab rows i+7/i+8/i+9.
    y1_e = _gelu_exact(
        d(x_o[7:7 + chy], wa) + d(x_e[8:8 + chy], wb)
        + d(x_o[8:8 + chy], wc) + b1_ref[:]
    )
    y1_o = _gelu_exact(
        d(x_e[8:8 + chy], wa) + d(x_o[8:8 + chy], wb)
        + d(x_e[9:9 + chy], wc) + b1_ref[:]
    )
    t_prime = (
        jax.lax.broadcasted_iota(jnp.int32, (chy, 1), 0) + c * ch - 8
    )
    y1_e = jnp.where(t_prime >= 0, y1_e, jnp.zeros_like(y1_e))
    y1_o = jnp.where(t_prime >= 0, y1_o, jnp.zeros_like(y1_o))

    D = y1_e.shape[1]
    v0, v1, v2 = (w2_ref[i * D:(i + 1) * D, :] for i in range(3))
    # y2 row j at absolute t = c*ch + j reads y1 rows j+7 / j+8.
    y2 = (
        d(y1_o[7:7 + ch], v0) + d(y1_e[8:8 + ch], v1)
        + d(y1_o[8:8 + ch], v2) + b2_ref[:]
    )
    y2 = _gelu_exact(y2) + pos_ref[:]
    t_abs = jax.lax.broadcasted_iota(jnp.int32, (ch, 1), 0) + c * ch
    o_ref[0] = jnp.where(t_abs < t_out, y2, jnp.zeros_like(y2))


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

    weights = (
        _retap(conv1["w"]).astype(dt), conv1["b"].reshape(1, D).astype(dt),
        _retap(conv2["w"]).astype(dt), conv2["b"].reshape(1, D).astype(dt),
    )

    if D > 512:
        return _stem_call_chunked(
            mel_e, mel_o, weights, pos, t_out, t_pad, interpret, dt
        )

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
    )(mel_e, mel_o, *weights, pos.astype(dt))


def _stem_call_chunked(mel_e, mel_o, weights, pos, t_out, t_pad, interpret,
                       dt):
    """Grid (B, t_pad/256) stem for D in (512, 1024].

    The phases are cut into overlapping (256 + 32)-row slabs host-side (one
    cheap XLA gather over the tiny mel tensor), so each grid cell sees
    non-overlapping BlockSpec blocks while its taps still read the 1-row
    halos the convolutions need.
    """
    B, _, C0 = mel_e.shape
    D = weights[0].shape[1]
    CH = _CHUNK
    NC = t_pad // CH
    SL = CH + 2 * _HALO
    pad_r = (NC - 1) * CH + SL - _HALO - t_out

    idx = jnp.asarray(
        np.arange(NC)[:, None] * CH + np.arange(SL)[None, :], jnp.int32
    )

    def slabs(phase):
        padded = jnp.pad(phase, ((0, 0), (_HALO, pad_r), (0, 0)))
        return padded[:, idx]  # (B, NC, SL, C0)

    pos_p = pos.astype(dt)
    if pos_p.shape[0] != t_pad:
        pos_p = jnp.pad(pos_p, ((0, t_pad - pos_p.shape[0]), (0, 0)))

    slab_spec = pl.BlockSpec((1, 1, SL, C0), lambda b, c: (b, c, 0, 0),
                             memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, c: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_stem_kernel_chunked, t_out=t_out, ch=CH),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, D), dt),
        grid=(B, NC),
        in_specs=[
            slab_spec, slab_spec,
            const((3 * C0, D)), const((1, D)),
            const((3 * D, D)), const((1, D)),
            pl.BlockSpec((CH, D), lambda b, c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, D), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(slabs(mel_e), slabs(mel_o), *weights, pos_p)


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


@functools.lru_cache(maxsize=None)
def _sharded_stem_op(t_pad: int, interpret: bool, dtype: str):
    """Batch-partitioned stem (ops/partition.py): under GSPMD each data
    shard runs the kernel on its local batch; weights replicate."""
    from .partition import batch_partitioned

    def impl(mel, c1w, c1b, c2w, c2b, pos):
        return _stem_impl(
            mel, {"w": c1w, "b": c1b}, {"w": c2w, "b": c2b}, pos, t_pad,
            interpret, dtype,
        )

    return batch_partitioned(impl, (3, 3, 1, 3, 1, 2), 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_conv_stem(params, mel, t_pad: int, compute_dtype: str):
    """(B, n_mels, T_mel) mel -> (B, t_pad, D) trunk input (gelu'd conv
    stack + position embeddings, padding rows zeroed).

    ``params`` needs keys conv1/conv2/pos (models/whisper.py encoder
    layout); ``compute_dtype`` is a string for hashability.  Backward runs
    through the XLA formulation (custom VJP), so stem training works with
    the kernel on the forward path."""
    op = _sharded_stem_op(
        t_pad, jax.default_backend() != "tpu", str(jnp.dtype(compute_dtype))
    )
    return op(
        mel, params["conv1"]["w"], params["conv1"]["b"],
        params["conv2"]["w"], params["conv2"]["b"], params["pos"],
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

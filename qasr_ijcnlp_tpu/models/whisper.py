"""Pure-functional Whisper encoder/decoder in JAX.

From-scratch TPU-native re-design of the reference model
(/root/reference/whisper/whisper/model.py:39-345).  Key departures from the
torch implementation:

* Parameters are a plain pytree (nested dicts of arrays) with all transformer
  blocks of a stack *stacked along a leading layer axis* and executed with
  ``lax.scan`` - one compiled block body regardless of depth, shardable with
  ``NamedSharding`` along (layer, heads/mlp) axes.
* The kv-cache is an explicit fixed-shape array pytree threaded through the
  decode step (the reference mutates a dict via forward hooks,
  model.py:310-341 - hooks are untraceable under jit).
* Mixed precision is a policy: activations in ``compute_dtype`` (bf16 on
  TPU), LayerNorm/softmax/logits always fp32 (the reference casts weights to
  the activation dtype per-op, model.py:39-59, and computes LN in fp32).
* Attention uses the 4th-root scaling of the reference (model.py:118) and
  optionally a Pallas flash-attention kernel for the 1500-frame encoder.

Weight-layout convention: Linear weights are stored ``(in, out)`` so the
forward is ``x @ w + b``; conv stem weights are ``(out, in, k)`` matching
XLA's OIH.  ``models.convert`` maps the torch layout to this one.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dims import ModelDimensions

Params = Dict[str, Any]

# Pallas kernel path for the encoder stack.  None = auto: ON for a TPU
# backend, OFF elsewhere.  When on, tiny/base/small run the fully fused
# two-kernel encoder block (ops/encoder_block.py: tiny B=512 encoder 301 ->
# 245 ms, base B=128 1.54x, small B=64 1.38x over XLA — docs/BENCHMARKS.md);
# family members past the fused gate fall back to the packed flash
# attention kernel (ops/flash.py).  Backward runs through the XLA
# formulation via custom_vjp in both cases.
_USE_FLASH: Optional[bool] = None

# Rematerialize transformer blocks in the backward pass (trade FLOPs for HBM;
# enables larger batches / larger family members in training).
_USE_REMAT = False


def set_flash_attention(enabled: Optional[bool]) -> None:
    global _USE_FLASH
    _USE_FLASH = enabled


def _flash_enabled() -> bool:
    if _USE_FLASH is None:
        return jax.default_backend() == "tpu"
    return _USE_FLASH


def set_remat(enabled: bool) -> None:
    global _USE_REMAT
    _USE_REMAT = enabled


def _maybe_remat(fn):
    return jax.checkpoint(fn) if _USE_REMAT else fn


def sinusoids(length: int, channels: int, max_timescale: float = 10000) -> np.ndarray:
    """Sinusoidal position embeddings (reference model.py:62-68)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate(
        [np.sin(scaled_time), np.cos(scaled_time)], axis=1
    ).astype(np.float32)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, bias=True):
    # torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for w and b.
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p = {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(k2, (d_out,), jnp.float32, -bound, bound)
    return p


def _init_ln(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _init_block(key, d, cross_attention: bool):
    ks = jax.random.split(key, 8)
    block = {
        "attn": {
            "query": _init_linear(ks[0], d, d),
            "key": _init_linear(ks[1], d, d, bias=False),
            "value": _init_linear(ks[2], d, d),
            "out": _init_linear(ks[3], d, d),
        },
        "attn_ln": _init_ln(d),
        "mlp": {
            "fc": _init_linear(ks[4], d, 4 * d),
            "proj": _init_linear(ks[5], 4 * d, d),
        },
        "mlp_ln": _init_ln(d),
    }
    if cross_attention:
        block["cross_attn"] = {
            "query": _init_linear(ks[6], d, d),
            "key": _init_linear(ks[7], d, d, bias=False),
            "value": _init_linear(jax.random.fold_in(key, 100), d, d),
            "out": _init_linear(jax.random.fold_in(key, 101), d, d),
        }
        block["cross_attn_ln"] = _init_ln(d)
    return block


def _stack_blocks(blocks):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(key, dims: ModelDimensions) -> Params:
    """Random-init parameter pytree for the full encoder-decoder."""
    k_enc, k_dec, k_conv1, k_conv2, k_emb, k_pos = jax.random.split(key, 6)
    d = dims.n_audio_state

    def conv_init(k, out_c, in_c, width):
        bound = 1.0 / math.sqrt(in_c * width)
        k1, k2 = jax.random.split(k)
        return {
            "w": jax.random.uniform(k1, (out_c, in_c, width), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (out_c,), jnp.float32, -bound, bound),
        }

    enc_blocks = [
        _init_block(jax.random.fold_in(k_enc, i), d, cross_attention=False)
        for i in range(dims.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(jax.random.fold_in(k_dec, i), dims.n_text_state, True)
        for i in range(dims.n_text_layer)
    ]
    return {
        "encoder": {
            "conv1": conv_init(k_conv1, d, dims.n_mels, 3),
            "conv2": conv_init(k_conv2, d, d, 3),
            "pos": jnp.asarray(sinusoids(dims.n_audio_ctx, d)),
            "blocks": _stack_blocks(enc_blocks),
            "ln_post": _init_ln(d),
        },
        "decoder": {
            "tok_emb": jax.random.normal(k_emb, (dims.n_vocab, dims.n_text_state))
            * 0.02,
            "pos_emb": jax.random.normal(k_pos, (dims.n_text_ctx, dims.n_text_state))
            * 0.01,
            "blocks": _stack_blocks(dec_blocks),
            "ln": _init_ln(dims.n_text_state),
        },
    }


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def layer_norm(x, p, eps: float = 1e-5):
    # fp32 LN regardless of activation dtype (reference model.py:39-41).
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["g"] + p["b"]).astype(x.dtype)


def linear(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_head: int,
    mask: Optional[jnp.ndarray] = None,
    t_real: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-head attention with 4th-root scaling; softmax in fp32.

    q: (B, Tq, D), k/v: (B, Tk, D); mask: additive, broadcastable to
    (B, 1, Tq, Tk) or (Tq, Tk).  ``t_real`` marks keys >= t_real as padding
    (the encoder runs at a tile-aligned sequence length on TPU).
    """
    d_head = q.shape[-1] // n_head
    scale = d_head**-0.25

    # The kernels' tile shapes fit long unmasked query blocks (the encoder's
    # 1500 frames); short-query cross-attention (decode steps, prompts) would
    # pad every call to a full 128-row tile, so it stays on the XLA path.
    # The packed kernel reads q/k/v exactly as the model holds them -
    # (B, T, D) - with two 64-wide heads per 128-lane block, so XLA inserts
    # no transposes or pads around it.
    if mask is None and q.shape[1] >= 512 and _flash_enabled():
        from ..ops.flash import flash_attention_packed, packed_applicable

        if packed_applicable(n_head, q.shape[-1]):
            tr = t_real if t_real is not None else k.shape[1]
            return flash_attention_packed(
                q * scale, k * scale, v, n_head, tr
            ).astype(q.dtype)

    qh = _split_heads(q, n_head) * scale
    kh = _split_heads(k, n_head) * scale
    vh = _split_heads(v, n_head)

    if (
        mask is None
        and qh.shape[2] >= 512
        and _flash_enabled()
        # the 4D kernel has no key-validity input: only safe when every
        # key row is real
        and (t_real is None or t_real == k.shape[1])
    ):
        from ..ops.flash import flash_attention

        out = flash_attention(qh, kh, vh)
        return _merge_heads(out.astype(q.dtype))

    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
    if mask is not None:
        logits = logits + mask
    if t_real is not None and t_real != k.shape[1]:
        # honor t_real on the XLA path too: padded key rows (tile-aligned
        # inputs) must never receive attention weight
        logits = jnp.where(
            jnp.arange(k.shape[1]) < t_real, logits, -jnp.inf
        )
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return _merge_heads(out)


def _self_attn(p, x, n_head, mask=None, t_real=None):
    q = linear(x, p["query"])
    k = linear(x, p["key"])
    v = linear(x, p["value"])
    return linear(attention(q, k, v, n_head, mask, t_real=t_real), p["out"])


def _mlp(p, x):
    return linear(jax.nn.gelu(linear(x, p["fc"]), approximate=False), p["proj"])


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv1d(x, p, stride: int):
    # x: (B, C, T); w: (O, I, K); SAME-ish padding of 1 (kernel 3).
    return (
        jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(stride,),
            padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=x.dtype,
        )
        + p["b"].astype(x.dtype)[None, :, None]
    )


def dispatch_encoder_apply(
    params: Params,
    mel: jnp.ndarray,
    dims: ModelDimensions,
    compute_dtype=jnp.float32,
    mesh=None,
) -> jnp.ndarray:
    """The one quantum-vs-classical encoder dispatch, shared by the fused
    decode program (decode/loop.py) and the standalone feature/lang-detect
    path (decode/__init__.py).  The variant is derived from the params tree
    itself (dict-key membership is trace-static under jit), so a caller can
    never pair quantum weights with the classical stem.  The MoE encoder
    (models/moe.py) is a training-surface trunk and is deliberately NOT
    routed here; decoding uses the dense encoders only."""
    if "qconv1" in params:
        from .quantum import quantum_encoder_apply

        return quantum_encoder_apply(params, mel, dims, compute_dtype,
                                     mesh=mesh)
    return encoder_apply(params, mel, dims, compute_dtype, mesh=mesh)


def encoder_apply(
    params: Params,
    mel: jnp.ndarray,
    dims: ModelDimensions,
    compute_dtype=jnp.float32,
    mesh=None,
) -> jnp.ndarray:
    """Audio encoder forward: (B, n_mels, 3000) -> (B, 1500, D).

    ``mesh`` (a jax.sharding.Mesh) opts into the explicit tensor-parallel
    trunk when its model axis is > 1; without it, multi-device execution
    still works through GSPMD (the Pallas kernels batch-partition via
    ops/partition.py).
    """
    T = dims.n_audio_ctx
    Tp = (T + 127) // 128 * 128
    if _trunk_uses_fused_blocks(dims, jnp.dtype(compute_dtype)):
        from ..ops.conv_stem import fused_conv_stem, stem_applicable

        if stem_applicable(dims.n_mels, mel.shape[-1], T, Tp,
                           dims.n_audio_state):
            # Fused Pallas stem emits the trunk input directly: row-major,
            # tile-padded, position-added (ops/conv_stem.py).
            stem = {k: params[k] for k in ("conv1", "conv2", "pos")}
            x = fused_conv_stem(stem, mel, Tp, str(jnp.dtype(compute_dtype)))
            return transformer_trunk(params, x, dims, t_real=T, mesh=mesh)
    x = mel.astype(compute_dtype)
    x = jax.nn.gelu(_conv1d(x, params["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, params["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T, D)
    x = x + params["pos"].astype(x.dtype)
    return transformer_trunk(params, x, dims, mesh=mesh)


def _trunk_uses_fused_blocks(
    dims: ModelDimensions, dtype, t_pad: Optional[int] = None
) -> bool:
    """``t_pad`` must be the RUNTIME padded length the kernels will see —
    gating on dims.n_audio_ctx alone would admit shorter trunk inputs whose
    padded length doesn't tile into the finish kernel's row blocks.

    Policy vs capability: the fused block is parity-tested up to D=1280
    (large), but large defaults to the flash path — the r3 on-chip A/B
    (scripts/bench_family_kernels.py, B=8) measured the fused encoder at
    0.97x flash there: both paths are bound by the same attention work at
    D=1280 and the narrow 128/512 finish tiles give back the layout savings.
    tiny..medium keep the fused default (1.02-1.54x measured)."""
    from ..ops.encoder_block import fused_block_applicable

    if t_pad is None:
        t_pad = (dims.n_audio_ctx + 127) // 128 * 128
    return (
        _flash_enabled()
        and t_pad >= 512
        and dims.n_audio_state <= 1024
        and fused_block_applicable(dims.n_audio_head, dims.n_audio_state,
                                   t_pad)
        and (dtype == jnp.bfloat16 or jax.default_backend() != "tpu")
    )


def transformer_trunk(
    params: Params,
    x: jnp.ndarray,
    dims: ModelDimensions,
    t_real: Optional[int] = None,
    mesh=None,
) -> jnp.ndarray:
    """Encoder transformer stack + final LN on an embedded (B, T, D) input.

    Shared by the classical and quantum encoders (the quantum encoder only
    swaps the conv stem, reference quantum_whisper.py:130-144), so both get
    the tile-aligned fused-block/flash kernel paths.  Pass ``t_real`` when
    ``x`` arrives already tile-padded (rows >= t_real are zero padding).

    With ``mesh`` whose model axis is > 1 (and compatible head counts), the
    stack runs head-sharded under shard_map (parallel/sharded.py) — the
    attention kernel per shard plus explicit psums — instead of GSPMD
    weight-gathering around the fused kernels.
    """
    n_head = dims.n_audio_head
    T = t_real if t_real is not None else x.shape[1]

    if mesh is not None:
        from ..parallel import sharded as _sharded

        if _sharded.tp_trunk_applicable(dims, mesh, x.shape[0]):
            return _sharded.tp_trunk(params, x, dims, T, mesh)
        if _sharded.sp_trunk_applicable(dims, mesh, x.shape[0], T):
            # Heads don't divide the model axis: shard the TIME axis
            # instead (sequence parallelism, parallel/sharded.py).
            return _sharded.sp_trunk(params, x, dims, T, mesh)
        if _sharded.pp_trunk_applicable(dims, mesh, x.shape[0]):
            # Neither heads nor time divide: pipeline the LAYERS over the
            # model axis (GPipe microbatch schedule, parallel/sharded.py).
            return _sharded.pp_trunk(params, x, dims, T, mesh)

    # On TPU, run the transformer stack at a tile-aligned sequence length
    # (1500 -> 1536): the Pallas kernels then consume every layer's (B, T, D)
    # tensor in place, with zero pads/transposes per layer.  Padding rows mix
    # with real rows only through attention, where they are masked as keys;
    # their own (garbage) activations are sliced off at the end.
    Tp = (T + 127) // 128 * 128

    # Preferred path: the whole block as two Pallas kernels (LN + QKV +
    # attention + out-proj + residual; LN + MLP + residual) — row-major I/O
    # end to end, so the scan carry never changes layout and the per-layer
    # transpose fusions disappear (see ops/encoder_block.py header).
    from ..ops.encoder_block import fused_encoder_block

    if _trunk_uses_fused_blocks(dims, x.dtype, t_pad=Tp):
        if x.shape[1] != Tp:
            x = jnp.pad(x, ((0, 0), (0, Tp - x.shape[1]), (0, 0)))

        def block(x, bp):
            return fused_encoder_block(x, bp, n_head, T), None

        x, _ = jax.lax.scan(_maybe_remat(block), x, params["blocks"])
        if x.shape[1] != T:
            x = x[:, :T]
        return layer_norm(x, params["ln_post"])

    if _flash_enabled() and Tp != x.shape[1] and Tp >= 512:
        # Tp >= 512 mirrors attention()'s packed-kernel gate exactly: padding
        # is only safe when the kernel (which masks keys >= t_real) consumes
        # it - the XLA fallback would attend to the garbage padding keys.
        from ..ops.flash import packed_applicable

        if packed_applicable(n_head, dims.n_audio_state):
            x = jnp.pad(x, ((0, 0), (0, Tp - x.shape[1]), (0, 0)))

    def block(x, bp):
        x = x + _self_attn(
            bp["attn"], layer_norm(x, bp["attn_ln"]), n_head, t_real=T
        )
        x = x + _mlp(bp["mlp"], layer_norm(x, bp["mlp_ln"]))
        return x, None

    x, _ = jax.lax.scan(_maybe_remat(block), x, params["blocks"])
    if x.shape[1] != T:
        x = x[:, :T]
    return layer_norm(x, params["ln_post"])


# ---------------------------------------------------------------------------
# Decoder (teacher-forced full-context and cached incremental paths)
# ---------------------------------------------------------------------------


def decoder_apply(
    params: Params,
    tokens: jnp.ndarray,
    xa: jnp.ndarray,
    dims: ModelDimensions,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Teacher-forced decoder forward: tokens (B, T), xa (B, Ta, D) -> logits
    (B, T, vocab) in fp32."""
    B, T = tokens.shape
    n_head = dims.n_text_head
    x = params["tok_emb"][tokens] + params["pos_emb"][:T]
    x = x.astype(compute_dtype)
    xa = xa.astype(compute_dtype)
    causal = jnp.where(
        jnp.arange(T)[:, None] >= jnp.arange(T)[None, :], 0.0, -jnp.inf
    ).astype(jnp.float32)

    def block(x, bp):
        x = x + _self_attn(bp["attn"], layer_norm(x, bp["attn_ln"]), n_head, causal)
        xq = layer_norm(x, bp["cross_attn_ln"])
        q = linear(xq, bp["cross_attn"]["query"])
        k = linear(xa, bp["cross_attn"]["key"])
        v = linear(xa, bp["cross_attn"]["value"])
        x = x + linear(attention(q, k, v, n_head), bp["cross_attn"]["out"])
        x = x + _mlp(bp["mlp"], layer_norm(x, bp["mlp_ln"]))
        return x, None

    x, _ = jax.lax.scan(_maybe_remat(block), x, params["blocks"])
    x = layer_norm(x, params["ln"])
    logits = (x @ params["tok_emb"].astype(x.dtype).T).astype(jnp.float32)
    return logits


def init_kv_cache(
    dims: ModelDimensions, batch: int, dtype=jnp.float32,
    cross_batch: Optional[int] = None, ctx: Optional[int] = None,
    cross_int8: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Fixed-shape kv-cache pytree for incremental decoding.

    Self-attention caches are (L, B, n_text_ctx, D); cross-attention caches
    are filled once per audio segment by :func:`precompute_cross_kv`.

    ``cross_batch`` may be smaller than ``batch`` when ``batch`` is grouped
    (beam search / best-of sampling decode G hypotheses per audio): the cross
    K/V is identical across a group, so storing — and, critically, re-reading
    every token step — one copy per GROUP instead of per row divides the
    decode loop's dominant HBM stream by G.  ``batch`` must then be
    ``cross_batch * G`` with group-major row order.

    Layout: one buffer PER LAYER (lists of (B, T, D)), not a stacked
    (L, B, T, D) array.  Profiling the decode loop on-chip showed XLA
    materializing a full (B, Ta, D) copy of each layer's slice of the stacked
    cross cache inside every loop iteration (~0.8 ms per 88 MB copy at tiny
    B=64) — per-layer buffers are referenced directly and never copied.

    ``ctx`` bounds the self-attention cache length (default n_text_ctx).
    Decodes with a known short sample_len pass the actual reachable length:
    every step streams the WHOLE self cache through the MXU, so a 448-token
    buffer for a 64-token decode wastes 3× the dominant self-KV traffic.

    ``cross_int8`` stores the cross K/V quantized per (head, position) in the
    T-on-lanes layout consumed by ops/decode_attn.py — the decode loop's
    dominant HBM stream at half the bytes (opt-in: int8 rounding perturbs
    logits, so fp-exact token parity is not guaranteed).
    """
    L, D = dims.n_text_layer, dims.n_text_state
    T = min(ctx or dims.n_text_ctx, dims.n_text_ctx)
    Ta = dims.n_audio_ctx
    Bc = cross_batch or batch
    z = lambda *s: jnp.zeros(s, dtype)
    cache = {
        "self_k": [z(batch, T, D) for _ in range(L)],
        "self_v": [z(batch, T, D) for _ in range(L)],
        "idx": jnp.zeros((), jnp.int32),
    }
    if cross_int8:
        from ..ops.decode_attn import _round_up

        H = dims.n_text_head
        Tp = _round_up(Ta, 128)
        Dh = D // H
        cache["cross_k8"] = [jnp.zeros((Bc, H, Dh, Tp), jnp.int8) for _ in range(L)]
        cache["cross_sk"] = [jnp.zeros((Bc, H, Tp), jnp.float32) for _ in range(L)]
        cache["cross_v8"] = [jnp.zeros((Bc, H, Dh, Tp), jnp.int8) for _ in range(L)]
        cache["cross_sv"] = [jnp.zeros((Bc, H, Tp), jnp.float32) for _ in range(L)]
    else:
        cache["cross_k"] = [z(Bc, Ta, D) for _ in range(L)]
        cache["cross_v"] = [z(Bc, Ta, D) for _ in range(L)]
    return cache


def precompute_cross_kv(
    params: Params, xa: jnp.ndarray, cache: Dict, n_head: Optional[int] = None
) -> Dict:
    """Project encoder output to per-layer cross-attention K/V once.

    With an int8 cache (see :func:`init_kv_cache`), the projections are
    quantized here — once per audio segment — and the decode loop only ever
    streams int8 bytes."""
    if "cross_k8" in cache:
        from ..ops.decode_attn import quantize_kv

        L = len(cache["cross_k8"])
        xa = xa.astype(jnp.float32)
        out = {**cache, "cross_k8": [], "cross_sk": [], "cross_v8": [],
               "cross_sv": []}
        H = n_head if n_head is not None else cache["cross_sk"][0].shape[1]
        for l in range(L):
            bp = jax.tree.map(lambda p, _l=l: p[_l], params["blocks"])
            k8, sk = quantize_kv(linear(xa, bp["cross_attn"]["key"]), H)
            v8, sv = quantize_kv(linear(xa, bp["cross_attn"]["value"]), H)
            out["cross_k8"].append(k8)
            out["cross_sk"].append(sk)
            out["cross_v8"].append(v8)
            out["cross_sv"].append(sv)
        return out
    L = len(cache["cross_k"])
    xa = xa.astype(cache["cross_k"][0].dtype)
    ks, vs = [], []
    for l in range(L):
        bp = jax.tree.map(lambda p, _l=l: p[_l], params["blocks"])
        ks.append(linear(xa, bp["cross_attn"]["key"]))
        vs.append(linear(xa, bp["cross_attn"]["value"]))
    return {**cache, "cross_k": ks, "cross_v": vs}


def _grouped_cross_attention(q, k, v, n_head: int, groups: int):
    """Cross-attention where ``groups`` query rows share each K/V row.

    q: (B*G, T, D); k/v: (B, Ta, D).  Equivalent to attention(q, repeat(k),
    repeat(v)) but never materializes (or re-reads) the repeated K/V — the
    beam/best-of decode's cross-KV stream is G× smaller.
    """
    BG, T, D = q.shape
    B = k.shape[0]
    d_head = D // n_head
    scale = d_head**-0.25
    qh = (_split_heads(q, n_head) * scale).reshape(B, groups, n_head, T, d_head)
    kh = _split_heads(k, n_head) * scale
    vh = _split_heads(v, n_head)
    logits = jnp.einsum("bghqd,bhkd->bghqk", qh, kh).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bghqk,bhkd->bghqd", w, vh)
    return _merge_heads(out.reshape(BG, n_head, T, d_head))


def decoder_step(
    params: Params,
    tokens: jnp.ndarray,
    cache: Dict[str, jnp.ndarray],
    dims: ModelDimensions,
    compute_dtype=jnp.float32,
    logits_dtype=jnp.float32,
    offsets: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Incremental decoder forward over ``tokens`` (B, T_new) starting at
    cache position ``cache['idx']``.  Returns (logits (B, T_new, vocab) in
    ``logits_dtype``, updated cache).

    ``logits_dtype=bfloat16`` mirrors the reference's fp16 decode protocol
    (decoding.py runs the model and its logit filters in half precision when
    options.fp16) and halves the per-step (B, V) logits HBM traffic; score
    accumulation in the decode loop upcasts to fp32 regardless.

    The first call may pass the whole prompt (T_new = prompt length); later
    calls pass a single token (T_new = 1).  All shapes are static; the write
    offset is dynamic.  When the cache's cross batch is smaller than B (see
    :func:`init_kv_cache`), cross-attention runs grouped without replicating
    the cross K/V.

    ``offsets`` (B,) int32 gives each row its OWN write/position offset — the
    speculative-decode path (decode/speculative.py), where rows accept
    different numbers of draft tokens per round, rewinds per row by simply
    passing smaller offsets: stale cache rows at positions >= a row's offset
    are invisible (the causal mask admits keys by absolute position) and are
    overwritten before any query can see them.  With ``offsets`` the scalar
    ``cache['idx']`` is neither read nor advanced; the caller carries the
    per-row positions.
    """
    B, T_new = tokens.shape
    n_head = dims.n_text_head
    Tmax = cache["self_k"][0].shape[1]  # may be < n_text_ctx (bounded decode)
    L = dims.n_text_layer
    k_pos = jnp.arange(Tmax)
    if offsets is None:
        offset = cache["idx"]
        pos = jax.lax.dynamic_slice_in_dim(
            params["pos_emb"], offset, T_new, axis=0
        )
        # Mask over the full cache length: key j visible to query i (absolute
        # position offset+i) iff j <= offset+i.
        q_pos = offset + jnp.arange(T_new)
        mask = jnp.where(k_pos[None, :] <= q_pos[:, None], 0.0, -jnp.inf).astype(
            jnp.float32
        )
    else:
        # Per-row positions: gather position embeddings and build a per-row
        # causal mask (B, 1, T_new, Tmax).  Clamp the embedding index for
        # finished rows parked at the context edge (their outputs are masked
        # by the caller; the gather must still be in-bounds).
        q_pos = offsets[:, None] + jnp.arange(T_new)[None, :]  # (B, T_new)
        pos = params["pos_emb"][
            jnp.minimum(q_pos, params["pos_emb"].shape[0] - 1)
        ]
        mask = jnp.where(
            k_pos[None, None, :] <= q_pos[:, :, None], 0.0, -jnp.inf
        ).astype(jnp.float32)[:, None]
    x = (params["tok_emb"][tokens] + pos).astype(compute_dtype)

    # The layer loop is statically unrolled (not lax.scan), and the cache is
    # a list of PER-LAYER buffers: scanning over (or slicing) a stacked
    # (L, B, T, D) cache makes XLA materialize whole-layer copies inside the
    # decode loop (profiled at ~0.8 ms per cross slice at tiny B=64).  With
    # per-layer buffers each layer does one in-place dynamic_update_slice and
    # reads its caches with no data movement at all.
    self_k = list(cache["self_k"])
    self_v = list(cache["self_v"])
    int8_cross = "cross_k8" in cache
    cross_rows = (cache["cross_k8"] if int8_cross else cache["cross_k"])[0]
    groups = B // cross_rows.shape[0]
    zero = jnp.zeros((), jnp.int32)
    for l in range(L):
        bp = jax.tree.map(lambda p, _l=l: p[_l], params["blocks"])
        xn = layer_norm(x, bp["attn_ln"])
        q = linear(xn, bp["attn"]["query"])
        k_new = linear(xn, bp["attn"]["key"])
        v_new = linear(xn, bp["attn"]["value"])
        if offsets is None:
            self_k[l] = jax.lax.dynamic_update_slice(
                self_k[l], k_new, (zero, offset, zero)
            )
            self_v[l] = jax.lax.dynamic_update_slice(
                self_v[l], v_new, (zero, offset, zero)
            )
        else:
            self_k[l] = _rowwise_update(self_k[l], k_new, offsets)
            self_v[l] = _rowwise_update(self_v[l], v_new, offsets)
        x = x + linear(
            attention(q, self_k[l], self_v[l], n_head, mask), bp["attn"]["out"]
        )

        xq = layer_norm(x, bp["cross_attn_ln"])
        qc = linear(xq, bp["cross_attn"]["query"])
        if int8_cross:
            from ..ops.decode_attn import int8_cross_attention

            ca = int8_cross_attention(
                qc, cache["cross_k8"][l], cache["cross_sk"][l],
                cache["cross_v8"][l], cache["cross_sv"][l], n_head,
                dims.n_audio_ctx,
            ).astype(x.dtype)
        elif groups == 1:
            ca = attention(qc, cache["cross_k"][l], cache["cross_v"][l], n_head)
        else:
            ca = _grouped_cross_attention(
                qc, cache["cross_k"][l], cache["cross_v"][l], n_head, groups
            )
        x = x + linear(ca, bp["cross_attn"]["out"])
        x = x + _mlp(bp["mlp"], layer_norm(x, bp["mlp_ln"]))

    x = layer_norm(x, params["ln"])
    logits = (x @ params["tok_emb"].astype(x.dtype).T).astype(logits_dtype)
    new_cache = {
        **cache,
        "self_k": self_k,
        "self_v": self_v,
        # With per-row offsets the caller tracks positions itself; the
        # scalar idx is left untouched.
        "idx": cache["idx"] if offsets is not None else offset + T_new,
    }
    return logits, new_cache


def _rowwise_update(buf: jnp.ndarray, new: jnp.ndarray, offsets: jnp.ndarray):
    """Write ``new`` (B, T_new, D) into ``buf`` (B, Tmax, D) at a PER-ROW
    time offset (the speculative decode path's ragged cache append)."""
    zero = jnp.zeros((), jnp.int32)
    return jax.vmap(
        lambda b, n, o: jax.lax.dynamic_update_slice(b, n, (o, zero))
    )(buf, new, offsets)


def decoder_apply_with_cross_qk(
    params: Params,
    tokens: jnp.ndarray,
    xa: jnp.ndarray,
    dims: ModelDimensions,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced decoder forward that also returns the raw (pre-softmax,
    4th-root-scaled) cross-attention logits of every layer.

    Returns (logits (B, T, vocab) fp32, qk (L, B, H, T, Ta) fp32) - the
    word-timing alignment input the reference captures with forward hooks
    (model.py:94-110 qkv_attention's qk + timing.py:185-207); hooks are
    untraceable under jit so the scan stacks the per-layer weights instead.
    """
    B, T = tokens.shape
    n_head = dims.n_text_head
    d_head = dims.n_text_state // n_head
    scale = d_head**-0.25
    x = params["tok_emb"][tokens] + params["pos_emb"][:T]
    x = x.astype(compute_dtype)
    xa = xa.astype(compute_dtype)
    causal = jnp.where(
        jnp.arange(T)[:, None] >= jnp.arange(T)[None, :], 0.0, -jnp.inf
    ).astype(jnp.float32)

    def block(x, bp):
        x = x + _self_attn(bp["attn"], layer_norm(x, bp["attn_ln"]), n_head, causal)
        xq = layer_norm(x, bp["cross_attn_ln"])
        q = linear(xq, bp["cross_attn"]["query"])
        k = linear(xa, bp["cross_attn"]["key"])
        v = linear(xa, bp["cross_attn"]["value"])
        qh = _split_heads(q, n_head) * scale
        kh = _split_heads(k, n_head) * scale
        vh = _split_heads(v, n_head)
        qk = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
        w = jax.nn.softmax(qk, axis=-1).astype(x.dtype)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w, vh))
        x = x + linear(out, bp["cross_attn"]["out"])
        x = x + _mlp(bp["mlp"], layer_norm(x, bp["mlp_ln"]))
        return x, qk

    x, qks = jax.lax.scan(block, x, params["blocks"])
    x = layer_norm(x, params["ln"])
    logits = (x @ params["tok_emb"].astype(x.dtype).T).astype(jnp.float32)
    return logits, qks


# ---------------------------------------------------------------------------
# Whole-model conveniences
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("dims", "compute_dtype", "mesh"))
def forward(
    params: Params,
    mel: jnp.ndarray,
    tokens: jnp.ndarray,
    dims: ModelDimensions,
    compute_dtype=jnp.float32,
    mesh=None,
) -> jnp.ndarray:
    """Full forward (reference Whisper.forward, model.py:293-296).

    ``mesh`` is static (a hashable jax.sharding.Mesh): passing it keys the
    jit cache per mesh and routes the encoder through the explicit
    tensor-parallel trunk when applicable; None = single-device or plain
    GSPMD behavior."""
    xa = encoder_apply(params["encoder"], mel, dims, compute_dtype, mesh=mesh)
    return decoder_apply(params["decoder"], tokens, xa, dims, compute_dtype)


def is_multilingual(dims: ModelDimensions) -> bool:
    return dims.n_vocab >= 51865


def num_languages(dims: ModelDimensions) -> int:
    return dims.n_vocab - 51765 - int(is_multilingual(dims))

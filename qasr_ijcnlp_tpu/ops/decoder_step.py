"""Fused decoder-layer step kernel (one Pallas call per decoder layer).

The decode loop's per-token cost at realistic batch is bound by the ~50
sequential XLA fusion boundaries of the unfused step, not by HBM bytes
(docs/BENCHMARKS.md "Where the remaining decode time goes"): at tiny B=64
the step moves ~700 MB in 1.46 ms (~57% of the chip's bandwidth), while at
B=512 the same code is already at ~87% of its roofline.  A fully resident
multi-layer kernel is impossible on this chip — the scoped-VMEM limit is
16 MB and tiny's four decoder layers alone hold 16.5 MB of bf16 weights —
so this module fuses ONE LAYER per kernel, collapsing the twelve-plus
boundaries of a layer (LN, q/k/v, cache update, self-attention, cross LN/q,
cross-attention, out-proj, MLP) into a single pallas_call.  Per step that
leaves ~4 kernel calls + embed + logits instead of ~50 fusions.

Layout: the K/V caches live T-ON-LANES — (B, D, T) instead of (B, T, D).
NOTE (round 5): this layout choice was based on a broken measurement
harness; the repaired scripts/bench_step_formulations.py ranks the
row-major block-diagonal batched formulation (mxu_r, 632 GB/s) ABOVE this
kernel's per-row T-on-lanes one (mxu_t, 500 GB/s) — and shows even the
pure-DMA Pallas floor (~710-760 GB/s) cannot beat the XLA step's achieved
≥84%-of-floor end-to-end rate, which is why the kernel is retired to
opt-in rather than rewritten (docs/BENCHMARKS.md round-5 section).  Each
(batch-tile, chunk) grid cell runs, per row, one (H, D) x (D, CHUNK) MXU
matmul for logits and one (D, CHUNK) x (CHUNK->H) for PV, with online
softmax across chunks; the fourth-root attention scale is folded into q
(q * dh**-0.5) so the streamed K is consumed unscaled.

Grid: (B / BT, Cs + Cc).  The first Cs steps stream the self cache, the
rest the cross cache; LN + q/k/v projections run once at c == 0, the
out-projection + MLP at the last step.  The fresh token's k/v never touch
HBM inside the kernel: the self chunk containing position ``idx`` swaps in
the in-register k_new/v_new by lane mask, and the caller commits the same
k_new/v_new to the HBM cache with a lane-column dynamic_update_slice after
the call (models/whisper.py decoder_step).

Replaces (opt-in only): the serial per-token decode of the reference
(/root/reference/whisper/whisper/decoding.py:680-710 via model.py:111-146).
Numerics follow the XLA path's policy (fp32 LN/softmax, bf16 matmul I/O,
f32 MXU accumulation) but are NOT bit-identical to the unfused step: the
online-softmax chunking reorders the fp reductions, so logits drift at
bf16 scale (measured max |delta| ~1.6e-2 at B=512 random-init).  Parity is
pinned in tests/test_decoder_step_kernel.py (interpret mode on CPU: logits
within tolerance + argmax stability on separated logits); the on-chip A/B
lives in scripts/bench_fused_step.py.  Because the round-4 A/B measured
this formulation ~2x SLOWER than the unfused XLA step at the headline
protocol, it ships default-OFF (see _ENABLED below).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import round_up as _round_up

BT = 8           # batch rows per grid cell
SELF_CHUNK = 128  # lanes per self-cache chunk

# Default OFF: the round-4 on-chip A/B (scripts/bench_fused_step.py) measured
# the fused formulation at ~9.6k RTF vs ~19.2k for the unfused XLA step at
# the bench protocol (B=512, 64 steps) — the per-row H-row matmuls waste
# ~90% of MXU rows, and restreaming the full cross cache per token loses to
# XLA's batched step.  It remains available as an opt-in research path
# (set_fused_decoder_step(True)); re-enable by default only behind a measured
# win at the bench.py protocol.  None = OFF.
_ENABLED: Optional[bool] = None


def set_fused_decoder_step(enabled: Optional[bool]) -> None:
    global _ENABLED
    _ENABLED = enabled


def fused_step_enabled() -> bool:
    if _ENABLED is None:
        return False
    return bool(_ENABLED)


def _cross_chunk(d_model: int) -> int:
    # VMEM budget (16 MB scoped limit): weights 14*D^2 bf16 single-buffered
    # + self (BT, D, 128) x2 x2(double-buffer) + cross (BT, D, CC) x4.
    # tiny (D=384, weights 4.1 MB) affords 256-lane cross chunks (13.6 MB
    # total); base (D=512, weights 7.3 MB) needs 128 (15.7 MB).
    return 256 if d_model <= 384 else 128


def fused_step_applicable(n_head: int, d_model: int, batch: int,
                          groups: int = 1) -> bool:
    return (
        d_model in (384, 512)            # tiny/base: weights fit scoped VMEM
        and d_model % n_head == 0
        and d_model // n_head == 64      # whole family is dh=64
        and batch % BT == 0
        and groups == 1                  # beam pools keep the unfused path
    )


def _ln_f32(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * g + b


def _erf_f32(x):
    # Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7, below bf16 resolution);
    # same polynomial as ops/encoder_block.py.
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    return x * 0.5 * (1.0 + _erf_f32(x * 0.7071067811865476))


def _head_bcast(vals, D: int, DH: int, H: int):
    """(H,) f32 per-head scalars -> (D,) lane vector (static unroll over H;
    Mosaic has no 1D gather)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (D,), 0) // DH
    out = jnp.zeros((D,), vals.dtype)
    for h in range(H):
        out = jnp.where(lane == h, vals[h], out)
    return out


def _kernel(
    # scalar prefetch
    idx_ref,
    # blocks
    x_ref, kself_ref, vself_ref, kcross_ref, vcross_ref,
    ln1g, ln1b, wq, bq, wk, wv, bv, wo, bo,
    lncg, lncb, wcq, bcq, wco, bco,
    ln2g, ln2b, wf, bf, wp, bp,
    # outputs
    xo_ref, kn_ref, vn_ref,
    # scratch
    xmid_s, qs_s, qc_s, kn_s, vn_s, m_s, s_s, acc_s,
    *, n_head: int, d_model: int, cs: int, cc: int, cross_chunk: int,
    t_real_cross: int,
):
    H, D, DH = n_head, d_model, d_model // n_head
    c = pl.program_id(1)
    idx = idx_ref[0]
    scale2 = jnp.float32(float(DH) ** -0.5)  # both 4th-root factors on q

    @pl.when(c == 0)
    def _prep():
        x = x_ref[...]                                        # (BT, D) bf16
        h = _ln_f32(x, ln1g[0, :], ln1b[0, :]).astype(x.dtype)
        q = (jnp.dot(h, wq[...], preferred_element_type=jnp.float32)
             + bq[0, :])
        kn = jnp.dot(h, wk[...], preferred_element_type=jnp.float32)
        vn = (jnp.dot(h, wv[...], preferred_element_type=jnp.float32)
              + bv[0, :])
        qs_s[...] = q * scale2
        kn_s[...] = kn
        vn_s[...] = vn
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        s_s[...] = jnp.zeros_like(s_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    in_self = c < cs

    # ---- streamed attention chunk (self for c < cs, cross after) ----
    # Per row: logits (H, CH) = Qexp (H, D) @ K (D, CH); online softmax;
    # PV (D, H) = V (D, CH) @ P^T; head-diagonal -> acc (D,).
    row_i = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
    qsel = (lane_d // DH) == row_i
    hsel = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // DH
            == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))

    mm_dt = x_ref.dtype  # matmul I/O dtype follows the activations

    def attend_chunk(i, k_chunk, v_chunk, qrow, lane_mask):
        """One row's chunk update.  k/v_chunk (D, CH) f32; qrow (D,) f32;
        lane_mask (CH,) True where the key position is visible."""
        qexp = jnp.where(qsel, qrow[None, :], 0.0).astype(mm_dt)
        lg = jax.lax.dot_general(
            qexp, k_chunk.astype(mm_dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (H, CH)
        lg = jnp.where(lane_mask[None, :], lg, -jnp.inf)
        m_old = m_s[i]
        m_new = jnp.maximum(m_old, jnp.max(lg, axis=-1))
        # exp(-inf - -inf) guard: rows with no visible lane keep m = -inf
        corr = jnp.where(m_new == -jnp.inf, 1.0, jnp.exp(m_old - m_new))
        p = jnp.where(lane_mask[None, :],
                      jnp.exp(lg - m_new[:, None]), 0.0)      # (H, CH)
        s_s[i] = s_s[i] * corr + jnp.sum(p, axis=-1)
        m_s[i] = m_new
        pv = jax.lax.dot_general(
            v_chunk.astype(mm_dt), p.astype(mm_dt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (D, H)
        acc_s[i] = (acc_s[i] * _head_bcast(corr, D, DH, H)
                    + jnp.sum(jnp.where(hsel, pv, 0.0), axis=-1))

    @pl.when(in_self)
    def _self_chunk():
        base = c * SELF_CHUNK
        gl = base + jax.lax.broadcasted_iota(jnp.int32, (SELF_CHUNK,), 0)
        vis = gl <= idx
        fresh = gl == idx                                     # (CH,)
        for i in range(BT):
            # swap the in-register fresh k/v into the lane at idx (the HBM
            # cache row there is stale; the caller commits it after)
            kc = jnp.where(fresh[None, :], kn_s[i][:, None],
                           kself_ref[i].astype(jnp.float32))
            vc = jnp.where(fresh[None, :], vn_s[i][:, None],
                           vself_ref[i].astype(jnp.float32))
            attend_chunk(i, kc, vc, qs_s[i], vis)

    @pl.when(jnp.logical_and(in_self, c == cs - 1))
    def _self_done():
        # finalize self attention -> out proj -> residual -> cross LN/q;
        # reset the online-softmax state for the cross phase
        den = jnp.stack([_head_bcast(s_s[i], D, DH, H) for i in range(BT)])
        attn = (acc_s[...] / den).astype(xo_ref.dtype)        # (BT, D)
        xmid = x_ref[...] + (
            jnp.dot(attn, wo[...], preferred_element_type=jnp.float32)
            + bo[0, :]
        ).astype(xo_ref.dtype)
        xmid_s[...] = xmid
        hc = _ln_f32(xmid, lncg[0, :], lncb[0, :]).astype(xmid.dtype)
        qc = (jnp.dot(hc, wcq[...], preferred_element_type=jnp.float32)
              + bcq[0, :])
        qc_s[...] = qc * scale2
        m_s[...] = jnp.full_like(m_s, -jnp.inf)
        s_s[...] = jnp.zeros_like(s_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(jnp.logical_not(in_self))
    def _cross_chunk_step():
        base = (c - cs) * cross_chunk
        gl = base + jax.lax.broadcasted_iota(jnp.int32, (cross_chunk,), 0)
        vis = gl < t_real_cross
        for i in range(BT):
            attend_chunk(i, kcross_ref[i].astype(jnp.float32),
                         vcross_ref[i].astype(jnp.float32), qc_s[i], vis)

    @pl.when(c == cs + cc - 1)
    def _finish():
        den = jnp.stack([_head_bcast(s_s[i], D, DH, H) for i in range(BT)])
        ca = (acc_s[...] / den).astype(xo_ref.dtype)
        x2 = xmid_s[...] + (
            jnp.dot(ca, wco[...], preferred_element_type=jnp.float32)
            + bco[0, :]
        ).astype(xo_ref.dtype)
        h2 = _ln_f32(x2, ln2g[0, :], ln2b[0, :]).astype(x2.dtype)
        t = _gelu_f32(
            jnp.dot(h2, wf[...], preferred_element_type=jnp.float32)
            + bf[0, :]
        ).astype(x2.dtype)
        xo_ref[...] = x2 + (
            jnp.dot(t, wp[...], preferred_element_type=jnp.float32)
            + bp[0, :]
        ).astype(x2.dtype)
        kn_ref[...] = kn_s[...].astype(kn_ref.dtype)
        vn_ref[...] = vn_s[...].astype(vn_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "t_real_cross", "interpret"),
)
def _layer_step_impl(
    x, idx, kself, vself, kcross, vcross, *weights,
    n_head: int, t_real_cross: int, interpret: bool,
):
    B, D = x.shape
    dt = x.dtype
    Ts = kself.shape[2]
    Tc = kcross.shape[2]
    CC = _cross_chunk(D)
    assert Ts % SELF_CHUNK == 0 and Tc % CC == 0
    cs, cc = Ts // SELF_CHUNK, Tc // CC
    H = n_head

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, c, *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    row = lambda: pl.BlockSpec((BT, D), lambda b, c, *_: (b, 0),
                               memory_space=pltpu.VMEM)
    selfspec = lambda: pl.BlockSpec(
        (BT, D, SELF_CHUNK),
        lambda b, c, *_: (b, 0, jnp.minimum(c, cs - 1)),
        memory_space=pltpu.VMEM,
    )
    crossspec = lambda: pl.BlockSpec(
        (BT, D, CC),
        lambda b, c, *_: (b, 0, jnp.clip(c - cs, 0, cc - 1)),
        memory_space=pltpu.VMEM,
    )
    F = weights[17].shape[1]  # wf: (D, F)
    wspecs = [
        const((1, D)), const((1, D)),      # ln1 g, b (f32)
        const((D, D)), const((1, D)),      # wq, bq
        const((D, D)),                     # wk
        const((D, D)), const((1, D)),      # wv, bv
        const((D, D)), const((1, D)),      # wo, bo
        const((1, D)), const((1, D)),      # cross ln g, b
        const((D, D)), const((1, D)),      # wcq, bcq
        const((D, D)), const((1, D)),      # wco, bco
        const((1, D)), const((1, D)),      # mlp ln g, b
        const((D, F)), const((1, F)),      # wf, bf
        const((F, D)), const((1, D)),      # wp, bp
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BT, cs + cc),
        in_specs=[row(), selfspec(), selfspec(), crossspec(), crossspec()]
        + wspecs,
        out_specs=[row(), row(), row()],
        scratch_shapes=[
            pltpu.VMEM((BT, D), dt),            # xmid
            pltpu.VMEM((BT, D), jnp.float32),   # q (self, scaled)
            pltpu.VMEM((BT, D), jnp.float32),   # q (cross, scaled)
            pltpu.VMEM((BT, D), jnp.float32),   # k_new
            pltpu.VMEM((BT, D), jnp.float32),   # v_new
            pltpu.VMEM((BT, H), jnp.float32),   # online max
            pltpu.VMEM((BT, H), jnp.float32),   # online denom
            pltpu.VMEM((BT, D), jnp.float32),   # online PV accumulator
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, D), dt),       # x out
        jax.ShapeDtypeStruct((B, D), dt),       # k_new
        jax.ShapeDtypeStruct((B, D), dt),       # v_new
    ]
    kern = functools.partial(
        _kernel, n_head=n_head, d_model=D, cs=cs, cc=cc, cross_chunk=CC,
        t_real_cross=t_real_cross,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(idx, x, kself, vself, kcross, vcross, *weights)


def _flatten_weights(bp, dt):
    """Per-layer parameter pytree -> the kernel's flat weight tuple."""
    w = lambda p: p.astype(dt)
    f32r = lambda p: p.reshape(1, -1).astype(jnp.float32)
    a, ca, m = bp["attn"], bp["cross_attn"], bp["mlp"]
    D = a["query"]["w"].shape[0]
    F = m["fc"]["w"].shape[1]
    return (
        f32r(bp["attn_ln"]["g"]), f32r(bp["attn_ln"]["b"]),
        w(a["query"]["w"]), w(a["query"]["b"].reshape(1, D)),
        w(a["key"]["w"]),
        w(a["value"]["w"]), w(a["value"]["b"].reshape(1, D)),
        w(a["out"]["w"]), w(a["out"]["b"].reshape(1, D)),
        f32r(bp["cross_attn_ln"]["g"]), f32r(bp["cross_attn_ln"]["b"]),
        w(ca["query"]["w"]), w(ca["query"]["b"].reshape(1, D)),
        w(ca["out"]["w"]), w(ca["out"]["b"].reshape(1, D)),
        f32r(bp["mlp_ln"]["g"]), f32r(bp["mlp_ln"]["b"]),
        w(m["fc"]["w"]), w(m["fc"]["b"].reshape(1, F)),
        w(m["proj"]["w"]), w(m["proj"]["b"].reshape(1, D)),
    )


@functools.lru_cache(maxsize=None)
def _sharded_layer_op(n_head: int, t_real_cross: int, interpret: bool):
    """Batch-partitioned wrapper (ops/partition.py): under GSPMD every
    batch-leading operand (x, idx is replicated via... idx is scalar) —
    x and the four cache buffers shard on batch; weights replicate."""
    from .partition import batch_partitioned

    def impl(x, kself, vself, kcross, vcross, idx, *weights):
        xo, kn, vn = _layer_step_impl(
            x, idx, kself, vself, kcross, vcross, *weights,
            n_head=n_head, t_real_cross=t_real_cross, interpret=interpret,
        )
        # batch_partitioned expects ONE result; stack the three (B, D)
        # outputs along a trailing axis so the batch dim stays leading.
        return jnp.stack([xo, kn, vn], axis=1)  # (B, 3, D)

    ranks = (2, 3, 3, 3, 3, 1) + (2,) * 21
    return batch_partitioned(impl, ranks, 3, n_batched=5)


def fused_decoder_layer_step(
    x: jnp.ndarray,          # (B, D) current activations
    bp,                      # per-layer parameter pytree
    kself: jnp.ndarray,      # (B, D, Ts) T-on-lanes self K cache
    vself: jnp.ndarray,
    kcross: jnp.ndarray,     # (B, D, Tc) T-on-lanes cross K cache
    vcross: jnp.ndarray,
    idx: jnp.ndarray,        # () int32 write/query position
    n_head: int,
    t_real_cross: int,
):
    """One decoder layer's single-token step, fused.

    Returns (x_new (B, D), k_new (B, D), v_new (B, D)); the caller commits
    k_new/v_new into the caches at lane ``idx`` (a lane-column
    dynamic_update_slice — the kernel already attended to the fresh values
    in-register, so the commit only needs to land before the NEXT step).
    """
    weights = _flatten_weights(bp, x.dtype)
    op = _sharded_layer_op(
        n_head, t_real_cross, jax.default_backend() != "tpu"
    )
    out = op(x, kself, vself, kcross, vcross,
             jnp.asarray(idx, jnp.int32).reshape(1), *weights)
    return out[:, 0, :], out[:, 1, :], out[:, 2, :]


# ---------------------------------------------------------------------------
# Full-step wrapper: drop-in for models.whisper.decoder_step on the greedy
# single-token path (decode/loop.py picks it when applicable).
# ---------------------------------------------------------------------------


def fused_cache_applicable(cache, dims, batch: int) -> bool:
    """True when the unfused cache produced by ``_prompt_pass`` can be
    converted to the fused T-on-lanes layout: fp cross K/V (not int8),
    ungrouped (cross batch == batch), and a kernel-supported geometry."""
    return (
        "cross_k" in cache
        and cache["cross_k"][0].shape[0] == batch
        and fused_step_applicable(
            dims.n_text_head, dims.n_text_state, batch
        )
    )


def to_fused_cache(cache, dims):
    """Convert an unfused kv-cache (models.whisper.init_kv_cache layout,
    lists of (B, T, D)) to the kernel's T-on-lanes layout (lists of
    (B, D, Tpad)), padding T to the kernel's chunk multiples.  Padded lanes
    are invisible: self keys past ``idx`` are masked by position, cross keys
    past ``t_real_cross = dims.n_audio_ctx`` by the visibility mask.
    """
    D = dims.n_text_state
    CC = _cross_chunk(D)

    def tol(buf, mult):  # (B, T, D) -> (B, D, Tpad)
        t = buf.shape[1]
        out = jnp.swapaxes(buf, 1, 2)
        pad = _round_up(t, mult) - t
        if pad:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, pad)))
        return out

    return {
        "fself_k": [tol(k, SELF_CHUNK) for k in cache["self_k"]],
        "fself_v": [tol(v, SELF_CHUNK) for v in cache["self_v"]],
        "fcross_k": [tol(k, CC) for k in cache["cross_k"]],
        "fcross_v": [tol(v, CC) for v in cache["cross_v"]],
        "idx": cache["idx"],
    }


def fused_decoder_step(
    params,
    tokens: jnp.ndarray,     # (B, 1) — single-token steps only
    cache,                   # fused-layout cache from to_fused_cache
    dims,
    compute_dtype=jnp.float32,
    logits_dtype=jnp.float32,
):
    """Single-token incremental decoder step over the fused per-layer
    kernel; same signature/result contract as models.whisper.decoder_step
    restricted to T_new == 1 and scalar ``idx`` (no per-row offsets).
    """
    B, t_new = tokens.shape
    assert t_new == 1, "fused path is single-token only"
    idx = cache["idx"]
    pos = jax.lax.dynamic_slice_in_dim(params["pos_emb"], idx, 1, axis=0)
    x = (params["tok_emb"][tokens[:, 0]] + pos[0]).astype(compute_dtype)
    fk = list(cache["fself_k"])
    fv = list(cache["fself_v"])
    zero = jnp.zeros((), jnp.int32)
    for l in range(dims.n_text_layer):
        bp = jax.tree.map(lambda p, _l=l: p[_l], params["blocks"])
        x, kn, vn = fused_decoder_layer_step(
            x, bp, fk[l], fv[l],
            cache["fcross_k"][l], cache["fcross_v"][l],
            idx, dims.n_text_head, t_real_cross=dims.n_audio_ctx,
        )
        # Commit the fresh k/v to lane ``idx``; the kernel already attended
        # to them in-register this step.
        fk[l] = jax.lax.dynamic_update_slice(
            fk[l], kn[:, :, None].astype(fk[l].dtype), (zero, zero, idx)
        )
        fv[l] = jax.lax.dynamic_update_slice(
            fv[l], vn[:, :, None].astype(fv[l].dtype), (zero, zero, idx)
        )
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    xn = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * params["ln"]["g"]
          + params["ln"]["b"]).astype(x.dtype)
    logits = (xn @ params["tok_emb"].astype(x.dtype).T).astype(logits_dtype)
    new_cache = {**cache, "fself_k": fk, "fself_v": fv, "idx": idx + 1}
    return logits[:, None, :], new_cache

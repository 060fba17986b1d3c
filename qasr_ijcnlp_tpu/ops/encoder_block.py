"""Fully fused encoder transformer block (two Pallas kernels per layer).

Round-2 profiling of the encoder at production batch (scripts/
profile_decode.py encoder 512) showed the per-layer cost split ~28.6 ms in
the flash attention kernel (18k grid cells of ~1.5 us: grid-step bound) and
~26.7 ms in XLA "add_add" fusions that were really layout transposes — the
scan carry lived T-on-lanes ({1,2,0}) while the Pallas kernel consumed
row-major (B, T, D), so every layer paid two 604 MB transposes.  Total:
~66 ms/layer against a ~12 ms MXU floor.

This module replaces the whole block

    x + out_proj(attn(LN(x)))  ->  + mlp_proj(gelu(mlp_fc(LN(..))))

with two kernels whose every input and output is the model's own row-major
(B, T, D) tensor:

* ``_attn_kernel``: grid (B, H) — one cell owns one (batch item, head).
  LN and that head's q/k/v projections happen in VMEM (the per-head weight
  column slices mean the total projection FLOPs are unchanged; only the
  cheap LN is recomputed per head), then a ``fori_loop`` over query tiles
  runs softmax(QK^T)V without the (T, T) logits matrix ever reaching HBM.
  The input block index is constant in the head dimension, so Pallas keeps
  x resident — one fetch per batch item.
* ``_finish_kernel``: grid (B, T/MT) row tiles — attention out-projection,
  residual, LN, fc, exact (erf) gelu, proj, residual.

Between two Pallas kernels XLA has nothing to re-layout, so the transpose
fusions disappear as well.

Replaces: torch SDPA + block module of the reference
(/root/reference/whisper/whisper/model.py:111-146) on the TPU encoder path.
Backward: custom VJP through the mathematically identical XLA formulation
(same trick as ops/flash.py), so training runs with the fused forward.

Applicability (checked by :func:`fused_block_applicable`): D % 128 == 0 and
d_head in {64, 128}; covers every Whisper family member (all have dh=64).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 128   # query-tile rows inside the attention kernel
MT = 512   # row tile of the finish (out-proj + MLP) kernel


from . import round_up as _round_up  # noqa: E402


def _pick_bq(d_model: int, t_pad: int) -> int:
    """Query-tile rows for the attention kernel.  Bigger tiles amortize
    per-iteration overhead (measured 62.5 -> 55.1 ms/block at B=512 tiny);
    the f32 logits tile plus block buffers approach VMEM as D grows, so
    base/small run 256 rows and medium+ 128.  Shared by the fused block and
    the head-sharded TP attention so a retune can't leave the two entry
    points on different tile sizes."""
    if d_model <= 384 and t_pad % 512 == 0:
        return 512
    if d_model <= 768 and t_pad % 256 == 0:
        return 256
    return BQ


def fused_block_applicable(
    n_head: int, d_model: int, t_pad: int, mlp_width: Optional[int] = None
) -> bool:
    # The Whisper family's MLP is always 4*D; a caller with custom dims must
    # pass the real fc width or the F-tiled finish kernel asserts at trace
    # time instead of falling back.
    F = 4 * d_model if mlp_width is None else mlp_width
    return (
        # tiny/base use the resident-MLP finish kernel; small/medium
        # (768/1024) the F-tiled one with chunked LN; large (1280) the
        # F-tiled one with narrower (128-row, 512-col) tiles so the block
        # set fits VMEM.  Whole family covered.
        d_model <= 1280
        # the F-tiled finish (D > 512) streams FT-wide MLP column blocks
        and (d_model <= 512 or F % _finish_tiles(d_model)[1] == 0)
        and t_pad % MT == 0
        and attn_applicable(n_head, d_model, t_pad)
    )


def _finish_tiles(d_model: int):
    """(row tile MT2, MLP column tile FT) of the F-tiled finish kernel.

    The resident set per grid cell is ~ D*D*2 (out-proj weight) + 3*MT2*D*2
    (row tiles) + 2*FT*D*2*2 (double-buffered fc/proj blocks) + MT2*D*8
    (scratch) bytes; 256/1024 fits 16 MB VMEM up to D=1024, large (1280)
    needs the narrower 128/512 tiles."""
    return (256, 1024) if d_model <= 1024 else (128, 512)


def attn_applicable(
    n_head: int, d_model: int, t_pad: int, d_head: Optional[int] = None
) -> bool:
    """Gate for the attention kernel alone (also used head-sharded by the
    tensor-parallel trunk, parallel/sharded.py, where ``n_head`` is the
    per-shard head count, ``d_model`` stays the full model width, and
    ``d_head`` must be passed explicitly since d_model/n_head no longer
    equals it)."""
    if d_head is None:
        d_head = d_model // n_head if d_model % n_head == 0 else 0
    return (
        d_model % 128 == 0
        # heads must tile into 128-lane groups
        and (d_head == 128 or (d_head == 64 and n_head % 2 == 0))
        and t_pad % BQ == 0
        and t_pad % 256 == 0   # LN row-chunk size
    )


def _erf_f32(x):
    """erf for the Mosaic kernel (no erf/erfc primitive): Abramowitz-Stegun
    7.1.26 rational approximation, max abs error 1.5e-7 — far below bf16
    resolution, so the fused block's gelu matches the XLA exact-erf gelu."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    xf = x.astype(jnp.float32)
    half = xf * 0.5
    inner = xf * jnp.float32(0.7071067811865476)
    return (half * (1.0 + _erf_f32(inner))).astype(x.dtype)


def _ln_f32(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


def _attn_kernel(
    x_ref, mask_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref,
    o_ref, q_s, ve_s, kk_s, *, t_real: int, dh: int, bq: int = BQ,
    unroll: int = 1,
):
    """One (batch item, 128-lane head group): softmax(qh kh^T) vh, all rows.

    A group is 128 // dh heads (2 for every Whisper member, dh=64), so every
    weight/output block is a full 128-lane tile.

    VPU economy (the kernel is softmax-bound at dh=64, where the MXU dots
    cost only ~128 FLOPs per logit element):
    * the key-padding mask arrives as a precomputed additive (1, Tp) row
      (``mask_ref``) — one fused add instead of iota+compare+select per tile;
    * V is augmented with a ones-column block (``ve_s``), so the softmax
      denominator falls out of the same MXU dot as PV — lanes dh..2dh of the
      product are sum(p) — replacing a multi-pass cross-lane reduction.

    LN + this group's projections stream through 256-row chunks (row-local,
    so chunking is exact): the whole-row fp32 LN/projection transients are
    what pushed D=1024 past the VMEM limit.  Weight blocks are (D, W)
    column slices, so summed over the grid cells the projection FLOPs equal
    the full (D, D) projections of the unfused path.
    """
    Tp = q_s.shape[0]
    W = o_ref.shape[-1]                # 128
    dt = o_ref.dtype
    scale = dt.type(float(dh) ** -0.25)
    HB = W // dh

    # Chunked LN+projections only where needed: the fp32 transients fit
    # VMEM up to small (D=768), and one full-row pass is ~4% faster at
    # tiny than 6 chunked ones; medium must chunk.
    D = x_ref.shape[-1]
    LNC = Tp if D <= 768 else 256
    ones = jnp.ones((LNC, dh), dt)

    def projchunk(i, _):
        rows = pl.ds(i * LNC, LNC)
        hc = _ln_f32(x_ref[0, rows, :], g_ref[:], b_ref[:])
        kk_s[rows, :] = (
            jnp.dot(hc, wk_ref[:], preferred_element_type=jnp.float32)
            .astype(dt) * scale
        )
        vc = (
            jnp.dot(hc, wv_ref[:], preferred_element_type=jnp.float32)
            .astype(dt) + bv_ref[:]
        )
        for hi in range(HB):
            ve_s[rows, 2 * hi * dh:(2 * hi + 1) * dh] = (
                vc[:, hi * dh:(hi + 1) * dh]
            )
            ve_s[rows, (2 * hi + 1) * dh:(2 * hi + 2) * dh] = ones
        q_s[rows, :] = (
            jnp.dot(hc, wq_ref[:], preferred_element_type=jnp.float32)
            .astype(dt) + bq_ref[:]
        ) * scale
        return 0

    jax.lax.fori_loop(0, Tp // LNC, projchunk, 0)
    kk = kk_s[:]

    def tile(qt, _):
        for hi in range(HB):
            qh = q_s[pl.ds(qt * bq, bq), hi * dh:(hi + 1) * dh]
            kh = kk[:, hi * dh:(hi + 1) * dh]
            logits = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, Tp) f32
            if t_real != Tp:
                logits = logits + mask_ref[:]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = (jnp.exp(logits - m)).astype(dt)
            ve = ve_s[:, 2 * hi * dh:2 * (hi + 1) * dh]  # [vh | ones]
            pv = jax.lax.dot_general(
                p, ve,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bq, 2*dh): [p@vh | sum(p) broadcast]
            out = pv[:, :dh] / pv[:, dh:dh + 1]
            o_ref[0, pl.ds(qt * bq, bq), hi * dh:(hi + 1) * dh] = (
                out.astype(dt)
            )
        return 0

    jax.lax.fori_loop(0, Tp // bq, tile, 0, unroll=unroll)


def _finish_kernel(
    x_ref, attn_ref, wo_ref, bo_ref, g_ref, b_ref, wf_ref, bf_ref,
    wp_ref, bp_ref, o_ref,
):
    """Row tile: out-projection + residual, then LN + MLP + residual."""
    x = x_ref[0]                       # (MT, D)
    r = x + (
        jnp.dot(attn_ref[0], wo_ref[:], preferred_element_type=jnp.float32)
        .astype(x.dtype) + bo_ref[:]
    )
    h = _ln_f32(r, g_ref[:], b_ref[:])
    t = _gelu_exact(
        jnp.dot(h, wf_ref[:], preferred_element_type=jnp.float32)
        .astype(x.dtype) + bf_ref[:]
    )
    o_ref[0] = r + (
        jnp.dot(t, wp_ref[:], preferred_element_type=jnp.float32)
        .astype(x.dtype) + bp_ref[:]
    )


def _finish_kernel_ftiled(
    x_ref, attn_ref, wo_ref, bo_ref, g_ref, b_ref, wf_ref, bf_ref,
    wp_ref, bp_ref, o_ref, r_s, h_s, acc_s,
):
    """F-tiled finish for D > 512: the (D, 4D) MLP weights don't fit VMEM
    whole, so the innermost grid dim streams (D, FT) / (FT, D) column/row
    blocks and accumulates partial proj outputs in fp32 scratch; the
    residual and LN are computed once per row tile at f == 0."""
    f = pl.program_id(2)
    nf = pl.num_programs(2)
    x = x_ref[0]                       # (MT, D)

    @pl.when(f == 0)
    def _():
        r = x + (
            jnp.dot(attn_ref[0], wo_ref[:],
                    preferred_element_type=jnp.float32)
            .astype(x.dtype) + bo_ref[:]
        )
        r_s[:] = r
        h_s[:] = _ln_f32(r, g_ref[:], b_ref[:])
        acc_s[:] = jnp.zeros_like(acc_s)

    t = _gelu_exact(
        jnp.dot(h_s[:], wf_ref[:], preferred_element_type=jnp.float32)
        .astype(x.dtype) + bf_ref[:]
    )
    acc_s[:] += jnp.dot(t, wp_ref[:], preferred_element_type=jnp.float32)

    @pl.when(f == nf - 1)
    def _():
        o_ref[0] = r_s[:] + (acc_s[:].astype(x.dtype) + bp_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "t_real", "interpret", "bq", "unroll"),
)
def _attn_call(
    x, lng, lnb, wq, bqb, wk, wv, bv, *, n_head: int, t_real: int,
    bq: int, unroll: int, interpret: bool,
):
    """The attention pallas_call over ``n_head`` heads.

    The projection weights are (D, n_head*dh) column slices — the full
    model's for the fused block, a head shard's under tensor parallelism
    (parallel/sharded.py) — so the output is (B, Tp, n_head*dh) in the same
    head order as the weight columns.
    """
    B, Tp, D = x.shape
    dt = x.dtype
    Dl = wq.shape[1]
    dh = Dl // n_head
    W = 128                     # lanes per head group
    HB = W // dh                # heads per group
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, h: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    # per-group (D, 128) weight column block / (1, 128) bias block
    headw = lambda: pl.BlockSpec((D, W), lambda b, h: (0, h),
                                 memory_space=pltpu.VMEM)
    headb = lambda: pl.BlockSpec((1, W), lambda b, h: (0, h),
                                 memory_space=pltpu.VMEM)

    mask = jnp.where(jnp.arange(Tp) < t_real, 0.0, -jnp.inf).astype(
        jnp.float32
    ).reshape(1, Tp)
    return pl.pallas_call(
        functools.partial(_attn_kernel, t_real=t_real, dh=dh, bq=bq,
                          unroll=unroll),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Dl), dt),
        grid=(B, n_head // HB),
        in_specs=[
            pl.BlockSpec((1, Tp, D), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, Tp)),                    # additive key mask (f32)
            const((1, D)), const((1, D)),      # ln g, b (f32)
            headw(), headb(),                  # wq cols, bq
            headw(),                           # wk cols
            headw(), headb(),                  # wv cols, bv
        ],
        out_specs=pl.BlockSpec((1, Tp, W), lambda b, h: (b, 0, h),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Tp, W), dt),      # q
                        pltpu.VMEM((Tp, 2 * W), dt),  # [v | ones] per head
                        pltpu.VMEM((Tp, W), dt)],     # k
        interpret=interpret,
    )(x, mask, lng, lnb, wq, bqb, wk, wv, bv)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "t_real", "interpret", "bq", "unroll"),
)
def _fused_block_impl(
    x, bp, n_head: int, t_real: int, interpret: bool,
    bq: int = BQ, unroll: int = 1,
):
    B, Tp, D = x.shape
    dt = x.dtype
    a = bp["attn"]
    w = lambda p: p.astype(dt)

    attn = _attn_call(
        x,
        bp["attn_ln"]["g"].reshape(1, D).astype(jnp.float32),
        bp["attn_ln"]["b"].reshape(1, D).astype(jnp.float32),
        w(a["query"]["w"]), w(a["query"]["b"].reshape(1, D)),
        w(a["key"]["w"]),
        w(a["value"]["w"]), w(a["value"]["b"].reshape(1, D)),
        n_head=n_head, t_real=t_real, bq=bq, unroll=unroll,
        interpret=interpret,
    )

    m = bp["mlp"]
    F = m["fc"]["w"].shape[1]
    finish_args = (
        x, attn,
        w(a["out"]["w"]), w(a["out"]["b"].reshape(1, D)),
        bp["mlp_ln"]["g"].reshape(1, D).astype(jnp.float32),
        bp["mlp_ln"]["b"].reshape(1, D).astype(jnp.float32),
        w(m["fc"]["w"]), w(m["fc"]["b"].reshape(1, F)),
        w(m["proj"]["w"]), w(m["proj"]["b"].reshape(1, D)),
    )

    if D <= 512:
        # whole (D, 4D) MLP weights resident per cell
        tconst = lambda shape: pl.BlockSpec(
            shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM
        )
        row = lambda: pl.BlockSpec((1, MT, D), lambda b, t: (b, t, 0),
                                   memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _finish_kernel,
            out_shape=jax.ShapeDtypeStruct((B, Tp, D), dt),
            grid=(B, Tp // MT),
            in_specs=[
                row(), row(),                       # x, attn
                tconst((D, D)), tconst((1, D)),     # wo, bo
                tconst((1, D)), tconst((1, D)),     # mlp ln g, b
                tconst((D, F)), tconst((1, F)),     # fc
                tconst((F, D)), tconst((1, D)),     # proj
            ],
            out_specs=row(),
            interpret=interpret,
        )(*finish_args)

    # D > 512: stream the MLP weights in (D, FT)/(FT, D) blocks along an
    # innermost f grid dim; smaller row tiles keep the block set in VMEM.
    MT2, FT = _finish_tiles(D)
    assert F % FT == 0 and Tp % MT2 == 0
    fconst = lambda shape: pl.BlockSpec(
        shape, lambda b, t, f: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    frow = lambda: pl.BlockSpec((1, MT2, D), lambda b, t, f: (b, t, 0),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _finish_kernel_ftiled,
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), dt),
        grid=(B, Tp // MT2, F // FT),
        in_specs=[
            frow(), frow(),                         # x, attn
            fconst((D, D)), fconst((1, D)),         # wo, bo
            fconst((1, D)), fconst((1, D)),         # mlp ln g, b
            pl.BlockSpec((D, FT), lambda b, t, f: (0, f),
                         memory_space=pltpu.VMEM),  # fc cols
            pl.BlockSpec((1, FT), lambda b, t, f: (0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FT, D), lambda b, t, f: (f, 0),
                         memory_space=pltpu.VMEM),  # proj rows
            fconst((1, D)),
        ],
        out_specs=frow(),
        scratch_shapes=[
            pltpu.VMEM((MT2, D), dt),               # r
            pltpu.VMEM((MT2, D), dt),               # LN(r)
            pltpu.VMEM((MT2, D), jnp.float32),      # proj accumulator
        ],
        interpret=interpret,
    )(*finish_args)


def _xla_block(x, bp, n_head: int, t_real: int):
    """Reference XLA formulation of the same block (used for the backward
    pass and as the numerics oracle in tests).

    Deliberately NOT models/whisper.py's production helpers: the VJP must
    stay a pure-XLA program regardless of the kernel enable flags (the
    production attention() could recursively select a non-differentiable
    Pallas kernel at these shapes).  Equivalence with the production block
    is pinned by tests/test_encoder_block.py::
    test_encoder_apply_fused_matches_unfused."""
    B, Tp, D = x.shape
    dh = D // n_head
    scale = dh ** -0.25
    dt = x.dtype

    def lin(h, p):
        y = h @ p["w"].astype(dt)
        if "b" in p:
            y = y + p["b"].astype(dt)
        return y

    def ln(h, p):
        return _ln_f32(h, p["g"].astype(jnp.float32),
                       p["b"].astype(jnp.float32))

    h = ln(x, bp["attn_ln"])
    q = lin(h, bp["attn"]["query"]) * dt.type(scale)
    k = lin(h, bp["attn"]["key"]) * dt.type(scale)
    v = lin(h, bp["attn"]["value"])

    def split(z):
        return z.reshape(B, Tp, n_head, dh).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)).astype(
        jnp.float32
    )
    if t_real != Tp:
        logits = jnp.where(jnp.arange(Tp) < t_real, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(dt)
    attn = jnp.einsum("bhqk,bhkd->bhqd", w, split(v))
    attn = attn.transpose(0, 2, 1, 3).reshape(B, Tp, D)
    x = x + lin(attn, bp["attn"]["out"])
    h = ln(x, bp["mlp_ln"])
    t = jax.nn.gelu(lin(h, bp["mlp"]["fc"]), approximate=False)
    return x + lin(t, bp["mlp"]["proj"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_encoder_block(x, bp, n_head: int, t_real: int):
    """One whole encoder transformer block, fused: (B, Tp, D) -> (B, Tp, D).

    ``bp`` is the per-layer parameter pytree (models/whisper.py _init_block
    layout).  Keys at positions >= ``t_real`` are masked; query rows past it
    compute garbage the caller slices away.
    """
    D, Tp = x.shape[-1], x.shape[1]
    return _partitioned_block(
        x, bp, n_head, t_real, jax.default_backend() != "tpu", _pick_bq(D, Tp)
    )


@functools.lru_cache(maxsize=None)
def _sharded_block_op(n_head, t_real, interpret, bq, treedef, leaf_ndims):
    """custom_partitioning wrapper per static block signature: under GSPMD
    the fused block partitions along the batch dim (weights replicated)
    instead of being an unpartitionable opaque call — see ops/partition.py."""
    from .partition import batch_partitioned

    def impl(x, *leaves):
        bp = jax.tree.unflatten(treedef, leaves)
        return _fused_block_impl(x, bp, n_head, t_real, interpret, bq=bq)

    return batch_partitioned(impl, (3,) + tuple(leaf_ndims), 3)


def _partitioned_block(x, bp, n_head, t_real, interpret, bq):
    leaves, treedef = jax.tree.flatten(bp)
    op = _sharded_block_op(
        n_head, t_real, interpret, bq, treedef,
        tuple(l.ndim for l in leaves),
    )
    return op(x, *leaves)


def _fused_fwd(x, bp, n_head, t_real):
    return fused_encoder_block(x, bp, n_head, t_real), (x, bp)


def _fused_bwd(n_head, t_real, res, g):
    x, bp = res
    _, vjp = jax.vjp(lambda a, b: _xla_block(a, b, n_head, t_real), x, bp)
    return vjp(g)


fused_encoder_block.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Head-sharded attention (the tensor-parallel building block)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("n_head", "t_real", "interpret", "bq")
)
def _attn_ln_impl(x, lnp, ap, n_head, t_real, interpret, bq):
    D = x.shape[-1]
    dt = x.dtype
    w = lambda p: p.astype(dt)
    Dl = ap["query"]["w"].shape[1]
    return _attn_call(
        x,
        lnp["g"].reshape(1, D).astype(jnp.float32),
        lnp["b"].reshape(1, D).astype(jnp.float32),
        w(ap["query"]["w"]), w(ap["query"]["b"].reshape(1, Dl)),
        w(ap["key"]["w"]),
        w(ap["value"]["w"]), w(ap["value"]["b"].reshape(1, Dl)),
        n_head=n_head, t_real=t_real, bq=bq, unroll=1, interpret=interpret,
    )


def _xla_attn_ln(x, lnp, ap, n_head: int, t_real: int):
    """XLA formulation of LN + QKV + masked softmax attention over the heads
    whose weight columns are in ``ap`` (backward pass and numerics oracle
    for :func:`fused_attention_ln`; also the tensor-parallel trunk's
    fallback when the kernel gate fails)."""
    B, Tp, D = x.shape
    dt = x.dtype
    Dl = ap["query"]["w"].shape[1]
    dh = Dl // n_head
    scale = dt.type(dh ** -0.25)
    h = _ln_f32(x, lnp["g"].astype(jnp.float32), lnp["b"].astype(jnp.float32))
    q = (h @ ap["query"]["w"].astype(dt)
         + ap["query"]["b"].astype(dt)) * scale
    k = (h @ ap["key"]["w"].astype(dt)) * scale
    v = h @ ap["value"]["w"].astype(dt) + ap["value"]["b"].astype(dt)
    split = lambda z: z.reshape(B, Tp, n_head, dh).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", split(q), split(k)
    ).astype(jnp.float32)
    if t_real != Tp:
        logits = jnp.where(jnp.arange(Tp) < t_real, logits, -jnp.inf)
    wgt = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bhkd->bhqd", wgt, split(v))
    return out.transpose(0, 2, 1, 3).reshape(B, Tp, Dl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_ln(x, lnp, ap, n_head: int, t_real: int):
    """LN + QKV projection + softmax(QK^T)V over ``n_head`` heads (stopping
    before the output projection), as one Pallas kernel.

    This is the tensor-parallel building block (parallel/sharded.py): under
    a (data, model) mesh each model shard calls it with its own head shard's
    (D, D/tp) weight columns — the kernel's (batch, head-group) grid simply
    runs with fewer head groups, so TP costs zero extra kernel work.  Gate
    with :func:`attn_applicable`.  Backward runs through the XLA
    formulation (custom VJP), so the TP trunk trains with the kernel on the
    forward path.
    """
    Tp, D = x.shape[1], x.shape[-1]
    return _attn_ln_impl(
        x, lnp, ap, n_head, t_real, jax.default_backend() != "tpu",
        _pick_bq(D, Tp),
    )


def _attn_ln_fwd(x, lnp, ap, n_head, t_real):
    return fused_attention_ln(x, lnp, ap, n_head, t_real), (x, lnp, ap)


def _attn_ln_bwd(n_head, t_real, res, g):
    x, lnp, ap = res
    _, vjp = jax.vjp(
        lambda a, b, c: _xla_attn_ln(a, b, c, n_head, t_real), x, lnp, ap
    )
    return vjp(g)


fused_attention_ln.defvjp(_attn_ln_fwd, _attn_ln_bwd)

"""Microbenchmark: decode-attention formulations inside a Pallas kernel.

The fused decoder-step kernel must stream the cross K/V cache at HBM rate
while computing batched-GEMV attention (each batch row has its OWN K/V, so
the MXU's shared-contraction economics don't apply).  This script measures,
on the real chip, the per-chunk cost of the candidate formulations against
the pure-DMA floor, to pick the kernel's compute layout:

  dma   -- blocks streamed and merely accumulated (the bandwidth floor)
  vpu   -- T-on-lanes layout (B, D, T): logits/PV as VPU multiply +
           sublane-group reduce (no MXU padding waste)
  mxu_t -- T-on-lanes layout, per-row MXU matmuls (H,D)@(D,CHUNK)
  mxu_r -- row-major layout (B, T, D), block-diagonal Qexp batched matmul

Run: python scripts/bench_step_formulations.py [B] [CHUNK]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D, H, DH = 384, 6, 64
BT = int(__import__('os').environ.get('BT', 8))

# v5e HBM bandwidth ceiling: any "effective GB/s" above this is a
# measurement artifact, not a kernel result.
HBM_GBPS = 819.0


def _dma_kernel(q_ref, k_ref, v_ref, o_ref):
    # q is a loop-carried operand solely so the timing loop cannot hoist
    # the call (see `many` below); it costs one (BT, D) VMEM read.
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        o_ref[...] = q_ref[...][:, None, :].astype(jnp.float32) * 1e-30

    o_ref[...] += (k_ref[...].astype(jnp.float32).sum(axis=1, keepdims=True)
                   + v_ref[...].astype(jnp.float32).sum(axis=1, keepdims=True))




def _head_bcast(vals, D=D):
    """(H,) per-head scalars -> (D,) lane vector, no gather (static unroll)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (D,), 0) // DH
    out = jnp.zeros((D,), vals.dtype)
    for h in range(H):
        out = jnp.where(lane == h, vals[h], out)
    return out

def _vpu_kernel(q_ref, k_ref, v_ref, o_ref, acc, m_s, s_s):
    # q: (BT, D); k/v: (BT, D, CHUNK) T-on-lanes.
    c = pl.program_id(1)
    CH = k_ref.shape[-1]

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, -1e30)
        s_s[...] = jnp.zeros_like(s_s)

    for i in range(BT):
        ki = k_ref[i].astype(jnp.float32)          # (D, CH)
        qi = q_ref[i, :].astype(jnp.float32)        # (D,)
        e = ki * qi[:, None]                        # (D, CH)
        lg = e.reshape(H, DH, CH).sum(axis=1)       # (H, CH) sublane-group sum
        m_new = jnp.maximum(m_s[i], jnp.max(lg, axis=-1))   # (H,)
        corr = jnp.exp(m_s[i] - m_new)
        p = jnp.exp(lg - m_new[:, None])            # (H, CH)
        s_s[i] = s_s[i] * corr + jnp.sum(p, axis=-1)
        m_s[i] = m_new
        CHW = p.shape[-1]
        pe = jnp.broadcast_to(
            p[:, None, :], (H, DH, CHW)
        ).reshape(D, CHW)                           # (D, CH) head-major
        vi = v_ref[i].astype(jnp.float32)
        acc[i] = acc[i] * _head_bcast(corr) + jnp.sum(vi * pe, axis=-1)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        den = jnp.stack([_head_bcast(s_s[i]) for i in range(BT)])
        o_ref[...] = (acc[...] / den).astype(o_ref.dtype)


def _mxu_t_kernel(q_ref, k_ref, v_ref, o_ref, acc, m_s, s_s):
    # q: (BT, D) expanded per-row to block-diag (H, D); k/v: (BT, D, CHUNK).
    c = pl.program_id(1)
    CH = k_ref.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (H, D), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    sel = (lane // DH) == row

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, -1e30)
        s_s[...] = jnp.zeros_like(s_s)

    for i in range(BT):
        qi = q_ref[i, :].astype(jnp.float32)
        qexp = jnp.where(sel, qi[None, :], 0.0).astype(jnp.bfloat16)
        lg = jax.lax.dot_general(
            qexp, k_ref[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, CH)
        m_new = jnp.maximum(m_s[i], jnp.max(lg, axis=-1))
        corr = jnp.exp(m_s[i] - m_new)
        p = jnp.exp(lg - m_new[:, None]).astype(jnp.bfloat16)  # (H, CH)
        s_s[i] = s_s[i] * corr + jnp.sum(p.astype(jnp.float32), axis=-1)
        m_s[i] = m_new
        pv = jax.lax.dot_general(
            v_ref[i], p,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, H)
        hsel = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // DH
                == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1))
        acc[i] = acc[i] * _head_bcast(corr) + jnp.sum(
            jnp.where(hsel, pv, 0.0), axis=-1)

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        den = jnp.stack([_head_bcast(s_s[i]) for i in range(BT)])
        o_ref[...] = (acc[...] / den).astype(o_ref.dtype)


def _mxu_r_kernel(q_ref, k_ref, v_ref, o_ref, acc, m_s, s_s):
    # Row-major blocks k/v: (BT, CHUNK, D); batched block-diag Qexp (D, 128).
    c = pl.program_id(1)
    CH = k_ref.shape[1]
    NL = 128
    dlane = jax.lax.broadcasted_iota(jnp.int32, (D, NL), 0)
    cl = jax.lax.broadcasted_iota(jnp.int32, (D, NL), 1)
    # column (i*H + h) holds row i's head-h q slice
    sel = ((cl % H) == (dlane // DH)) & ((cl // H) < BT)

    @pl.when(c == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, -1e30)
        s_s[...] = jnp.zeros_like(s_s)

    qcols = jnp.zeros((D, NL), jnp.float32)
    for i in range(BT):
        qcols = jnp.where(sel & ((cl // H) == i),
                          q_ref[i, :].astype(jnp.float32)[:, None], qcols)
    qcols = qcols.astype(jnp.bfloat16)
    kf = k_ref[...].reshape(BT * CH, D)
    lg = jax.lax.dot_general(
        kf, qcols,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BT*CH, 128)
    rr = jax.lax.broadcasted_iota(jnp.int32, (BT * CH, NL), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (BT * CH, NL), 1)
    valid = (rr // CH) == (cc // H)
    lg = jnp.where(valid & (cc < BT * H), lg, -jnp.inf)
    cmax = jnp.max(lg, axis=0)  # (128,) per (i,h) chunk max
    m_new = jnp.maximum(m_s[0, :], cmax)
    corr = jnp.exp(m_s[0, :] - m_new)
    p = jnp.where(valid & (cc < BT * H), jnp.exp(lg - m_new[None, :]), 0.0)
    s_s[0, :] = s_s[0, :] * corr + jnp.sum(p, axis=0)
    m_s[0, :] = m_new
    vf = v_ref[...].reshape(BT * CH, D)
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16), vf,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (128, D)
    acc[...] = acc[...] * corr[:, None] + pv

    @pl.when(c == pl.num_programs(1) - 1)
    def _():
        # extract head-diagonal per row into (BT, D); here just dump raw acc
        o_ref[...] = acc[:BT, :].astype(o_ref.dtype)


def run(name, B, CHUNK, Ta=1536, reps=100):
    C = Ta // CHUNK
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, D)) * 0.1, jnp.bfloat16)
    if name in ("vpu", "mxu_t"):
        k = jnp.asarray(rng.standard_normal((B, D, Ta)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, D, Ta)) * 0.1, jnp.bfloat16)
        kern = _vpu_kernel if name == "vpu" else _mxu_t_kernel
        kv_spec = pl.BlockSpec((BT, D, CHUNK), lambda b, c: (b, 0, c),
                               memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((BT, D), jnp.float32),
                   pltpu.VMEM((BT, H), jnp.float32),
                   pltpu.VMEM((BT, H), jnp.float32)]
        f = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
            grid=(B // BT, C),
            in_specs=[
                pl.BlockSpec((BT, D), lambda b, c: (b, 0),
                             memory_space=pltpu.VMEM),
                kv_spec, kv_spec,
            ],
            out_specs=pl.BlockSpec((BT, D), lambda b, c: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        args = (q, k, v)
    elif name == "mxu_r":
        k = jnp.asarray(rng.standard_normal((B, Ta, D)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Ta, D)) * 0.1, jnp.bfloat16)
        kv_spec = pl.BlockSpec((BT, CHUNK, D), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            _mxu_r_kernel,
            out_shape=jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
            grid=(B // BT, C),
            in_specs=[
                pl.BlockSpec((BT, D), lambda b, c: (b, 0),
                             memory_space=pltpu.VMEM),
                kv_spec, kv_spec,
            ],
            out_specs=pl.BlockSpec((BT, D), lambda b, c: (b, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((128, D), jnp.float32),
                            pltpu.VMEM((1, 128), jnp.float32),
                            pltpu.VMEM((1, 128), jnp.float32)],
        )
        args = (q, k, v)
    else:  # dma
        k = jnp.asarray(rng.standard_normal((B, Ta, D)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, Ta, D)) * 0.1, jnp.bfloat16)
        kv_spec = pl.BlockSpec((BT, CHUNK, D), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            _dma_kernel,
            out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
            grid=(B // BT, Ta // CHUNK),
            in_specs=[
                pl.BlockSpec((BT, D), lambda b, c: (b, 0),
                             memory_space=pltpu.VMEM),
                kv_spec, kv_spec,
            ],
            out_specs=pl.BlockSpec((BT, 1, D), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        args = (q, k, v)

    # The loop body feeds each call's OUTPUT back into the next call's q at
    # 1e-30 scale: a real data dependence, so XLA can neither hoist the
    # (loop-invariant-looking) kernel call out of the fori_loop nor overlap
    # iterations.  The r4 version multiplied the feedback by 0, which
    # constant-folded away — the kernel ran ONCE regardless of trip count
    # and the "per-iteration" times were pure noise.
    if name == "dma":
        def many(q, k, v, r):
            def body(i, acc):
                out = f(q + acc[:, 0, :].astype(q.dtype) * 1e-30, k, v)
                return out
            return jax.lax.fori_loop(
                0, r, body, jnp.zeros((B, 1, D), jnp.float32)
            )
        jf = jax.jit(many)
        args2 = args
    else:
        def many(q, k, v, r):
            def body(i, acc):
                out = f(q + acc.astype(q.dtype) * 1e-30, k, v)
                return out.astype(jnp.float32)
            return jax.lax.fori_loop(0, r, body,
                                     jnp.zeros((B, D), jnp.float32))
        jf = jax.jit(many)
        args2 = args
    # r is TRACED (<- one compile, real loop): a static trip count would be
    # unrolled into separate custom calls and measure dispatch, not the
    # kernel (see NOTES_ROUND4).  Timing discipline (round-5 fix — the r4
    # single-shot subtraction printed negative times and >HBM "effective"
    # bandwidths): per trip count, warm up then take the MIN of n timed
    # block_until_ready runs; the per-iteration cost is the two-point slope,
    # guarded against noise inversion.
    r_lo, r_hi = 2, 2 + reps

    def _min_time(r, n=5):
        # host-materialize to sync: through the tunneled device link,
        # block_until_ready returns before execution finishes (measured:
        # flat ~30-70 us walls for multi-ms programs), the same trap the
        # rest of the repo's benches avoid by fetching results
        np.asarray(jf(*args2, r))  # warmup this trip count
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(jf(*args2, r))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo = _min_time(r_lo)
    t_hi = _min_time(r_hi)
    el = (t_hi - t_lo) / (r_hi - r_lo)
    gb = 2 * B * Ta * D * 2 / 1e9
    if el <= 0:
        print(f"{name:6s} B={B} CHUNK={CHUNK}: UNRELIABLE "
              f"(t_hi {t_hi * 1e6:.0f} us <= t_lo {t_lo * 1e6:.0f} us; "
              f"dispatch noise exceeded kernel time — raise reps)")
        return None
    eff = gb / el
    flag = "  [> HBM ceiling: measurement invalid]" if eff > HBM_GBPS else ""
    print(f"{name:6s} B={B} CHUNK={CHUNK}: {el * 1e6:9.1f} us  "
          f"({eff:6.1f} GB/s effective){flag}")
    return el


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    CHUNK = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    for name in ("dma", "vpu", "mxu_t", "mxu_r"):
        try:
            els = [run(name, B, CHUNK) for _ in range(3)]
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:200]}")
            continue
        els = [e for e in els if e is not None]
        if len(els) == 3:
            spread = (max(els) - min(els)) / min(els)
            ok = "ok" if spread <= 0.10 else "NOISY (>10%)"
            print(f"{name:6s} 3-run spread: {spread * 100:5.1f}%  [{ok}]")


if __name__ == "__main__":
    main()

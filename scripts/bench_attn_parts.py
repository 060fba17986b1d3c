"""Decompose the fused attention kernel's cost: dots-only vs softmax-only
vs full, at B=512 tiny geometry.  One-off diagnostic."""

import sys
import time
import functools

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qasr_ijcnlp_tpu.cli import enable_compilation_cache

B, Tp, D, H, dh, BQ = 512, 1536, 384, 6, 64, 512
W = 128


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def timed(fn, reps=3, inner=3):
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = [fn() for _ in range(inner)]
        sync(out[-1])
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def kernel(q_ref, k_ref, v_ref, o_ref, *, mode):
    def tile(qt, _):
        for hi in range(2):
            qh = q_ref[0, pl.ds(qt * BQ, BQ), hi * dh:(hi + 1) * dh]
            kh = k_ref[0, :, hi * dh:(hi + 1) * dh]
            vh = v_ref[0, :, hi * dh:(hi + 1) * dh]
            if mode in ("dots", "full"):
                logits = jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                logits = (qh[:, :1] * kh[:, :1].reshape(1, Tp)).astype(
                    jnp.float32)
            if mode in ("softmax", "full"):
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                s = jnp.sum(p, axis=-1, keepdims=True)
                p = (p / s).astype(jnp.bfloat16)
            else:
                p = logits.astype(jnp.bfloat16)
            if mode in ("dots", "full"):
                out = jax.lax.dot_general(
                    p, vh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                out = p[:, :dh].astype(jnp.float32)
            o_ref[0, pl.ds(qt * BQ, BQ), hi * dh:(hi + 1) * dh] = out.astype(
                jnp.bfloat16)
        return 0

    jax.lax.fori_loop(0, Tp // BQ, tile, 0)


@functools.partial(jax.jit, static_argnames=("mode",))
def run(q, k, v, mode):
    return pl.pallas_call(
        functools.partial(kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((B, Tp, W), jnp.bfloat16),
        grid=(B, H // 2),
        in_specs=[
            pl.BlockSpec((1, Tp, W), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, W), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, W), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tp, W), lambda b, h: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )(q, k, v)


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend())
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Tp, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, Tp, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, Tp, D), jnp.bfloat16)
    for mode in ("dots", "softmax", "full"):
        t = timed(lambda: run(q, k, v, mode))
        print(f"{mode}: {t * 1e3:.1f} ms")


if __name__ == "__main__":
    main()

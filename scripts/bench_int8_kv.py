"""Experiment: int8 cross-attention K/V vs bf16 - does halving HBM bytes
halve the bandwidth-bound decode step?

Standalone measurement (not production code): one decoder-like step's
cross-attention over (L=4, B=64, T=1500, D=384), comparing
  a) bf16 K/V einsum (current production path)
  b) int8 K/V with per-row scales, int8 x int8 MXU matmul for qk and
     int8 V with f32 probs requantized to int8.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=30):
    np.asarray(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.default_backend())

    L, B, H, T, Dh = 4, 64, 6, 1500, 64
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((L, B, H, T, Dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, B, H, T, Dh)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((L, B, H, 1, Dh)), jnp.bfloat16)

    @jax.jit
    def attn_bf16(q, k, v):
        logits = jnp.einsum("lbhqd,lbhtd->lbhqt", q, k).astype(jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("lbhqt,lbhtd->lbhqd", w, v)

    dt_bf16 = timeit(lambda: attn_bf16(q, k, v))
    print(f"bf16 K/V cross-attn step: {dt_bf16 * 1e3:7.2f} ms")

    # int8 with per-(l,b,h,t) row scales
    def quant_rows(x):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        xi = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return xi, s.astype(jnp.float32)

    ki, ks = jax.jit(quant_rows)(k)
    vi, vs = jax.jit(quant_rows)(v)

    @jax.jit
    def attn_int8(q, ki, ks, vi, vs):
        qs = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        qi = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127).astype(jnp.int8)
        raw = jax.lax.dot_general(
            qi, ki,
            dimension_numbers=(((4,), (4,)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=jnp.int32,
        )  # (L,B,H,1,T)
        logits = raw.astype(jnp.float32) * qs * jnp.swapaxes(ks, -1, -2)
        w = jax.nn.softmax(logits, axis=-1)
        # requantize probs to int8 (scale 1/127) for the PV int8 matmul
        wi = jnp.clip(jnp.round(w * 127.0), 0, 127).astype(jnp.int8)
        pv = jax.lax.dot_general(
            wi, vi * jnp.ones((), jnp.int8),
            dimension_numbers=(((4,), (3,)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=jnp.int32,
        )  # (L,B,H,1,D)
        # undo scales: each t contributed w_t*127 * v_td/vs_t... row scales of
        # V differ per t, so exact dequant needs the per-t product - fold vs
        # into wi instead for correctness in production; here we only measure
        # bandwidth, using a mean scale.
        return pv.astype(jnp.float32) * (jnp.mean(vs) / 127.0)

    dt_int8 = timeit(lambda: attn_int8(q, ki, ks, vi, vs))
    print(f"int8 K/V cross-attn step: {dt_int8 * 1e3:7.2f} ms "
          f"({dt_bf16 / dt_int8:.2f}x)")

    # variant: int8 K only (exact V path) - K read is half the bytes
    @jax.jit
    def attn_int8k(q, ki, ks, v):
        qs = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
        qi = jnp.clip(jnp.round(q.astype(jnp.float32) / qs), -127, 127).astype(jnp.int8)
        raw = jax.lax.dot_general(
            qi, ki,
            dimension_numbers=(((4,), (4,)), ((0, 1, 2), (0, 1, 2))),
            preferred_element_type=jnp.int32,
        )
        logits = raw.astype(jnp.float32) * qs * jnp.swapaxes(ks, -1, -2)
        w = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("lbhqt,lbhtd->lbhqd", w, v)

    dt_k8 = timeit(lambda: attn_int8k(q, ki, ks, v))
    print(f"int8 K, bf16 V:           {dt_k8 * 1e3:7.2f} ms "
          f"({dt_bf16 / dt_k8:.2f}x)")


if __name__ == "__main__":
    main()

"""Microbench: Pallas flash attention vs XLA attention at encoder shapes.

Usage: python scripts/bench_flash_micro.py [B] [H] [T] [Dh]
Times just the attention op (bf16 inputs), median of reps, on the default
backend.  No persistent compilation cache: what runs is what's in the tree.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from qasr_ijcnlp_tpu.ops.flash import _flash_attention

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
H = int(sys.argv[2]) if len(sys.argv) > 2 else 6
T = int(sys.argv[3]) if len(sys.argv) > 3 else 1500
Dh = int(sys.argv[4]) if len(sys.argv) > 4 else 64

rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16) * 0.35
k = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16) * 0.35
v = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)


@jax.jit
def xla_attn(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def timeit(name, fn, reps=5, inner=4):
    # block_until_ready does not actually block through the axon tunnel; a
    # host fetch of one element is the only reliable sync.  `inner` chained
    # calls amortize the ~25 ms tunnel dispatch+fetch latency per timing.
    def run_chain():
        o = fn()
        for _ in range(inner - 1):
            o = fn()
        return np.asarray(o[0, 0, 0, :1])

    run_chain()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_chain()
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[len(ts) // 2] * 1e3 / inner
    flops = 2 * 2 * B * H * T * T * Dh
    print(f"{name:10s} {ms:8.2f} ms   {flops / ms / 1e9:7.1f} TFLOP/s-ish")
    return fn()


from qasr_ijcnlp_tpu.ops.flash import _flash_packed

qp = q.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
kp = k.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
vp = v.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


def timeit_packed(name, fn, reps=5, inner=4):
    def run_chain():
        o = fn()
        for _ in range(inner - 1):
            o = fn()
        return np.asarray(o[0, 0, :1])

    run_chain()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_chain()
        ts.append(time.perf_counter() - t0)
    ms = sorted(ts)[len(ts) // 2] * 1e3 / inner
    flops = 2 * 2 * B * H * T * T * Dh
    print(f"{name:10s} {ms:8.2f} ms   {flops / ms / 1e9:7.1f} TFLOP/s-ish")
    return fn()


print("backend:", jax.default_backend(), f"B={B} H={H} T={T} Dh={Dh}")
o1 = timeit("pallas", lambda: _flash_attention(q, k, v, False))
o3 = timeit_packed("packed", lambda: _flash_packed(qp, kp, vp, H, T, False))
o2 = timeit("xla", lambda: xla_attn(q, k, v))
o3s = o3.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
print("max |packed - xla| =",
      float(jnp.max(jnp.abs(o3s.astype(jnp.float32) - o2.astype(jnp.float32)))))
d = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
print("max |pallas - xla| =", float(d))

if "--profile" in sys.argv:
    # Device-side truth: per-op event durations from an xplane trace.
    import os

    sys.path.insert(0, "scripts")
    from profile_decode import collect_events

    logdir = "/tmp/qasr_flash_micro"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            np.asarray(_flash_attention(q, k, v, False)[0, 0, 0, :1])
        for _ in range(3):
            np.asarray(xla_attn(q, k, v)[0, 0, 0, :1])
    for name, dur, cnt in collect_events(logdir)[:12]:
        print(f"{dur * 1e3:9.3f} ms  x{cnt:<4} {name[:110]}")

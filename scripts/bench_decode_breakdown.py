"""Decode latency breakdown on the real chip: dispatch RTT vs loop compute.

Separates (a) trivial-program round-trip, (b) encoder, (c) the jitted greedy
loop alone, (d) full decode() with host orchestration - to locate where the
decode milliseconds actually go.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def t(fn, reps=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    from qasr_ijcnlp_tpu.decode import DecodingOptions, DecodingTask
    from qasr_ijcnlp_tpu.decode import loop as dloop
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    print("backend:", jax.default_backend())
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="bench")
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    B = 8
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)

    # (a) trivial round trip
    triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 8))
    dt = t(lambda: jax.block_until_ready(triv(x)))
    print(f"trivial jit call RTT:      {dt * 1e3:8.2f} ms")

    # (b) encoder
    enc = jax.jit(lambda p, mm: model.encoder_apply(p["encoder"], mm, dims))
    dt = t(lambda: jax.block_until_ready(enc(params, mel)))
    print(f"encoder (B={B}):            {dt * 1e3:8.2f} ms")
    xa = enc(params, mel)

    # (c) the greedy loop alone (64 steps), pre-built config
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=64,
        suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
    )
    task = DecodingTask(m, opts)
    init = jnp.asarray(
        np.tile(np.asarray(task.initial_tokens, np.int32), (B, 1))
    )
    key = jax.random.PRNGKey(0)

    def run_loop():
        out = dloop.greedy_decode(params, task.loop_cfg, xa, init, key, 0.0)
        jax.block_until_ready(out[0])

    dt = t(run_loop)
    print(f"greedy loop 64 steps:      {dt * 1e3:8.2f} ms "
          f"({dt / 64 * 1e3:6.2f} ms/token)")

    # (c2) 8-step loop: separates fixed program overhead from per-token cost
    opts8 = DecodingOptions(
        language="en", without_timestamps=True, sample_len=8,
        suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
    )
    task8 = DecodingTask(m, opts8)

    def run_loop8():
        out = dloop.greedy_decode(params, task8.loop_cfg, xa, init, key, 0.0)
        jax.block_until_ready(out[0])

    dt8 = t(run_loop8)
    print(f"greedy loop 8 steps:       {dt8 * 1e3:8.2f} ms "
          f"(per-token from diff: {(dt - dt8) / 56 * 1e3:6.2f} ms)")

    # (d) full decode()
    def full():
        r = m.decode(mel, opts)
        jax.block_until_ready(jnp.zeros(()))

    dt = t(full, reps=3)
    print(f"full decode():             {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()

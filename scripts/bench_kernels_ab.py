"""On-chip A/B: Pallas kernels vs plain-XLA equivalents (VERDICT r1 item 3).

Benchmarks, at tiny AND base/small encoder dims:
  1. encoder self-attention: ops/flash.py vs XLA einsum-softmax
  2. full encoder forward with flash on/off
  3. mel frontend: ops/melfront.py fused kernel vs the matmul-DFT path

Each measurement: 2 warmup + median of 5 timed reps with block_until_ready.
Prints a markdown table for docs/BENCHMARKS.md.
"""

import statistics
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return statistics.median(times) * 1e3  # ms


def main():
    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import dims_for
    from qasr_ijcnlp_tpu.ops.flash import flash_attention
    from qasr_ijcnlp_tpu.ops.melfront import fused_log_mel_spectrogram

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    rows = []

    # --- attention + encoder at three family sizes ---
    for name in ("tiny", "base", "small"):
        dims = dims_for(name)
        B = 16
        H, Dh = dims.n_audio_head, dims.n_audio_state // dims.n_audio_head
        T = dims.n_audio_ctx
        q = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.bfloat16)

        def xla_attn(q=q, k=k, v=v):
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
            w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", w, v)

        t_xla = timeit(jax.jit(xla_attn))
        t_flash = timeit(jax.jit(lambda: flash_attention(q, k, v)))
        rows.append((f"attn {name} (B{B} H{H} T{T} Dh{Dh})", t_xla, t_flash))

        params = model.init_params(jax.random.PRNGKey(0), dims)
        mel = jnp.asarray(
            rng.standard_normal((B, dims.n_mels, 2 * T)), jnp.float32
        )

        def enc(flash: bool):
            model.set_flash_attention(flash)
            f = jax.jit(
                lambda p, x: model.encoder_apply(p, x, dims, jnp.bfloat16)
            )
            t = timeit(lambda: f(params["encoder"], mel))
            model.set_flash_attention(False)
            return t

        rows.append((f"encoder {name} (B{B})", enc(False), enc(True)))

    # --- mel frontend ---
    for B in (8, 64):
        audio = jnp.asarray(rng.standard_normal((B, 480000)), jnp.float32)
        jmel_xla = jax.jit(jax.vmap(log_mel_spectrogram))
        jmel_fused = jax.jit(jax.vmap(lambda a: fused_log_mel_spectrogram(a, 80)))
        t_xla = timeit(lambda: jmel_xla(audio))
        t_fused = timeit(lambda: jmel_fused(audio))
        rows.append((f"mel frontend (B{B}, 30s)", t_xla, t_fused))

    print(f"\n| op | XLA ms | Pallas ms | speedup |")
    print("|---|---|---|---|")
    for name, a, b in rows:
        print(f"| {name} | {a:.2f} | {b:.2f} | {a / b:.2f}x |")


if __name__ == "__main__":
    main()

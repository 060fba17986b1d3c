"""On-chip A/B of the encoder at large batch: flash kernel on vs off.

Times R sequential calls with block_until_ready; the ~25 ms tunnel dispatch
latency is measured separately via an empty jitted op and subtracted.

Usage: python scripts/bench_encoder512.py [B]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from qasr_ijcnlp_tpu.cli import enable_compilation_cache


def _sync(out):
    # block_until_ready is a no-op through the axon tunnel; force a scalar
    # fetch to drain the device queue.
    x = out
    while isinstance(x, (tuple, list, dict)):
        x = next(iter(x.values())) if isinstance(x, dict) else x[0]
    np.asarray(jax.device_get(x.ravel()[0]))


def timed(fn, reps=5, warmup=2):
    for _ in range(warmup):
        _sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = [fn() for _ in range(3)]
        _sync(out[-1])
        ts.append((time.perf_counter() - t0) / 3)
    return float(np.median(ts))


def main():
    enable_compilation_cache()
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print("backend:", jax.default_backend())
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)

    # dispatch overhead estimate
    nop = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 128))
    disp = timed(lambda: nop(x0))
    print(f"dispatch overhead ~{disp * 1e3:.1f} ms")

    # flash=False at B>=256 OOMs (XLA materializes (B,H,1500,1500) logits),
    # so only A/B both paths at small-enough batch.
    variants = [True] if B >= 256 else [True, False]
    for flash in variants:
        model.set_flash_attention(flash)
        enc = jax.jit(
            lambda p, x: model.encoder_apply(p, x, dims, jnp.bfloat16)
        )
        t = timed(lambda: enc(params["encoder"], mel))
        print(f"flash={flash}: {t * 1e3:.1f} ms/call @ B={B}")
        enc.clear_cache()
    model.set_flash_attention(None)


if __name__ == "__main__":
    main()

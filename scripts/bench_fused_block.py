"""Sweep the fused encoder block's attention-kernel tiling on-chip.

Times ONE fused block (attn kernel + finish kernel) at B=512 for several
(bq, unroll) configs; the finish kernel is identical across configs, so
differences are the attention kernel's.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from qasr_ijcnlp_tpu.cli import enable_compilation_cache


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


def main():
    enable_compilation_cache()
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.ops.encoder_block import _fused_block_impl

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print("backend:", jax.default_backend())
    bp = model._init_block(jax.random.PRNGKey(0), 384, cross_attention=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 1536, 384), jnp.bfloat16)

    for bq, unroll in [(128, 1), (128, 2), (128, 4), (256, 1), (256, 2),
                       (512, 1), (512, 3)]:
        try:
            t = timed(lambda: _fused_block_impl(
                x, bp, 6, 1500, False, bq=bq, unroll=unroll))
            print(f"bq={bq} unroll={unroll}: {t * 1e3:.1f} ms/block")
        except Exception as e:
            print(f"bq={bq} unroll={unroll}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()

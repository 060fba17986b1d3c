"""On-chip training-step benchmark (the docs/BENCHMARKS.md protocol):
token-level teacher-forced train step (AdamW + grad clip, bf16 compute,
donated state), Whisper tiny, 120 real tokens per utterance.

Usage: python scripts/bench_train_step.py [B]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def main():
    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.train.step import (
        init_state, make_optimizer, make_train_step, whisper_loss_fn,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("backend:", jax.default_backend())
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    tx = make_optimizer(lambda _: 1e-4)
    state = init_state(params, tx)
    loss_fn = whisper_loss_fn(dims, "bfloat16")
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 51000, (B, 121)), jnp.int32)

    state, loss = step(state, mel, toks)
    sync(loss)
    reps, inner = 3, 3
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            state, loss = step(state, mel, toks)
        sync(loss)
        ts.append((time.perf_counter() - t0) / inner)
    t = float(np.median(ts))
    print(f"B={B}: {t * 1e3:.1f} ms/step -> {B * 30 / t:.0f} audio-sec/s, "
          f"loss={np.mean(jax.tree.leaves(jax.device_get(loss))[0]):.3f}")


if __name__ == "__main__":
    main()

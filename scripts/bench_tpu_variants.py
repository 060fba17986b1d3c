"""TPU perf matrix: encoder forward and greedy-decode RTF across variants.

Run on the real chip: measures (a) encoder forward with/without the Pallas
flash-attention kernel at fp32/bf16, (b) decode RTF at several batch sizes.
Guides the defaults baked into bench.py and the eval CLIs.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims

    print("backend:", jax.default_backend(), jax.devices())
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)

    for B in (8, 16):
        mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)
        for dtype_name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            for flash in (False, True):
                model.set_flash_attention(flash)
                fn = jax.jit(
                    lambda p, m, d=dtype: model.encoder_apply(
                        p["encoder"], m, dims, d
                    )
                )
                try:
                    dt = timeit(fn, params, mel)
                    print(f"encoder B={B} {dtype_name} flash={flash}: "
                          f"{dt * 1e3:8.2f} ms  "
                          f"({B * 30 / dt:8.0f} audio-sec/sec)")
                except Exception as e:
                    print(f"encoder B={B} {dtype_name} flash={flash}: "
                          f"FAILED {type(e).__name__}: {e}")
                model.set_flash_attention(False)

    # Decode RTF at batch sizes (fixed 64 sampled tokens, eot suppressed).
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    m = WhisperModel(params, dims, name="bench")
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    for B in (8, 16, 32):
        mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=64,
            suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
        )
        decode(m, mel, opts)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            r = decode(m, mel, opts)
            assert len(r[0].tokens) > 0  # tokens are host-materialized: synced
        dt = (time.perf_counter() - t0) / reps
        print(f"decode B={B}: {dt * 1e3:8.1f} ms -> "
              f"RTF {B * 30 / dt:8.1f} audio-sec/sec")


if __name__ == "__main__":
    main()

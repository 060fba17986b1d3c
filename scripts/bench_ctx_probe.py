"""Probe: does per-token decode cost scale with n_text_ctx (cache size)?

If halving the cache halves the step time, the while_loop is copying the
(L, B, Tmax, D) cache per step instead of updating in place.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions, tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    print("backend:", jax.default_backend())
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    rng = np.random.default_rng(0)
    B = 64
    mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)

    for ctx in (448, 128):
        dims = ModelDimensions(**{**tiny_dims().to_dict(), "n_text_ctx": ctx})
        params = model.init_params(jax.random.PRNGKey(0), dims)
        m = WhisperModel(params, dims, name=f"ctx{ctx}")
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=64,
            suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
        )
        decode(m, mel, opts)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            decode(m, mel, opts)
        dt = (time.perf_counter() - t0) / reps
        print(f"n_text_ctx={ctx}: {dt * 1e3:8.1f} ms "
              f"({dt / 64 * 1e3:6.2f} ms/token est)")


if __name__ == "__main__":
    main()

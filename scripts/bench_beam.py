"""Beam-search decode RTF on the real chip (transcribe CLI default: beam 5)."""

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
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    print("backend:", jax.default_backend())
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="bench")
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    rng = np.random.default_rng(0)

    sizes = [(int(s), 5) for s in sys.argv[1:]] or [(8, 5), (16, 5)]
    for B, K in sizes:
        mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=64,
            suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
            beam_size=K,
        )
        decode(m, mel, opts)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            decode(m, mel, opts)
        dt = (time.perf_counter() - t0) / reps
        print(f"beam B={B} K={K}: {dt * 1e3:8.1f} ms -> "
              f"RTF {B * 30 / dt:8.1f} audio-sec/sec")


if __name__ == "__main__":
    main()

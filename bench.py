"""Headline benchmark: Whisper Tiny greedy-decode RTF (audio-sec/sec/chip).

Protocol (identical to scripts/measure_reference_baseline.py, which runs the
reference PyTorch implementation): batch of synthetic 30 s mel segments,
random-init tiny weights, eot suppressed and a fixed sample_len so every row
decodes exactly the same number of tokens - a deterministic, weights-agnostic
measurement of the production decode path (encoder forward + jitted
lax.while_loop token loop with kv-cache).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is the speedup over the reference implementation measured on
this container's CPU (the reference has no TPU path; CPU/GPU is its native
habitat - BASELINE.md notes it publishes no hardware numbers of its own).
"""

import json
import sys
import time

# Reference PyTorch greedy-decode RTF measured on this host's CPU via
# scripts/measure_reference_baseline.py (2026-08-16).  Best-batch figures:
# batch 8 -> 19.662 audio-sec/sec (its best); batch 64 -> 8.845 (degrades).
# vs_baseline compares each stack at its own throughput-optimal batch.
REFERENCE_RTF_CPU = 19.662


def main():
    import numpy as np

    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    import qasr_ijcnlp_tpu as qasr
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    import jax
    import jax.numpy as jnp

    # Throughput-optimal batch (re-scan 2026-08-17 post fused-encoder +
    # decode trims: B=512 -> 19149, 640 -> 17631, 768 -> 19064,
    # 1024 -> 18874; the reference is likewise measured at ITS best
    # batch, 8).
    batch, steps, repeats = 512, 64, 5

    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="tiny (bench, random-init)")

    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    opts = DecodingOptions(
        language="en",
        without_timestamps=True,
        sample_len=steps,
        suppress_tokens=[tok.eot],
        suppress_blank=False,
        fp16=True,
    )

    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 80, 3000)), jnp.float32
    )

    decode(m, mel, opts)  # warmup + compile
    decode(m, mel, opts)  # second warmup: first post-compile call can
    # still pay one-off host/runtime costs through the tunneled link
    t0 = time.perf_counter()
    for _ in range(repeats):
        r = decode(m, mel, opts)
        assert len(r[0].tokens) > 0  # tokens are host-materialized: synced
    dt = time.perf_counter() - t0

    audio_sec = batch * 30.0 * repeats
    rtf = audio_sec / dt
    vs = (rtf / REFERENCE_RTF_CPU) if REFERENCE_RTF_CPU else None
    print(
        json.dumps(
            {
                "metric": "whisper_tiny_greedy_decode_rtf",
                "value": round(rtf, 3),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(vs, 3) if vs else None,
                # disambiguates a tunnel-down CPU-fallback run from a real
                # TPU measurement in the round record
                "platform": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

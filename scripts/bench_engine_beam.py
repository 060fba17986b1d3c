"""Beam-search serving: continuous-batching beam pools vs the micro-batcher.

Single 30 s requests arrive as a Poisson stream; both paths decode with the
SAME beam options (token-exact vs solo decode either way).  The
micro-batcher runs batch beam_decode (a request arriving mid-batch waits
for the whole batch's beam loop); the beam engine admits K-row groups into
freed slots every unroll block, so a late arrival never waits for an
earlier request's beams to drain.

Usage: python scripts/bench_engine_beam.py [n_requests] [rate_req_s] [slots] [batch] [beam]
Env:   QASR_BENCH_PLATFORM=cpu  force the CPU backend (smoke runs).
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bench_engine import run_load  # same open-loop Poisson harness


def main():
    import jax

    if os.environ.get("QASR_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["QASR_BENCH_PLATFORM"])

    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.serving import BatchingTranscriber

    n_requests = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    slots = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    beam = int(sys.argv[5]) if len(sys.argv) > 5 else 5
    print("backend:", jax.default_backend(), "beam:", beam)

    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="beam-engine-bench")
    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=32, fp16=True, beam_size=beam)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 30) * 0.05).astype(np.float32)

    micro = BatchingTranscriber(m, batch_size=batch, max_wait_ms=30.0,
                                options=opts)
    micro.transcribe(audio)  # warm / compile
    run_load("micro-batcher", micro.transcribe, n_requests, rate, audio)
    micro.close()

    engine = DecodeEngine(m, opts, slots=slots, unroll=4,
                          admit_width=2, audio_frontend=True)
    engine.submit(audio)  # warm / compile
    run_load("beam engine", engine.submit, n_requests, rate, audio)
    engine.close()


if __name__ == "__main__":
    main()

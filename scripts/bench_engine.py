"""Continuous-batching engine vs micro-batcher under open-loop load.

Single 30 s requests arrive as a Poisson stream at a fixed offered rate;
each path decodes the same audio with the same greedy options.  The
micro-batcher admits only between batches (a request arriving mid-batch
waits for the whole decode); the engine admits into freed slots every
unroll block.  Reports per-request latency percentiles and sustained
throughput for both, at the same offered load.

Usage: python scripts/bench_engine.py [n_requests] [rate_req_s] [slots] [batch]
Env:   QASR_BENCH_PLATFORM=cpu  force the CPU backend (smoke runs).
"""

import os
import sys
import threading
import time

sys.path.insert(0, ".")

import numpy as np


def run_load(label, call, n_requests, rate, audio):
    """Open-loop: request i is LAUNCHED at its Poisson arrival time no
    matter how the previous ones are doing (closed-loop clients hide
    head-of-line blocking by slowing the arrival process down)."""
    rng = np.random.default_rng(42)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n_requests))
    lat = [None] * n_requests
    errs = []

    def one(i):
        t0 = time.perf_counter()
        try:
            call(audio)
        except Exception as e:  # noqa: BLE001
            errs.append(repr(e))
            return
        lat[i] = time.perf_counter() - t0

    threads = []
    t0 = time.perf_counter()
    for i, at in enumerate(arrivals):
        now = time.perf_counter() - t0
        if at > now:
            time.sleep(at - now)
        th = threading.Thread(target=one, args=(i,))
        th.start()
        threads.append(th)
    for th in threads:
        th.join(timeout=1200)
    wall = time.perf_counter() - t0
    assert not errs, errs[:3]
    done = np.sort(np.asarray([x for x in lat if x is not None]))
    print(
        f"{label:>14}: {len(done)} reqs at {rate:.1f} offered req/s -> "
        f"{len(done) / wall:.2f} req/s sustained; latency "
        f"p50 {done[len(done) // 2]:.2f}s "
        f"p95 {done[int(len(done) * 0.95)]:.2f}s "
        f"max {done[-1]:.2f}s"
    )
    return done


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
    rate = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    slots = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    batch = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    print("backend:", jax.default_backend())

    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="engine-bench")
    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=32, fp16=True)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 30) * 0.05).astype(np.float32)

    micro = BatchingTranscriber(m, batch_size=batch, max_wait_ms=30.0,
                                options=opts)
    micro.transcribe(audio)  # warm / compile
    run_load("micro-batcher", micro.transcribe, n_requests, rate, audio)
    micro.close()

    engine = DecodeEngine(m, opts, slots=slots, unroll=4,
                          admit_width=4, audio_frontend=True)
    engine.submit(audio)  # warm / compile
    run_load("engine", engine.submit, n_requests, rate, audio)
    engine.close()

    spec = DecodeEngine(m, opts, slots=slots, unroll=2,
                        admit_width=4, audio_frontend=True, lookup_gamma=4)
    spec.submit(audio)  # warm / compile
    run_load("engine+lookup", spec.submit, n_requests, rate, audio)
    spec.close()


if __name__ == "__main__":
    main()

"""Online-transcription latency: per-feed wall time for a live session.

Simulates a real-time microphone: 1 s chunks fed at their natural rate
(or as fast as possible with --firehose), measuring the decode latency a
live-captioning client would see per feed, plus the realtime factor
(stream seconds per wall second — must exceed 1.0 to keep up).

Usage: python scripts/bench_streaming.py [stream_seconds] [--firehose]
Env:   QASR_BENCH_PLATFORM=cpu  force the CPU backend (smoke runs).
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    if os.environ.get("QASR_BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["QASR_BENCH_PLATFORM"])

    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    firehose = "--firehose" in sys.argv
    print("backend:", jax.default_backend())

    dims = tiny_dims()
    m = WhisperModel(
        model.init_params(jax.random.PRNGKey(0), dims), dims, name="s-bench"
    )
    opts = DecodingOptions(language="en", sample_len=48, fp16=True)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * seconds) * 0.05).astype(np.float32)

    s = StreamingTranscriber(m, opts, step_seconds=1.0)
    s.feed(audio[:16000])  # warm / compile the window program

    lat = []
    t_start = time.perf_counter()
    for i in range(1, seconds):
        if not firehose:
            target = i * 1.0
            now = time.perf_counter() - t_start
            if target > now:
                time.sleep(target - now)
        t0 = time.perf_counter()
        s.feed(audio[i * 16000: (i + 1) * 16000])
        lat.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    out = s.end()
    end_lat = time.perf_counter() - t0
    wall = time.perf_counter() - t_start

    lat = np.sort(np.asarray(lat))
    print(
        f"{seconds}s stream, {len(lat)} feeds"
        f"{' (firehose)' if firehose else ' (realtime-paced)'}: "
        f"feed latency p50 {lat[len(lat) // 2] * 1e3:.0f}ms "
        f"p95 {lat[int(len(lat) * 0.95)] * 1e3:.0f}ms "
        f"max {lat[-1] * 1e3:.0f}ms; end() {end_lat * 1e3:.0f}ms; "
        f"realtime factor {seconds / wall:.2f}x; "
        f"committed {len(out['text'])} chars"
    )


if __name__ == "__main__":
    main()

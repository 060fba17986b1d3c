"""Concurrent long-form transcription: engine-backed vs lock-serialized.

N clients each transcribe a multi-minute clip at once.  The lock path is
what a pre-engine server does: every window of every request serializes
under one device lock.  The engine path shares a continuous-batching slot
pool for the t=0 window decodes (transcribe(engine=...)), so requests
interleave window-by-window.  Quality gates are disabled so both paths
decode every window at t=0 (random weights always fail the gates, and the
ladder's sampled re-decodes would serialize identically in both paths,
masking the scheduling difference this bench isolates).

Usage: python scripts/bench_longform_engine.py [clients] [minutes] [slots]
Env:   QASR_BENCH_PLATFORM=cpu  force the CPU backend (smoke runs).
"""

import os
import sys
import threading
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
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine
    from qasr_ijcnlp_tpu.models import whisper as jmodel
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.transcribe import transcribe

    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    slots = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    print("backend:", jax.default_backend())

    dims = tiny_dims()
    model = WhisperModel(
        jmodel.init_params(jax.random.PRNGKey(0), dims), dims, name="tiny"
    )
    rng = np.random.default_rng(0)
    audios = [
        (0.1 * rng.standard_normal(int(16000 * 60 * minutes))).astype(
            np.float32
        )
        for _ in range(clients)
    ]
    audio_seconds = clients * 60.0 * minutes

    kwargs = dict(
        language="en",
        sample_len=32,
        condition_on_previous_text=False,
        compression_ratio_threshold=None,
        logprob_threshold=None,
    )

    def run_all(label, engine):
        lock = threading.RLock()
        lat = [None] * clients
        errs = []

        def one(i):
            t0 = time.perf_counter()
            try:
                if engine is not None:
                    transcribe(
                        model, audios[i], engine=engine, device_lock=lock,
                        **kwargs
                    )
                else:
                    with lock:
                        transcribe(model, audios[i], **kwargs)
            except Exception as e:  # noqa: BLE001
                errs.append(repr(e))
                return
            lat[i] = time.perf_counter() - t0

        # warm (compile) with one short run
        transcribe(
            model, audios[0][: 16000 * 35],
            **({"engine": engine, "device_lock": lock} if engine else {}),
            **kwargs,
        )
        threads = [
            threading.Thread(target=one, args=(i,)) for i in range(clients)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errs, errs[:3]
        done = sorted(x for x in lat if x is not None)
        print(
            f"{label:>18}: {clients} x {minutes:.0f} min concurrent -> "
            f"wall {wall:.1f}s ({audio_seconds / wall:.0f} audio-sec/s); "
            f"per-request p50 {done[len(done) // 2]:.1f}s "
            f"max {done[-1]:.1f}s"
        )
        return wall

    wall_lock = run_all("lock-serialized", None)
    engine = DecodeEngine(
        model, DecodingOptions(language="en", sample_len=32),
        slots=slots, audio_frontend=False,
    )
    try:
        wall_eng = run_all(f"engine ({slots} slots)", engine)
    finally:
        engine.close()
    print(f"speedup: {wall_lock / wall_eng:.2f}x")


if __name__ == "__main__":
    main()

"""Serving throughput on the chip: concurrent 30 s requests through the
micro-batching HTTP front end (qasr_ijcnlp_tpu/serving.py).

Usage: python scripts/bench_serving.py [n_clients] [server_batch]
Reports sustained requests/s, audio-sec/s and per-request latency
percentiles.
"""

import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.serving import serve

    n_clients = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    print("backend:", jax.default_backend())

    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="serve-bench")
    opts = DecodingOptions(language="en", without_timestamps=True,
                           sample_len=32, fp16=True)
    server, transcriber = serve(
        m, port=0, batch_size=batch, max_wait_ms=30.0, options=opts,
        block=False,
    )
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}/v1/transcribe"

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 30) * 0.05).astype(np.float32)
    # 16-bit PCM WAV body (960 KB binary) — a 10 MB JSON float list makes
    # the benchmark measure host json parsing instead of the server.
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    body = bio.getvalue()

    def post():
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "audio/wav"}
        )
        for attempt in range(3):
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    json.loads(r.read())
                return
            except OSError:
                if attempt == 2:
                    raise

    post()  # warm / compile

    per_client = 3
    lat = []
    lock = threading.Lock()

    def client():
        for _ in range(per_client):
            t0 = time.perf_counter()
            post()
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n = n_clients * per_client
    lat = np.sort(np.asarray(lat))
    print(
        f"{n} reqs, {n_clients} concurrent, server batch {batch}: "
        f"{n / wall:.1f} req/s ({n * 30 / wall:.0f} audio-sec/s); "
        f"latency p50 {lat[len(lat) // 2]:.2f}s "
        f"p95 {lat[int(len(lat) * 0.95)]:.2f}s"
    )
    server.shutdown()
    transcriber.close()


if __name__ == "__main__":
    main()

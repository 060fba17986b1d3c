"""Serving tests: concurrent requests batch together, HTTP surface works."""

import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_model():
    import jax

    from qasr_ijcnlp_tpu.models import whisper as jmodel
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    params = jmodel.init_params(jax.random.PRNGKey(0), dims)
    return WhisperModel(params, dims, name="serve-test")


@pytest.fixture(scope="module")
def service(small_model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.serving import BatchingTranscriber

    t = BatchingTranscriber(
        small_model, batch_size=4, max_wait_ms=50,
        options=DecodingOptions(language="en", without_timestamps=True,
                                sample_len=4),
    )
    yield t
    t.close()


def _audio(seed=0, seconds=1.0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(16000 * seconds))).astype(np.float32)


def test_single_request(service):
    out = service.transcribe(_audio())
    assert set(out) >= {"text", "tokens", "avg_logprob", "language"}


def test_concurrent_requests_all_answered(service):
    results = [None] * 6

    def worker(i):
        results[i] = service.transcribe(_audio(seed=i))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)


def test_http_server(small_model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.serving import serve

    server, transcriber = serve(
        small_model, port=0, batch_size=2, block=False,
        options=DecodingOptions(language="en", without_timestamps=True,
                                sample_len=4),
    )
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.load(r)["status"] == "ok"

        # WAV body
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(
                (_audio(seed=3) * 32767).astype(np.int16).tobytes()
            )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe", data=buf.getvalue(),
            headers={"Content-Type": "audio/wav"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert "text" in out and "tokens" in out

        # JSON body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe",
            data=json.dumps({"audio": _audio(seed=4)[:8000].tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert "text" in json.load(r)

        # malformed body -> clean 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe", data=b"not audio",
            headers={"Content-Type": "audio/wav"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        transcriber.close()


def test_http_long_form_and_streaming(small_model):
    """Long-form routing (word_timestamps) + chunked streaming endpoint."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.serving import serve

    server, transcriber = serve(
        small_model, port=0, batch_size=2, block=False,
        options=DecodingOptions(language="en", without_timestamps=True,
                                sample_len=4),
    )
    port = server.server_address[1]
    try:
        # word_timestamps=1 forces the long-form pipeline even on short audio
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe"
            "?word_timestamps=1&sample_len=8",
            data=json.dumps({"audio": _audio(seed=5, seconds=2.0).tolist()}
                            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.load(r)
        assert set(out) >= {"text", "segments", "language"}
        for seg in out["segments"]:
            assert "words" in seg
            for w in seg["words"]:
                assert set(w) >= {"word", "start", "end", "probability"}

        # streaming: 35 s -> 2 windows; newline-delimited JSON chunks ending
        # with a done event carrying the final text
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe/stream?sample_len=8",
            data=json.dumps(
                {"audio": _audio(seed=6, seconds=35.0).tolist()}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        events = []
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers.get("Content-Type") == "application/x-ndjson"
            for line in r:
                events.append(json.loads(line))
        assert events, "no stream events received"
        assert events[-1].get("done") is True and "text" in events[-1]
        for ev in events[:-1]:
            assert "segments" in ev and "progress" in ev
            assert all("text" in s for s in ev["segments"])
    finally:
        server.shutdown()
        transcriber.close()

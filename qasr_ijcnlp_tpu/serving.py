"""Batched transcription serving.

The reference has no serving story (research scripts only); this is the
production-deployment surface for the TPU build:

* :class:`BatchingTranscriber` — a micro-batching executor: concurrent
  requests queue up, a background worker groups them into fixed-size padded
  batches (one compiled decode signature) and fans results back out.  This
  is the right TPU serving shape: the chip sees a constant (B, 80, 3000)
  program at the throughput-optimal batch instead of per-request shapes.
* :func:`serve` — a dependency-free stdlib HTTP front end:
    POST /v1/transcribe            body = PCM WAV bytes or JSON {"audio": [...]}
         query params: ``long=1`` (force the long-form pipeline),
         ``word_timestamps=1`` (word-level timing via cross-attention DTW),
         ``batch_windows=N`` (batched-window fast path for long audio).
         Audio longer than 30 s routes to the long-form pipeline
         automatically; <= 30 s goes through the micro-batcher.
    POST /v1/transcribe/stream     same body; newline-delimited JSON chunks:
         {"segments": [...], "progress": seconds} per committed window,
         then {"done": true, "text": ..., "language": ...}.
    GET  /healthz
"""

from __future__ import annotations

import io
import json
import queue
import sys
import threading
import wave
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio import log_mel_spectrogram, pad_or_trim
from .decode import DecodingOptions, decode


class ServerMetrics:
    """Thread-safe counters for the serving process, rendered in the
    Prometheus text exposition format at ``GET /metrics``.

    Dependency-free observability (SURVEY.md §5 metrics/logging): request
    and error counts per route, end-to-end latency sums/max (rate() and
    averages are the scraper's job), micro-batch occupancy, and processed
    audio seconds — the numbers needed to alert on saturation (occupancy ->
    batch_size) and latency regressions.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = {}

    def inc(self, name: str, value: float = 1.0):
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def set_max(self, name: str, value: float):
        with self._lock:
            if value > self._counters.get(name, 0.0):
                self._counters[name] = value

    def set(self, name: str, value: float):
        """Gauge: last write wins (e.g. current slot occupancy)."""
        with self._lock:
            self._counters[name] = value

    def observe_request(self, route: str, seconds: float, error: bool):
        self.inc(f'requests_total{{route="{route}"}}')
        if error:
            self.inc(f'errors_total{{route="{route}"}}')
        self.inc(f'request_seconds_sum{{route="{route}"}}', seconds)
        self.set_max(f'request_seconds_max{{route="{route}"}}', seconds)

    def observe_batch(self, size: int, capacity: int, seconds: float):
        self.inc("batches_total")
        self.inc("batched_requests_total", size)
        self.inc("batch_slots_total", capacity)
        self.inc("batch_seconds_sum", seconds)

    def render(self) -> str:
        with self._lock:
            items = sorted(self._counters.items())
        return "".join(
            f"qasr_{name} {value:g}\n" for name, value in items
        )


@dataclass
class _Pending:
    audio: np.ndarray  # padded/trimmed raw 16 kHz mono, int16 wire format
    scale: float       # per-clip dequant factor: float = int16 * scale
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    error: Optional[str] = None


class BatchingTranscriber:
    """Groups concurrent requests into padded fixed-size decode batches."""

    def __init__(
        self,
        model,
        batch_size: int = 16,
        max_wait_ms: float = 25.0,
        options: Optional[DecodingOptions] = None,
        workers: int = 1,
        mesh=None,
        metrics: Optional[ServerMetrics] = None,
    ):
        # workers=2 pipelines the host->device upload of one micro-batch
        # under the device compute of the previous one (~15% throughput on a
        # local chip), but two threads entering the JAX runtime at once
        # intermittently crashes tunneled/remote device backends with a bare
        # C++ terminate (NOTES_ROUND2 "container gotchas").  Default to the
        # always-safe single worker; opt into 2 on directly-attached chips.
        self.model = model
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        if self.mesh is not None:
            # Data-parallel serving: params sharded once, every micro-batch
            # sharded along the mesh's data axis (the kernels partition via
            # ops/partition.py).  The compiled batch shape must divide the
            # data axis — round it up.
            from . import parallel

            batch_size = parallel.round_up_to_mesh(batch_size, self.mesh)
            model.shard(self.mesh)
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1e3
        self.metrics = metrics or ServerMetrics()
        # Default language matches the long-form route: auto-detect on
        # multilingual models (language=None), English on *.en models — so
        # the same clip transcribes the same whether it is 20 s
        # (micro-batcher) or 40 s (long-form pipeline).
        self.options = options or DecodingOptions(
            language=None if model.is_multilingual else "en",
            without_timestamps=True,
        )
        self._queue: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        # One jitted program for the batch mel: the eager path dispatches
        # op-by-op (25 ms tunnel latency each — profiled at ~3 s per
        # micro-batch with the vmapped fused-mel kernel under vmap).  Audio
        # crosses to the device as int16 (the serving wire format anyway) —
        # half the host->device bytes, which dominate over a remote link —
        # and is rescaled on device inside the same program.
        n_mels = self.model.dims.n_mels
        self._jmel = jax.jit(
            lambda a, s: log_mel_spectrogram(
                a.astype(jnp.float32) * s[:, None], n_mels
            )
        )
        self._workers = [
            threading.Thread(target=self._run, daemon=True)
            for _ in range(max(1, workers))
        ]
        for w in self._workers:
            w.start()
        # Graceful teardown even on abrupt interpreter exit: a daemon worker
        # cancelled MID-DEVICE-CALL aborts remote/tunneled runtimes with a
        # bare C++ terminate ("FATAL: exception not rethrown").  Joining the
        # worker before teardown lets the in-flight batch finish cleanly.
        import atexit

        atexit.register(self.close)

    # -- client side ---------------------------------------------------------

    def transcribe(self, audio: np.ndarray, timeout: float = 600.0) -> dict:
        """Blocking single-utterance request (thread-safe).

        Only pads/trims on the request thread; the mel is computed by the
        batching worker in ONE device call for the whole micro-batch (a
        per-request jitted mel + host fetch cost ~50 ms of dispatch latency
        each through a tunneled device link and serialized the server at
        ~10 req/s).  The int16 wire format is quantized against the CLIP's
        own peak (scale restored on device), so quiet or >1-amplitude
        inputs keep their full dynamic range (~90 dB SNR per clip)."""
        if self._stop.is_set():
            raise RuntimeError("transcriber is closed")
        audio = np.asarray(audio)
        if audio.dtype == np.int16:
            # raw PCM passthrough from _decode_wav_bytes: restore [-1, 1]
            # scale before the per-clip peak quantization below.
            audio = audio.astype(np.float32) / 32768.0
        audio = pad_or_trim(np.asarray(audio, np.float32))
        peak = float(max(np.max(np.abs(audio)), 1e-9))
        item = _Pending(
            audio=(audio * (32767.0 / peak)).astype(np.int16),
            scale=peak / 32767.0,
        )
        self._queue.put(item)
        if self._stop.is_set() and not item.event.is_set():
            # close() may already have drained the queue; fail fast instead
            # of waiting out the full client timeout on an item no worker
            # will ever pick up.  (If a worker races us to it, the is_set
            # check above keeps its real answer.)
            item.error = "server shutting down"
            item.event.set()
        if not item.event.wait(timeout):
            raise TimeoutError("transcription timed out")
        if item.error:
            raise RuntimeError(item.error)
        return item.result

    def close(self):
        if self._stop.is_set():
            return  # idempotent (called again by atexit)
        self._stop.set()
        # Drop the atexit strong reference so a closed transcriber (and its
        # full parameter tree / device buffers) can be garbage-collected
        # instead of living until interpreter exit.
        import atexit

        try:
            atexit.unregister(self.close)
        except Exception:
            pass
        # Generous join: an in-flight micro-batch (possibly compiling) must
        # complete before the runtime is torn down — see __init__'s atexit
        # note.  Workers check _stop every collect cycle (≤0.1 s idle).
        for w in self._workers:
            w.join(timeout=600)
        while True:  # fail any requests still queued, so waiters wake now
            try:
                p = self._queue.get_nowait()
            except queue.Empty:
                break
            p.error = "server shutting down"
            p.event.set()

    # -- batching worker -----------------------------------------------------

    def _collect(self) -> List[_Pending]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = self.max_wait
        import time

        t0 = time.perf_counter()
        while len(batch) < self.batch_size:
            remaining = deadline - (time.perf_counter() - t0)
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self):
        import time

        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            t0 = time.perf_counter()
            try:
                from .data.loader import pad_batch_to

                (audios, scales), _ = pad_batch_to(
                    (
                        np.stack([p.audio for p in batch]),
                        np.asarray([p.scale for p in batch], np.float32),
                    ),
                    self.batch_size,  # pad to the compiled shape
                )
                # one batched on-device mel; stays on device into decode
                mels = self._jmel(audios, scales)
                if self.mesh is not None:
                    from . import parallel

                    mels = parallel.shard_batch(mels, self.mesh)
                results = decode(self.model, mels, self.options)
                for p, r in zip(batch, results):
                    p.result = {
                        "text": r.text.strip(),
                        "tokens": [int(t) for t in r.tokens],
                        "avg_logprob": float(r.avg_logprob),
                        "no_speech_prob": float(r.no_speech_prob),
                        "language": r.language,
                    }
                    p.event.set()
                self.metrics.observe_batch(
                    len(batch), self.batch_size, time.perf_counter() - t0
                )
            except Exception as e:  # propagate per-request
                self.metrics.inc("batch_errors_total")
                for p in batch:
                    if p.event.is_set():
                        continue  # already answered before the failure
                    p.error = f"{type(e).__name__}: {e}"
                    p.event.set()


def _decode_wav_bytes(data: bytes) -> np.ndarray:
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width != 2:
        raise ValueError("only 16-bit PCM WAV is supported")
    pcm = np.frombuffer(raw, np.int16)
    if n_ch == 1 and rate == 16000:
        # Lossless int16 passthrough: the long-form pipeline uploads it as-is
        # (half the host->device bytes) and dequantizes on device
        # (audio.log_mel_spectrogram), bit-identical to the float path.
        return pcm
    audio = pcm.astype(np.float32) / 32768.0
    if n_ch > 1:
        audio = audio.reshape(-1, n_ch).mean(axis=1)
    from .audio import resample_audio

    return resample_audio(audio, rate, 16000)  # anti-aliased downsample


# Decode options the long-form pipeline accepts verbatim (transcribe()
# forwards unknown kwargs into per-window DecodingOptions).  Excluded on
# purpose: temperature (transcribe owns the fallback ladder),
# without_timestamps (segmentation needs timestamp tokens), prompt/prefix
# (long-form builds its own rolling prompt).
_FORWARDED_OPTIONS = (
    "language", "task", "beam_size", "patience", "best_of", "length_penalty",
    "suppress_tokens", "suppress_blank", "fp16", "kv_int8", "prompt_bucket",
    "sample_len", "draft",
)


def _long_form_kwargs(options: Optional[DecodingOptions], query: dict) -> dict:
    """kwargs for transcribe() on >30 s / streaming requests.

    Every decode option the server was configured with carries over, so a
    request decodes with the same beam width/precision whether it is 3 s
    (micro-batcher) or 3 min (long-form)."""
    kwargs = {
        "word_timestamps": query.get("word_timestamps", ["0"])[0]
        in ("1", "true"),
    }
    if query.get("condition_on_previous_text", [""])[0] in ("0", "false"):
        # Windows become independent: with an engine-backed server every
        # window of every concurrent long request then shares the slot pool.
        kwargs["condition_on_previous_text"] = False
    bw = query.get("batch_windows", [None])[0]
    if bw:
        kwargs["batch_windows"] = int(bw)
    sl = query.get("sample_len", [None])[0]
    if sl:
        kwargs["sample_len"] = int(sl)  # bound per-window decode length
    if options is not None:
        defaults = DecodingOptions()
        for name in _FORWARDED_OPTIONS:
            value = getattr(options, name)
            if value is not None and value != getattr(defaults, name):
                kwargs.setdefault(name, value)  # query params win
    return kwargs


def serve(model, host: str = "127.0.0.1", port: int = 8077,
          batch_size: int = 16, max_wait_ms: float = 25.0,
          options: Optional[DecodingOptions] = None, block: bool = True,
          mesh=None, engine_slots: Optional[int] = None,
          engine_lookup_gamma: int = 0):
    """Start the HTTP transcription service; returns (server, transcriber).

    ``mesh``: shard the micro-batches (and model params) across a device
    mesh — data-parallel serving for multi-chip hosts.

    ``engine_slots``: route short (<=30 s) requests through the
    continuous-batching DecodeEngine (decode/engine.py) with this many
    slots instead of the stop-and-go micro-batcher — no head-of-line
    blocking, mid-flight admission.  Greedy-only; multilingual models get
    per-request language detection when the options leave language unset."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from .transcribe import transcribe as _long_transcribe

    transcriber = BatchingTranscriber(
        model, batch_size, max_wait_ms, options, mesh=mesh
    )
    engine = None
    if engine_slots:
        from .decode.engine import DecodeEngine

        try:
            engine = DecodeEngine(
                model, options or transcriber.options, slots=engine_slots,
                audio_frontend=True, lookup_gamma=engine_lookup_gamma,
                mesh=mesh, metrics=transcriber.metrics,
            )
            # Online sessions decode WITH timestamps (the slide policy needs
            # segment boundaries), so they get their own slot pool —
            # concurrent sessions then share it via continuous batching
            # instead of serializing under long_lock.
            from dataclasses import replace as _replace

            stream_engine = DecodeEngine(
                model,
                _replace(
                    options or transcriber.options, without_timestamps=False
                ),
                slots=engine_slots, audio_frontend=True,
                lookup_gamma=engine_lookup_gamma, mesh=mesh,
            )
        except Exception:
            # don't leak the already-started transcriber workers when the
            # options are engine-incompatible (e.g. sampling temperature)
            transcriber.close()
            if engine is not None:
                engine.close()
            raise
    else:
        stream_engine = None

    # Long-form pool: mel-input + timestamps, options built EXACTLY the
    # way transcribe() builds its t=0 ladder rung from the server's
    # forwarded options — _engine_shortcut compares them for equality,
    # so any mismatch would silently disable the shortcut.  Concurrent
    # >30 s requests then interleave their 30 s windows in this pool
    # instead of serializing under long_lock (full effect with
    # ?condition_on_previous_text=0; conditioned windows carry a prompt
    # and use the locked path).  Built LAZILY on the first >30 s request:
    # a third slot pool's kv buffers are pure HBM overhead for deployments
    # that only ever see short clips.
    _long_engine_state: dict = {}
    _long_engine_build_lock = threading.Lock()

    def _get_long_engine():
        if not engine_slots:
            return None
        with _long_engine_build_lock:
            if "engine" not in _long_engine_state:
                from .decode.engine import DecodeEngine

                try:
                    lf = {
                        k: v
                        for k, v in _long_form_kwargs(options, {}).items()
                        if k not in ("word_timestamps", "batch_windows")
                    }
                    # transcribe() resolves language before building its t=0
                    # options: English-only models always decode "en", and a
                    # multilingual file whose detected language differs from
                    # the pool's simply falls back to the locked path.
                    lf.setdefault("language", "en")
                    _long_engine_state["engine"] = DecodeEngine(
                        model, DecodingOptions(**lf, temperature=0.0),
                        slots=engine_slots, audio_frontend=False,
                        lookup_gamma=engine_lookup_gamma, mesh=mesh,
                        metrics=transcriber.metrics,
                    )
                except Exception as e:
                    # e.g. sampling options, or no HBM left for a third pool:
                    # the server still works, >30 s requests just serialize
                    # under long_lock — but say so instead of hiding it.
                    print(
                        "[serving] long-form engine pool disabled "
                        f"({type(e).__name__}: {e}); >30 s requests will "
                        "serialize under the long-form lock",
                        file=sys.stderr,
                    )
                    _long_engine_state["engine"] = None
            return _long_engine_state["engine"]
    # Long-form requests drive the device directly (window-by-window shapes);
    # serialize them so concurrent streams don't interleave compile churn.
    # Reentrant: transcribe(device_lock=...) re-acquires it inside regions
    # the engine-backed route already holds (batched-path ladder fallbacks).
    long_lock = threading.RLock()

    def _run_long_transcribe(audio, **kw):
        """One body for both long-form routes (kw: on_segments + forwarded
        options).  Engine-backed: promptless t=0 windows batch continuously
        with OTHER long requests and only ladder fallbacks / alignment
        serialize under the (reentrant) lock; without a pool the whole call
        serializes under long_lock."""
        eng = _get_long_engine()
        if eng is not None:
            return _long_transcribe(
                transcriber.model, audio,
                engine=eng, device_lock=long_lock, **kw,
            )
        with long_lock:
            return _long_transcribe(transcriber.model, audio, **kw)

    # Online sessions (streaming.StreamingTranscriber): id -> [session,
    # last-access].  Device work is serialized under long_lock (every
    # session decodes the same padded 30 s window shape, so one compiled
    # program serves them all); idle sessions are purged lazily.
    sessions: Dict[str, list] = {}
    sessions_lock = threading.Lock()
    SESSION_IDLE_TTL = 600.0

    def _purge_sessions_locked(now):
        for k in [
            k for k, v in sessions.items()
            if now - v[1] > SESSION_IDLE_TTL
        ]:
            del sessions[k]

    def _get_session(sid):
        import time as _t

        with sessions_lock:
            _purge_sessions_locked(_t.time())
            entry = sessions.get(sid)
            if entry is not None:
                entry[1] = _t.time()
                return entry[0]
        return None

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked streaming responses

        def log_message(self, *args):
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload, default=float).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": transcriber.model.name})
            elif self.path == "/metrics":
                body = transcriber.metrics.render().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "not found"})

        def _read_audio(self) -> np.ndarray:
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            ctype = self.headers.get("Content-Type", "")
            if "json" in ctype:
                return np.asarray(json.loads(data)["audio"], np.float32)
            return _decode_wav_bytes(data)

        def do_POST(self):
            import time

            url = urlparse(self.path)
            query = parse_qs(url.query)
            metrics = transcriber.metrics
            if url.path == "/v1/transcribe":
                t0, route, failed = time.perf_counter(), "transcribe", False
                try:
                    audio = self._read_audio()
                    metrics.inc("audio_seconds_total", len(audio) / 16000.0)
                    force_long = (
                        query.get("long", ["0"])[0] in ("1", "true")
                        or query.get("word_timestamps", ["0"])[0]
                        in ("1", "true")
                        or "batch_windows" in query
                    )
                    if force_long or len(audio) > 30 * 16000:
                        route = "transcribe_long"
                        self._send(
                            200,
                            _run_long_transcribe(
                                audio, **_long_form_kwargs(options, query)
                            ),
                        )
                    elif engine is not None:
                        route = "transcribe_engine"
                        self._send(200, engine.submit(audio))
                    else:
                        self._send(200, transcriber.transcribe(audio))
                except Exception as e:
                    failed = True
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                metrics.observe_request(
                    route, time.perf_counter() - t0, failed
                )
            elif url.path == "/v1/stream/sessions":
                # create an online (incremental) transcription session
                import time as _t
                import uuid

                t0, failed = time.perf_counter(), False
                try:
                    from dataclasses import replace

                    from .streaming import StreamingTranscriber

                    opts = options or transcriber.options
                    if "language" in query:
                        opts = replace(
                            opts, language=query["language"][0] or None
                        )
                    kwargs = {
                        k: float(query[k][0])
                        for k in ("step_seconds", "window_seconds", "vad_rms")
                        if k in query
                    }
                    if query.get("word_timestamps", ["0"])[0] in (
                        "1", "true"
                    ):
                        kwargs["word_timestamps"] = True
                    # the shared engine pool was built with the SERVER's
                    # language; a per-session override decodes via the
                    # plain (lock-serialized) path instead
                    use_engine = (
                        stream_engine is not None and "language" not in query
                    )
                    st = StreamingTranscriber(
                        transcriber.model,
                        replace(opts, without_timestamps=False),
                        decode_fn=(
                            stream_engine.submit if use_engine else None
                        ),
                        **kwargs,
                    )
                    sid = uuid.uuid4().hex[:16]
                    with sessions_lock:
                        _purge_sessions_locked(_t.time())
                        sessions[sid] = [st, _t.time()]
                    self._send(200, {"id": sid})
                except Exception as e:
                    failed = True
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                metrics.observe_request(
                    "stream_session_create", time.perf_counter() - t0, failed
                )
            elif url.path.startswith("/v1/stream/sessions/"):
                parts = url.path.split("/")
                sid = parts[4] if len(parts) > 4 else ""
                action = parts[5] if len(parts) > 5 else ""
                st = _get_session(sid)
                t0, failed = time.perf_counter(), False
                if st is None:
                    failed = True
                    self._send(404, {"error": "unknown session"})
                elif action == "audio":
                    try:
                        audio = self._read_audio()
                        metrics.inc(
                            "audio_seconds_total", len(audio) / 16000.0
                        )
                        # decode under the lock (engine-backed sessions
                        # batch continuously instead and skip it); write to
                        # the client socket OUTSIDE the lock either way —
                        # a stalled client must not wedge the process-wide
                        # long-form/stream pipeline
                        if st.decode_fn is not None:
                            out = st.feed(audio)
                        else:
                            with long_lock:
                                out = st.feed(audio)
                        self._send(200, out)
                    except Exception as e:
                        failed = True
                        self._send(400, {"error": f"{type(e).__name__}: {e}"})
                elif action == "end":
                    try:
                        if st.decode_fn is not None:
                            out = st.end()
                        else:
                            with long_lock:
                                out = st.end()
                        with sessions_lock:
                            sessions.pop(sid, None)
                        self._send(200, out)
                    except Exception as e:
                        failed = True
                        with sessions_lock:
                            sessions.pop(sid, None)
                        self._send(400, {"error": f"{type(e).__name__}: {e}"})
                else:
                    failed = True
                    self._send(404, {"error": "not found"})
                metrics.observe_request(
                    f"stream_session_{action or 'unknown'}",
                    time.perf_counter() - t0, failed,
                )
            elif url.path == "/v1/transcribe/stream":
                t0 = time.perf_counter()
                try:
                    audio = self._read_audio()
                    metrics.inc("audio_seconds_total", len(audio) / 16000.0)
                except Exception as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                    metrics.observe_request(
                        "stream", time.perf_counter() - t0, True
                    )
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def emit(obj):
                    line = (json.dumps(obj, default=float) + "\n").encode()
                    self.wfile.write(
                        f"{len(line):x}\r\n".encode() + line + b"\r\n"
                    )
                    self.wfile.flush()

                # The decode runs in a worker thread and pushes chunks to a
                # queue drained HERE, outside long_lock: a slow or dead
                # streaming client stalls only its own handler thread, never
                # the process-wide long-form pipeline (it previously wrote
                # to the client socket from inside the lock).  A dead socket
                # surfaces as a send error after the timeout below.
                self.connection.settimeout(30.0)
                chunks: "queue.Queue" = queue.Queue()

                def run():
                    try:
                        result = _run_long_transcribe(
                            audio,
                            on_segments=lambda segs, prog: chunks.put(
                                {"segments": segs, "progress": prog}
                            ),
                            **_long_form_kwargs(options, query),
                        )
                        chunks.put({
                            "done": True,
                            "text": result["text"],
                            "language": result["language"],
                        })
                    except Exception as e:
                        chunks.put({"error": f"{type(e).__name__}: {e}"})
                    chunks.put(None)

                worker = threading.Thread(target=run, daemon=True)
                worker.start()
                failed = False
                try:
                    while (obj := chunks.get()) is not None:
                        failed = failed or "error" in obj
                        emit(obj)
                    self.wfile.write(b"0\r\n\r\n")
                except OSError:
                    # Client went away mid-stream; let the decode finish and
                    # discard the rest.
                    failed = True
                    while chunks.get() is not None:
                        pass
                metrics.observe_request(
                    "stream", time.perf_counter() - t0, failed
                )
            else:
                self._send(404, {"error": "not found"})

    class Server(ThreadingHTTPServer):
        # socketserver's default listen backlog of 5 resets connections
        # under bursts of concurrent clients (measured at 128 in
        # scripts/bench_serving.py); size it for serving load.
        request_queue_size = 256

        @property
        def long_engine(self):
            # Builds the pool on first access, exactly as the first >30 s
            # request would; None when engine_slots is unset or the pool
            # can't be built (sampling options / no HBM headroom).
            return _get_long_engine()

    server = Server((host, port), Handler)
    server.engine = engine  # non-blocking callers close via server.engine
    server.stream_engine = stream_engine
    if block:
        try:
            print(f"serving on http://{host}:{port} (batch={batch_size})")
            server.serve_forever()
        finally:
            transcriber.close()
            for eng in (engine, stream_engine,
                        _long_engine_state.get("engine")):
                if eng is not None:
                    eng.close()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, transcriber


def main(argv=None):
    import argparse

    from .cli import load_model_with_fallback, resolve_device

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="tiny")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8077)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=25.0)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard micro-batches across all visible devices")
    p.add_argument("--engine_slots", type=int, default=None,
                   help="Route short requests through the continuous-"
                        "batching DecodeEngine with this many slots "
                        "(no head-of-line blocking; greedy or beam pools "
                        "at temperature 0)")
    p.add_argument("--engine_lookup_gamma", type=int, default=0,
                   help="Prompt-lookup speculative rounds in the engine: "
                        "up to gamma+1 tokens per slot per forward "
                        "(token-exact)")
    args = p.parse_args(argv)
    resolve_device(args.device)
    model = load_model_with_fallback(args.model)
    mesh = None
    if args.data_parallel:
        from . import parallel

        mesh = parallel.make_mesh(model_parallel=1)
        print(f"data-parallel serving over {mesh.devices.size} devices")
    serve(model, args.host, args.port, args.batch_size, args.max_wait_ms,
          mesh=mesh, engine_slots=args.engine_slots,
          engine_lookup_gamma=args.engine_lookup_gamma)


if __name__ == "__main__":
    main()

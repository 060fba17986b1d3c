"""Engine-backed long-form transcription: transcribe(engine=...).

Contract: passing a continuous-batching DecodeEngine can never change a
transcript — the engine serves only the temperature ladder's t=0 rung, only
for promptless windows, and only when its decode options exactly equal the
call's t=0 options (engine tokens are exact vs plain greedy by the engine
parity suite).  Concurrent >30 s transcriptions then interleave their 30 s
windows in one shared slot pool instead of serializing.

The reference transcribes strictly one window at a time in one process
(/root/reference/whisper/whisper/transcribe.py:272-505); concurrent
long-form serving is a beyond-reference capability.
"""

import threading

import numpy as np
import pytest

import jax

from qasr_ijcnlp_tpu.decode import DecodingOptions
from qasr_ijcnlp_tpu.decode.engine import DecodeEngine
from qasr_ijcnlp_tpu.models import whisper as jmodel
from qasr_ijcnlp_tpu.models.dims import ModelDimensions
from qasr_ijcnlp_tpu.models.registry import WhisperModel
from qasr_ijcnlp_tpu.transcribe import transcribe

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=2, n_text_layer=1,
)

# Small per-window budget keeps CPU decode fast; everything else defaults.
OPTS = dict(language="en", sample_len=8)

# Random weights always fail the quality gates, which escalates the ladder
# into temperature SAMPLING (seeded from the np.random global state — the
# reference's convention, decoding.py); tests that need determinism without
# seeding disable the gates so every window accepts its t=0 decode.
NO_GATES = dict(compression_ratio_threshold=None, logprob_threshold=None)


@pytest.fixture(scope="module")
def model():
    params = jmodel.init_params(jax.random.PRNGKey(3), DIMS)
    return WhisperModel(params, DIMS, name="longform-engine-test")


def _audio(seed, seconds=40.0):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(16000 * seconds))).astype(
        np.float32
    )


def _engine(model, **kw):
    return DecodeEngine(
        model, DecodingOptions(**OPTS), slots=4, audio_frontend=False, **kw
    )


def _strip_floats(segments):
    """Segment identity up to float jitter: the engine computes avg_logprob
    in its own (equivalent) program, so gate-irrelevant last-bit drift is
    tolerated while tokens/text/timing must be exact."""
    keys = ("seek", "start", "end", "text", "tokens", "temperature")
    return [{k: s[k] for k in keys} for s in segments]


def test_engine_longform_matches_sequential(model):
    audio = _audio(0)
    base = transcribe(
        model, audio, condition_on_previous_text=False, **NO_GATES, **OPTS
    )
    eng = _engine(model)
    try:
        got = transcribe(
            model, audio, condition_on_previous_text=False, **NO_GATES,
            engine=eng, device_lock=threading.RLock(), **OPTS
        )
        # the engine must actually have been used (promptless windows)
        assert eng.admit_calls >= 1
    finally:
        eng.close()
    assert got["text"] == base["text"]
    assert _strip_floats(got["segments"]) == _strip_floats(base["segments"])
    for a, b in zip(got["segments"], base["segments"]):
        assert a["avg_logprob"] == pytest.approx(b["avg_logprob"], abs=1e-4)
        assert a["no_speech_prob"] == pytest.approx(
            b["no_speech_prob"], abs=1e-4
        )


def test_engine_longform_conditioned_prompts_fall_back(model):
    """condition_on_previous_text=True: every window after the first carries
    a rolling prompt, which the fixed-prompt engine admission can't decode —
    those windows take the plain path and the transcript is unchanged."""
    audio = _audio(1)
    base = transcribe(model, audio, **NO_GATES, **OPTS)
    eng = _engine(model)
    try:
        got = transcribe(
            model, audio, **NO_GATES, engine=eng,
            device_lock=threading.RLock(), **OPTS
        )
        admits = eng.admit_calls
    finally:
        eng.close()
    assert got["text"] == base["text"]
    assert _strip_floats(got["segments"]) == _strip_floats(base["segments"])
    # only the first (promptless) window can use the engine; later windows
    # carry prompts (gates are off, so no high-temperature prompt reset)
    assert admits == 1


def test_engine_longform_concurrent(model):
    """Three concurrent transcriptions share one slot pool; each equals its
    solo sequential run exactly."""
    audios = {s: _audio(s, seconds=35.0) for s in (10, 11, 12)}
    expected = {
        s: transcribe(
            model, a, condition_on_previous_text=False, **NO_GATES, **OPTS
        )
        for s, a in audios.items()
    }
    eng = _engine(model)
    lock = threading.RLock()
    results, errors = {}, []

    def run(seed):
        try:
            results[seed] = transcribe(
                model, audios[seed], condition_on_previous_text=False,
                **NO_GATES, engine=eng, device_lock=lock, **OPTS
            )
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))

    try:
        threads = [
            threading.Thread(target=run, args=(s,)) for s in audios
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        eng.close()
    assert not errors
    for s in audios:
        assert results[s]["text"] == expected[s]["text"]
        assert _strip_floats(results[s]["segments"]) == _strip_floats(
            expected[s]["segments"]
        )


def test_engine_mismatched_options_ignored(model):
    """An engine whose pool was built with different decode options must be
    ignored (with a warning), not silently change the transcript."""
    audio = _audio(2, seconds=35.0)
    base = transcribe(
        model, audio, condition_on_previous_text=False, language="en",
        sample_len=12, **NO_GATES,
    )
    eng = _engine(model)  # pool: sample_len=8 != call: sample_len=12
    try:
        with pytest.warns(UserWarning, match="engine.*ignored"):
            got = transcribe(
                model, audio, condition_on_previous_text=False,
                language="en", sample_len=12, engine=eng, **NO_GATES,
            )
        assert eng.admit_calls == 0
    finally:
        eng.close()
    assert got["text"] == base["text"]
    assert _strip_floats(got["segments"]) == _strip_floats(base["segments"])


def test_audio_frontend_engine_rejected(model):
    """An audio-input pool recomputes window mels with different boundary
    padding than file-level mel slices — transcribe must refuse it."""
    eng = DecodeEngine(
        model, DecodingOptions(**OPTS), slots=2, audio_frontend=True
    )
    try:
        with pytest.warns(UserWarning, match="engine.*ignored"):
            transcribe(
                model, _audio(3, seconds=31.0),
                condition_on_previous_text=False, engine=eng,
                **NO_GATES, **OPTS
            )
        assert eng.admit_calls == 0
    finally:
        eng.close()


def test_engine_longform_with_ladder_fallback(model):
    """With the quality gates ON, random weights fail t=0 and escalate the
    ladder into (np.random-seeded) sampling via the plain locked path; with
    identical seeding the engine-backed run reproduces the sequential run
    exactly — engine t=0 rungs are token-exact, so the gate decisions and
    the number of np.random draws line up."""
    audio = _audio(4, seconds=35.0)
    np.random.seed(1234)
    base = transcribe(
        model, audio, condition_on_previous_text=False, **OPTS
    )
    eng = _engine(model)
    try:
        np.random.seed(1234)
        got = transcribe(
            model, audio, condition_on_previous_text=False,
            engine=eng, device_lock=threading.RLock(), **OPTS
        )
        assert eng.admit_calls >= 1  # t=0 rungs still ran via the engine
    finally:
        eng.close()
    assert got["text"] == base["text"]
    assert _strip_floats(got["segments"]) == _strip_floats(base["segments"])


def test_engine_failure_degrades_to_locked_path(model):
    """A pool error mid-file (timeout, shutdown) must not abort the request:
    the session falls back to the plain per-window path and the transcript
    matches a run that never had an engine."""
    audio = _audio(7)
    base = transcribe(
        model, audio, condition_on_previous_text=False, **NO_GATES, **OPTS
    )
    eng = _engine(model)

    calls = {"n": 0}
    real_submit = eng.submit

    def flaky_submit(mel, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first window via engine, second blows up
            raise RuntimeError("engine shutting down")
        return real_submit(mel, **kw)

    eng.submit = flaky_submit
    try:
        with pytest.warns(UserWarning, match="engine window decode failed"):
            got = transcribe(
                model, audio, condition_on_previous_text=False,
                **NO_GATES, **OPTS, engine=eng,
            )
    finally:
        eng.close()
    assert calls["n"] == 2  # engine abandoned after the failure
    assert got["text"] == base["text"]
    assert _strip_floats(got["segments"]) == _strip_floats(base["segments"])

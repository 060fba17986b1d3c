"""Beam-search slot pools in the continuous-batching engine.

Contract: a beam pool (DecodeEngine with options.beam_size=K) returns, for
every request, exactly the tokens `model.decode` produces for that request
ALONE with the same options — groups of K hypothesis rows run the shared
`_beam_transition` (decode/loop.py) and each group freezes on precisely the
solo beam loop's exit predicate, so co-scheduling cannot leak between
requests.  Reference beam semantics: BeamSearchDecoder,
/root/reference/whisper/whisper/decoding.py:301-404 (the reference has no
serving/continuous-batching layer at all).
"""

import threading

import numpy as np
import pytest

import jax

from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
from qasr_ijcnlp_tpu.decode.engine import DecodeEngine
from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
from qasr_ijcnlp_tpu.models.whisper import init_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=50, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=48, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def model():
    return WhisperModel(
        init_params(jax.random.PRNGKey(21), DIMS), DIMS, name="beam-engine"
    )


def _mel(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((80, DIMS.n_audio_ctx * 2)).astype(np.float32)


def _solo(model, seed, **opts):
    return decode(
        model, _mel(seed), DecodingOptions(fp16=False, language="en", **opts)
    )


def _check(result, solo):
    assert result["tokens"] == list(solo.tokens)
    assert result["text"] == solo.text
    assert result["avg_logprob"] == pytest.approx(solo.avg_logprob, abs=1e-4)
    assert result["no_speech_prob"] == pytest.approx(
        solo.no_speech_prob, abs=1e-5
    )


def test_beam_engine_matches_solo_decode(model):
    """Concurrent beam requests through a small pool: token-exact vs each
    request decoded alone, with mid-flight admission (5 requests, 2 groups)."""
    opts = dict(sample_len=12, beam_size=3)
    seeds = [41, 42, 43, 44, 45]
    solos = {s: _solo(model, s, **opts) for s in seeds}

    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", **opts),
        slots=2, unroll=2, admit_width=2,
    )
    try:
        results, errors = {}, []

        def worker(s):
            try:
                results[s] = engine.submit(_mel(s), timeout=300)
            except Exception as e:  # noqa: BLE001
                errors.append((s, e))

        threads = [threading.Thread(target=worker, args=(s,)) for s in seeds]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        for s in seeds:
            _check(results[s], solos[s])
        assert engine.admit_calls >= 2  # slot reuse / mid-flight admission
    finally:
        engine.close()


def test_beam_engine_timestamps_variant(model):
    """Timestamp grammar state (max_ts/paired rules) survives the per-group
    freeze: beam pool WITH timestamps matches solo decode."""
    opts = dict(sample_len=10, beam_size=2, without_timestamps=False)
    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", **opts), slots=2,
    )
    try:
        for s in (51, 52, 53):
            _check(engine.submit(_mel(s), timeout=300), _solo(model, s, **opts))
    finally:
        engine.close()


def test_beam_engine_length_penalty_and_patience(model):
    """The retirement ranking replicates MaximumLikelihoodRanker (length
    penalty alpha) and the finished set honors patience (C = K*patience)."""
    opts = dict(
        sample_len=12, beam_size=3, length_penalty=0.5, patience=2.0
    )
    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", **opts), slots=2,
    )
    try:
        for s in (61, 62, 63, 64):
            _check(engine.submit(_mel(s), timeout=300), _solo(model, s, **opts))
    finally:
        engine.close()


def test_beam_engine_audio_frontend():
    """Serving configuration: raw audio in, mel inside the admission
    program.  Parity vs decode of the identically prepared mel.  Needs the
    full 1500-frame audio context (pad_or_trim emits 30 s windows)."""
    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram, pad_or_trim

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=48, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    model = WhisperModel(
        init_params(jax.random.PRNGKey(5), dims), dims, name="beam-af"
    )
    opts = dict(sample_len=8, beam_size=2)
    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", **opts),
        slots=2, audio_frontend=True,
    )
    try:
        rng = np.random.default_rng(71)
        audio = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)
        padded = pad_or_trim(audio)
        peak = float(max(np.max(np.abs(padded)), 1e-9))
        q = (padded * (32767.0 / peak)).astype(np.int16)
        mel = np.asarray(
            log_mel_spectrogram(
                q.astype(np.float32)[None] * (peak / 32767.0), dims.n_mels
            )
        )[0]
        solo = decode(
            model, mel, DecodingOptions(fp16=False, language="en", **opts)
        )
        _check(engine.submit(audio, timeout=300), solo)
    finally:
        engine.close()


def test_beam_engine_rejections(model):
    with pytest.raises(ValueError, match="greedy-only"):
        DecodeEngine(
            model,
            DecodingOptions(fp16=False, language="en", beam_size=2),
            lookup_gamma=2,
        )
    with pytest.raises(ValueError, match="kv_int8"):
        DecodeEngine(
            model,
            DecodingOptions(
                fp16=False, language="en", beam_size=2, kv_int8=True
            ),
        )
    with pytest.raises(ValueError, match="best_of"):
        DecodeEngine(
            model, DecodingOptions(fp16=False, language="en", best_of=2)
        )


def test_beam_engine_longform_transcribe():
    """transcribe(engine=<beam pool>) serves beam t=0 window rungs:
    transcript identical to the engine-less run (same options)."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    model = WhisperModel(
        init_params(jax.random.PRNGKey(9), dims), dims, name="beam-lf"
    )
    rng = np.random.default_rng(3)
    audio = (0.1 * rng.standard_normal(16000 * 40)).astype(np.float32)
    opts = dict(language="en", sample_len=8, beam_size=2)
    gates = dict(compression_ratio_threshold=None, logprob_threshold=None)
    base = transcribe(
        model, audio, condition_on_previous_text=False, **gates, **opts
    )
    eng = DecodeEngine(
        model, DecodingOptions(**opts), slots=2, audio_frontend=False
    )
    try:
        got = transcribe(
            model, audio, condition_on_previous_text=False, **gates, **opts,
            engine=eng,
        )
        assert eng.admit_calls >= 1
    finally:
        eng.close()
    assert got["text"] == base["text"]
    keys = ("seek", "start", "end", "text", "tokens", "temperature")
    assert [{k: s[k] for k in keys} for s in got["segments"]] == [
        {k: s[k] for k in keys} for s in base["segments"]
    ]

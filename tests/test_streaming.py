"""Online/incremental transcription (qasr_ijcnlp_tpu/streaming.py).

Invariants: committed text only ever grows (never retracted), the
single-window final text matches the one-shot decode of the same audio,
deterministic across identical streams, and >30 s streams slide the
window while staying bounded.
"""

import numpy as np
import pytest

import jax

from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
from qasr_ijcnlp_tpu.models.whisper import init_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=1, n_vocab=51865, n_text_ctx=448, n_text_state=64,
    n_text_head=2, n_text_layer=1,
)


@pytest.fixture(scope="module")
def model():
    return WhisperModel(
        init_params(jax.random.PRNGKey(11), DIMS), DIMS, name="stream-test"
    )


def _audio(seed, seconds):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(16000 * seconds))).astype(
        np.float32
    )


def _opts(**kw):
    from qasr_ijcnlp_tpu.decode import DecodingOptions

    return DecodingOptions(
        fp16=False, language="en", sample_len=12, **kw
    )


def test_streaming_final_matches_one_shot(model):
    """Short stream (one window, no slides): end() text == the plain
    one-shot greedy decode of the same audio."""
    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram, pad_or_trim
    from qasr_ijcnlp_tpu.decode import decode
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    audio = _audio(1, 4.0)
    (expected,) = decode(
        model, log_mel_spectrogram(pad_or_trim(audio), 80)[None], _opts()
    )

    s = StreamingTranscriber(model, _opts(), step_seconds=1.0)
    for i in range(0, len(audio), 8000):
        s.feed(audio[i: i + 8000])
    out = s.end()
    # streaming text is the exact concatenation of committed deltas (so a
    # client can append them); the one-shot result is .strip()ed
    assert out["text"].strip() == expected.text
    assert out["partial"] == ""
    assert out["language"] == "en"


def test_streaming_commits_never_retract(model):
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    audio = _audio(2, 6.0)
    s = StreamingTranscriber(model, _opts(), step_seconds=1.0)
    seen = ""
    for i in range(0, len(audio), 4000):
        out = s.feed(audio[i: i + 4000])
        assert out["text"].startswith(seen)
        seen = out["text"]
    out = s.end()
    assert out["text"].startswith(seen)


def test_streaming_deterministic(model):
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    audio = _audio(3, 5.0)

    def run():
        s = StreamingTranscriber(model, _opts(), step_seconds=1.0)
        outs = [
            s.feed(audio[i: i + 8000])
            for i in range(0, len(audio), 8000)
        ]
        outs.append(s.end())
        return [(o["text"], o["partial"]) for o in outs]

    assert run() == run()


def test_streaming_long_stream_slides_window(model):
    """A stream past 30 s must slide (bounded buffer) and keep committing."""
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    s = StreamingTranscriber(
        model, _opts(), step_seconds=2.0, window_seconds=12.0
    )
    audio = _audio(4, 40.0)
    for i in range(0, len(audio), 16000 * 2):
        s.feed(audio[i: i + 16000 * 2])
        assert len(s._audio) <= 16000 * 13  # window stays bounded
    out = s.end()
    assert out["stream_seconds"] == pytest.approx(40.0, abs=0.1)
    assert isinstance(out["text"], str)


def test_streaming_rejects_bad_options(model):
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    with pytest.raises(ValueError, match="temperature 0"):
        StreamingTranscriber(model, _opts(temperature=0.5))
    with pytest.raises(ValueError, match="timestamp"):
        StreamingTranscriber(model, _opts(without_timestamps=True))


def test_streaming_end_is_terminal(model):
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    s = StreamingTranscriber(model, _opts())
    s.feed(_audio(5, 1.0))
    s.end()
    with pytest.raises(RuntimeError, match="ended"):
        s.feed(_audio(5, 1.0))


def test_streaming_end_drains_multi_window_backlog(model):
    """end() with more than one window still buffered must decode ALL of it
    (30 s blocks then the final partial window), not silently truncate."""
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    s = StreamingTranscriber(model, _opts(), step_seconds=1000.0)
    # step_seconds huge -> feed() never decodes; everything lands on end()
    calls = []
    orig = s._decode_window

    def spy():
        calls.append(len(s._audio))
        return orig()

    s._decode_window = spy
    s.feed(_audio(6, 65.0))
    out = s.end()
    # 65 s backlog: drain 30 s, drain 30 s, final 5 s -> 3 decodes
    assert len(calls) == 3
    assert out["stream_seconds"] == pytest.approx(65.0, abs=0.1)
    assert len(s._audio) <= 16000 * 30


def test_streaming_vad_gate_skips_silent_decodes(model):
    """With vad_rms set, silent audio never reaches the decoder; buffers
    still slide out; speech re-enables decoding."""
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    s = StreamingTranscriber(
        model, _opts(), step_seconds=1.0, window_seconds=5.0, vad_rms=0.01
    )
    calls = []
    orig = s._decode_window

    def spy():
        calls.append(1)
        return orig()

    s._decode_window = spy
    silence = np.zeros(16000, np.float32)
    for _ in range(8):  # 8 s of silence across a 5 s window: slides, no decode
        s.feed(silence)
    assert not calls
    assert len(s._audio) <= 16000 * 6  # still bounded (silent slide)

    s.feed(_audio(7, 2.0))  # speech: rms ~0.1 >> gate
    assert calls
    out = s.end()
    assert isinstance(out["text"], str)


def test_streaming_vad_gate_silent_end(model):
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    s = StreamingTranscriber(model, _opts(), vad_rms=0.01)
    s.feed(np.zeros(32000, np.float32))
    out = s.end()
    assert out["text"] == ""


def test_streaming_word_timestamps(model):
    """word_timestamps=True attaches absolute-time word dicts whenever a
    window finalizes; words accumulate and stay within the stream extent."""
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    s = StreamingTranscriber(
        model, _opts(), step_seconds=2.0, window_seconds=10.0,
        word_timestamps=True,
    )
    audio = _audio(8, 24.0)
    for i in range(0, len(audio), 16000 * 2):
        out = s.feed(audio[i: i + 16000 * 2])
        assert "words" in out
    out = s.end()
    assert out["words"], "committed text produced no word timings"
    for w in out["words"]:
        assert set(w) >= {"word", "start", "end", "probability"}
        assert 0.0 <= w["start"] <= w["end"] <= out["stream_seconds"] + 1e-6
    # words cover the committed text (same normalized concatenation)
    joined = "".join(w["word"] for w in out["words"])
    assert joined.replace(" ", "") == out["text"].replace(" ", "")


def test_streaming_beam_final_matches_one_shot(model):
    """Beam streaming (deterministic at temperature 0): single-window
    end() text == the one-shot beam decode of the same audio."""
    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram, pad_or_trim
    from qasr_ijcnlp_tpu.decode import decode
    from qasr_ijcnlp_tpu.streaming import StreamingTranscriber

    audio = _audio(6, 4.0)
    (expected,) = decode(
        model, log_mel_spectrogram(pad_or_trim(audio), 80)[None],
        _opts(beam_size=2),
    )

    s = StreamingTranscriber(model, _opts(beam_size=2), step_seconds=1.0)
    for i in range(0, len(audio), 8000):
        s.feed(audio[i: i + 8000])
    out = s.end()
    assert out["text"].strip() == expected.text
    assert out["partial"] == ""

"""Long-form transcription tests: writer parity (exact, host logic) and
end-to-end pipeline smoke on synthetic audio with a random tiny model."""

import io
import json

import numpy as np
import pytest

from tests.oracle import reference_whisper


@pytest.fixture(scope="module")
def ref():
    return reference_whisper()


def _fake_result(with_words=True):
    words1 = [
        {"word": " Hello", "start": 0.0, "end": 0.4, "probability": 0.9},
        {"word": " world,", "start": 0.4, "end": 0.8, "probability": 0.8},
        {"word": " this", "start": 1.2, "end": 1.5, "probability": 0.95},
        {"word": " is", "start": 1.5, "end": 1.6, "probability": 0.97},
        {"word": " a", "start": 1.6, "end": 1.65, "probability": 0.99},
        {"word": " test.", "start": 1.65, "end": 2.2, "probability": 0.85},
    ]
    words2 = [
        {"word": " Second", "start": 6.0, "end": 6.5, "probability": 0.9},
        {"word": " segment", "start": 6.5, "end": 7.1, "probability": 0.92},
        {"word": " here.", "start": 7.1, "end": 7.4, "probability": 0.88},
    ]
    segments = [
        {
            "id": 0, "seek": 0, "start": 0.0, "end": 2.2,
            "text": " Hello world, this is a test.",
            "tokens": [1, 2, 3], "temperature": 0.0, "avg_logprob": -0.3,
            "compression_ratio": 1.2, "no_speech_prob": 0.01,
        },
        {
            "id": 1, "seek": 0, "start": 6.0, "end": 7.4,
            "text": " Second segment here.",
            "tokens": [4, 5], "temperature": 0.0, "avg_logprob": -0.25,
            "compression_ratio": 1.1, "no_speech_prob": 0.02,
        },
    ]
    if with_words:
        segments[0]["words"] = words1
        segments[1]["words"] = words2
    return {"text": "Hello world, this is a test. Second segment here.",
            "segments": segments, "language": "en"}


WRITER_OPTS = [
    {},
    {"highlight_words": True},
    {"max_line_width": 12, "max_line_count": 2},
    {"max_words_per_line": 2},
    {"max_line_width": 10, "max_line_count": 1, "highlight_words": True},
]


@pytest.mark.parametrize("fmt", ["txt", "vtt", "srt", "tsv", "json"])
@pytest.mark.parametrize("opts_idx", range(len(WRITER_OPTS)))
@pytest.mark.parametrize("with_words", [True, False])
def test_writer_parity(ref, tmp_path, fmt, opts_idx, with_words):
    from whisper.utils import get_writer as ref_get_writer

    from qasr_ijcnlp_tpu.transcribe.writers import get_writer

    opts = WRITER_OPTS[opts_idx]
    result = _fake_result(with_words)

    ours_buf, ref_buf = io.StringIO(), io.StringIO()
    get_writer(fmt, str(tmp_path)).write_result(
        json.loads(json.dumps(result)), file=ours_buf, **opts
    )
    ref_get_writer(fmt, str(tmp_path)).write_result(
        json.loads(json.dumps(result)), file=ref_buf, **opts
    )
    assert ours_buf.getvalue() == ref_buf.getvalue()


def test_writer_files(tmp_path):
    from qasr_ijcnlp_tpu.transcribe.writers import get_writer

    writer = get_writer("all", str(tmp_path))
    writer(_fake_result(), "some/dir/audio.wav")
    for ext in ["txt", "vtt", "srt", "tsv", "json"]:
        assert (tmp_path / f"audio.{ext}").exists()


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from qasr_ijcnlp_tpu.models import whisper as jmodel
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    dims = tiny_dims()
    params = jmodel.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="tiny-random")
    m.alignment_heads = m.default_alignment_heads()
    return m


def _synthetic_speechish_audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * 16000)) / 16000.0
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t)
    audio = 0.1 * np.sin(2 * np.pi * f0 * t)
    audio += 0.02 * rng.standard_normal(len(t))
    return audio.astype(np.float32)


def test_transcribe_structure(tiny_model):
    from qasr_ijcnlp_tpu.transcribe import transcribe

    result = transcribe(
        tiny_model,
        _synthetic_speechish_audio(4.0),
        language="en",
        temperature=0.0,
        sample_len=12,
        no_speech_threshold=None,  # random model: accept whatever comes out
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert set(result) == {"text", "segments", "language"}
    assert result["language"] == "en"
    for seg in result["segments"]:
        assert seg["end"] >= seg["start"] >= 0
        assert isinstance(seg["text"], str)
        assert all(isinstance(t, int) for t in seg["tokens"])


def test_transcribe_word_timestamps_smoke(tiny_model):
    from qasr_ijcnlp_tpu.transcribe import transcribe

    result = transcribe(
        tiny_model,
        _synthetic_speechish_audio(3.0, seed=1),
        language="en",
        temperature=0.0,
        sample_len=10,
        word_timestamps=True,
        no_speech_threshold=None,
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    for seg in result["segments"]:
        assert "words" in seg
        for w in seg["words"]:
            assert w["end"] >= w["start"]
            assert 0.0 <= w["probability"] <= 1.0


def test_transcribe_on_segments_streams_each_window(tiny_model):
    """The streaming hook fires once per committed window with the same
    segments that end up in the final result, in order."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    events = []
    result = transcribe(
        tiny_model,
        _synthetic_speechish_audio(35.0, seed=2),  # 2 windows
        language="en",
        temperature=0.0,
        sample_len=8,
        condition_on_previous_text=False,
        no_speech_threshold=None,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        on_segments=lambda segs, progress: events.append((segs, progress)),
    )
    assert len(events) >= 2  # one commit per 30 s window
    streamed = [s for segs, _ in events for s in segs]
    assert streamed == result["segments"]
    progresses = [p for _, p in events]
    assert progresses == sorted(progresses)


def test_transcribe_batch_windows_matches_structure(tiny_model):
    """The batched fast path yields the same per-window segmentation as the
    sequential loop when conditioning is off and gates are disabled."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    audio = _synthetic_speechish_audio(65.0, seed=5)  # 3 windows
    kw = dict(
        language="en", temperature=0.0, sample_len=8,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None, condition_on_previous_text=False,
    )
    seq = transcribe(tiny_model, audio, **kw)
    bat = transcribe(tiny_model, audio, batch_windows=2, **kw)
    assert bat["language"] == "en"
    assert len(bat["segments"]) >= 1
    # identical decode per window => identical texts when seeks align
    seq_texts = [s["text"] for s in seq["segments"]]
    bat_texts = [s["text"] for s in bat["segments"]]
    assert seq_texts[0] == bat_texts[0]


def test_transcribe_initial_prompt_branches(tiny_model):
    """initial_prompt and carry_initial_prompt paths run and prepend the
    prompt tokens to the conditioning stream (not the output text)."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    audio = _synthetic_speechish_audio(2.0, seed=9)
    kw = dict(
        language="en", temperature=0.0, sample_len=6,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    r1 = transcribe(tiny_model, audio, initial_prompt="context words", **kw)
    assert "context words" not in r1["text"]
    r2 = transcribe(
        tiny_model, audio, initial_prompt="context words",
        carry_initial_prompt=True, **kw,
    )
    assert set(r2) == {"text", "segments", "language"}


def test_transcribe_clip_timestamps(tiny_model):
    from qasr_ijcnlp_tpu.transcribe import transcribe

    result = transcribe(
        tiny_model,
        _synthetic_speechish_audio(6.0, seed=2),
        language="en",
        temperature=0.0,
        sample_len=8,
        clip_timestamps="1.0,3.0",
        no_speech_threshold=None,
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    for seg in result["segments"]:
        assert seg["start"] >= 0.9


def test_transcribe_batch_windows_word_timestamps(tiny_model):
    """Batched long-form honors word_timestamps (VERDICT r2 item 3): every
    committed segment carries word dicts, and the first window's words agree
    with the sequential path (later windows may differ: the sequential loop
    feeds word end-times back into seek; the batched path has no seek)."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    audio = _synthetic_speechish_audio(35.0, seed=13)  # 2 windows
    kw = dict(
        language="en", temperature=0.0, sample_len=8,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None, condition_on_previous_text=False,
        word_timestamps=True,
    )
    seq = transcribe(tiny_model, audio, **kw)
    bat = transcribe(tiny_model, audio, batch_windows=2, **kw)
    assert len(bat["segments"]) >= 1
    for seg in bat["segments"]:
        assert "words" in seg
        for w in seg["words"]:
            assert w["end"] >= w["start"] >= 0
            assert 0.0 <= w["probability"] <= 1.0
    if seq["segments"] and bat["segments"]:
        s0, b0 = seq["segments"][0], bat["segments"][0]
        assert [w["word"] for w in s0["words"]] == [
            w["word"] for w in b0["words"]
        ]
        for ws, wb in zip(s0["words"], b0["words"]):
            assert abs(ws["start"] - wb["start"]) < 1e-6
            assert abs(ws["end"] - wb["end"]) < 1e-6


def test_transcribe_batch_windows_clip_timestamps(tiny_model):
    """Batched long-form restricts windows to the requested clips."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    result = transcribe(
        tiny_model,
        _synthetic_speechish_audio(6.0, seed=2),
        language="en",
        temperature=0.0,
        sample_len=8,
        clip_timestamps="1.0,3.0",
        batch_windows=2,
        no_speech_threshold=None,
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert result["segments"], "clipped batched transcribe produced nothing"
    for seg in result["segments"]:
        assert seg["start"] >= 0.9


def test_transcribe_batch_windows_initial_prompt(tiny_model):
    """initial_prompt conditions every batched window; it never leaks into
    the output text."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    audio = _synthetic_speechish_audio(4.0, seed=9)
    result = transcribe(
        tiny_model, audio, initial_prompt="context words", batch_windows=2,
        language="en", temperature=0.0, sample_len=6,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert "context words" not in result["text"]
    assert set(result) == {"text", "segments", "language"}


def test_transcribe_batch_windows_warns_on_hallucination_gate(tiny_model):
    import warnings as _w

    from qasr_ijcnlp_tpu.transcribe import transcribe

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        transcribe(
            tiny_model,
            _synthetic_speechish_audio(2.0, seed=3),
            language="en", temperature=0.0, sample_len=4,
            batch_windows=2, word_timestamps=True,
            hallucination_silence_threshold=2.0,
            no_speech_threshold=None, logprob_threshold=None,
            compression_ratio_threshold=None,
        )
    assert any(
        "hallucination_silence_threshold" in str(w.message) for w in caught
    )


def test_transcribe_batch_windows_overlapping_clips(tiny_model):
    """Overlapping clips never re-decode the overlap: the reference's seek
    is monotonic across clips (transcribe.py:272-283), so the batched path
    must commit each window at most once and continue a later overlapping
    clip from the previous clip's end."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    kw = dict(
        language="en", temperature=0.0, sample_len=8,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    audio = _synthetic_speechish_audio(6.0, seed=3)
    dup = transcribe(
        tiny_model, audio, clip_timestamps="0,2,0,4", batch_windows=2, **kw
    )
    keys = [(s["seek"], s["start"], s["text"]) for s in dup["segments"]]
    assert len(keys) == len(set(keys)), "window committed more than once"
    seeks = [s["seek"] for s in dup["segments"]]
    assert seeks == sorted(seeks)
    # the second clip resumes at the first clip's end (seek 200), not at 0
    assert set(seeks) <= {0, 200}


def test_transcribe_batch_windows_clip_beyond_audio(tiny_model):
    """A clip lying entirely past the audio content decodes nothing (the
    sequential loop never seeks past content_frames) instead of committing
    a hallucinated window of pure padding."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    res = transcribe(
        tiny_model, _synthetic_speechish_audio(4.0, seed=5),
        clip_timestamps="100,110", batch_windows=2,
        language="en", temperature=0.0, sample_len=8,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert res["segments"] == []
    assert res["text"] == ""


def test_transcribe_int16_input_token_parity(tiny_model):
    """int16 waveform input (the lossless PCM device-upload fast path) must
    produce the exact segments/tokens of the equivalent float32 input."""
    from qasr_ijcnlp_tpu.transcribe import transcribe

    audio_f = _synthetic_speechish_audio(4.0, seed=3)
    pcm = (audio_f * 32768.0).astype(np.int16)
    kwargs = dict(
        language="en",
        temperature=0.0,
        sample_len=12,
        no_speech_threshold=None,
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    via_float = transcribe(tiny_model, pcm.astype(np.float32) / 32768.0, **kwargs)
    via_int16 = transcribe(tiny_model, pcm, **kwargs)
    assert via_int16["text"] == via_float["text"]
    assert [s["tokens"] for s in via_int16["segments"]] == [
        s["tokens"] for s in via_float["segments"]
    ]

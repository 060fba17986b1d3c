"""AOT export artifacts (qasr_ijcnlp_tpu/export.py).

Contract: a serialized artifact, deserialized in the same or a fresh
process, produces token-exact greedy decodes vs the live decode() path —
with the weights baked in (no params passed at call time).
"""

import numpy as np
import pytest

import jax

from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
from qasr_ijcnlp_tpu.models.whisper import init_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
    n_audio_layer=1, n_vocab=51865, n_text_ctx=48, n_text_state=64,
    n_text_head=2, n_text_layer=1,
)


@pytest.fixture(scope="module")
def model():
    return WhisperModel(
        init_params(jax.random.PRNGKey(3), DIMS), DIMS, name="export-test"
    )


def _audio(seed, batch):
    rng = np.random.default_rng(seed)
    return (
        0.1 * rng.standard_normal((batch, 480000))
    ).astype(np.float32)


def test_export_round_trip_token_exact(model, tmp_path):
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.export import (
        decode_artifact_tokens, export_greedy_decode, load_artifact,
        save_artifact,
    )

    opts = DecodingOptions(
        fp16=False, language="en", without_timestamps=True, sample_len=8
    )
    exported, meta = export_greedy_decode(
        model, opts, batch=2, from_audio=True
    )
    path = str(tmp_path / "decode.qasrx")
    save_artifact(path, exported, meta)

    call, meta2 = load_artifact(path)
    assert meta2["sample_begin"] == meta["sample_begin"]
    assert meta2["outputs"][0] == "buf"

    audio = _audio(7, 2)
    buf, cur_len, sum_lp, no_speech = call(audio)
    got = decode_artifact_tokens(buf, cur_len, meta2)

    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram

    mels = np.asarray(log_mel_spectrogram(audio, DIMS.n_mels))
    expected = decode(model, mels, opts)
    for g, e in zip(got, expected):
        assert g == list(e.tokens)
    # weights are baked in: the artifact took only the audio argument
    assert list(np.asarray(buf).shape)[0] == 2


def test_export_from_mel(model, tmp_path):
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.export import (
        decode_artifact_tokens, export_greedy_decode, load_artifact,
        save_artifact,
    )

    opts = DecodingOptions(
        fp16=False, language="en", without_timestamps=True, sample_len=6
    )
    exported, meta = export_greedy_decode(
        model, opts, batch=1, from_audio=False
    )
    path = str(tmp_path / "mel.qasrx")
    save_artifact(path, exported, meta)
    call, meta2 = load_artifact(path)
    assert meta2["input_shape"] == [1, 80, 3000]

    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram

    mel = np.asarray(log_mel_spectrogram(_audio(9, 1), DIMS.n_mels))
    buf, cur_len, *_ = call(mel)
    got = decode_artifact_tokens(buf, cur_len, meta2)
    (expected,) = decode(model, mel, opts)
    assert got[0] == list(expected.tokens)


def test_export_rejects_non_greedy(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.export import export_greedy_decode

    with pytest.raises(ValueError, match="greedy-only"):
        export_greedy_decode(
            model, DecodingOptions(language="en", beam_size=2)
        )
    with pytest.raises(ValueError, match="fixed language"):
        export_greedy_decode(model, DecodingOptions(language=None))


def test_export_bad_magic(tmp_path):
    from qasr_ijcnlp_tpu.export import load_artifact

    p = tmp_path / "junk.qasrx"
    p.write_bytes(b"NOTANARTIFACT")
    with pytest.raises(ValueError, match="not a qasr export artifact"):
        load_artifact(str(p))


def test_export_cross_platform_lowering(model, tmp_path):
    """A TPU+CPU artifact can be built on a CPU-only host (multi-platform
    lowering); the CPU leg stays callable here."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.export import (
        export_greedy_decode, load_artifact, save_artifact,
    )

    opts = DecodingOptions(
        fp16=False, language="en", without_timestamps=True, sample_len=4
    )
    exported, meta = export_greedy_decode(
        model, opts, batch=1, from_audio=False, platforms=("tpu", "cpu")
    )
    assert sorted(meta["platforms"]) == ["cpu", "tpu"]
    path = str(tmp_path / "xplat.qasrx")
    save_artifact(path, exported, meta)
    call, meta2 = load_artifact(path)
    buf, *_ = call(np.zeros((1, 80, 3000), np.float32))
    assert np.asarray(buf).shape[0] == 1

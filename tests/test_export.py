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


def test_quantize_params_error_bounds(model):
    """Per-channel int8 round-trip: every large leaf within the rounding
    bound, every small leaf (biases, LN) untouched."""
    from qasr_ijcnlp_tpu.models.quantize import (
        dequantize_params, quantization_error, quantize_params,
    )

    qp = quantize_params(model.params)
    max_abs, max_rel = quantization_error(model.params, qp)
    # symmetric rounding error <= (channel absmax/127)/2 -> rel <= 1/254
    assert max_rel <= 1.0 / 200.0, (max_abs, max_rel)

    # small leaves pass through bit-identical
    ln = model.params["encoder"]["ln_post"]["g"]
    deq = dequantize_params(qp)
    np.testing.assert_array_equal(
        np.asarray(ln), np.asarray(deq["encoder"]["ln_post"]["g"])
    )
    # large leaves are genuinely int8 in the quantized tree
    q_emb = qp["decoder"]["tok_emb"]
    assert q_emb["q"].dtype == np.int8 and q_emb["s"].dtype == np.float32


def test_export_quantized_artifact(model, tmp_path):
    """int8 artifact: ~4x smaller file, token-exact vs the in-process decode
    of the DEQUANTIZED params (separates export correctness from the
    quantization error, which random weights amplify)."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.export import (
        decode_artifact_tokens, export_greedy_decode, load_artifact,
        save_artifact,
    )
    from qasr_ijcnlp_tpu.models.quantize import (
        dequantize_params, quantize_params,
    )

    opts = DecodingOptions(
        fp16=False, language="en", without_timestamps=True, sample_len=6
    )
    fp, fp_meta = export_greedy_decode(
        model, opts, batch=1, from_audio=False
    )
    q, q_meta = export_greedy_decode(
        model, opts, batch=1, from_audio=False, quantize="int8"
    )
    fp_path = str(tmp_path / "fp.qasrx")
    q_path = str(tmp_path / "q.qasrx")
    save_artifact(fp_path, fp, fp_meta)
    save_artifact(q_path, q, q_meta)
    import os

    assert os.path.getsize(q_path) < 0.5 * os.path.getsize(fp_path), (
        os.path.getsize(q_path), os.path.getsize(fp_path),
    )
    assert q_meta["quantize"] == "int8"

    call, meta2 = load_artifact(q_path)
    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram

    mel = np.asarray(log_mel_spectrogram(_audio(13, 1), DIMS.n_mels))
    buf, cur_len, *_ = call(mel)
    got = decode_artifact_tokens(buf, cur_len, meta2)

    deq_model = WhisperModel(
        dequantize_params(quantize_params(model.params)), DIMS,
        name="export-test-deq",
    )
    (expected,) = decode(deq_model, mel, opts)
    assert got[0] == list(expected.tokens)


def test_export_rejects_unknown_quantize(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.export import export_greedy_decode

    with pytest.raises(ValueError, match="quantize"):
        export_greedy_decode(
            model,
            DecodingOptions(fp16=False, language="en",
                            without_timestamps=True),
            batch=1, quantize="int4",
        )


def test_export_with_kernels_roundtrip(model, tmp_path):
    """with_kernels=True: the safety check for tpu_custom_call is disabled
    and version metadata is recorded for the load-time compatibility warn.
    On the CPU test platform the kernels auto-gate OFF, so the traced
    program is custom-call-free and the artifact stays token-exact vs
    decode(); on a TPU host the same API embeds the Mosaic calls
    (exercised by scripts/bench_export_gap.py on-chip)."""
    import warnings

    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.export import (
        decode_artifact_tokens, export_greedy_decode, load_artifact,
        save_artifact,
    )

    opts = DecodingOptions(
        fp16=False, language="en", without_timestamps=True, sample_len=6
    )
    exported, meta = export_greedy_decode(
        model, opts, batch=1, from_audio=False, with_kernels=True
    )
    assert meta["with_kernels"] is True
    assert meta["jax_version"] == jax.__version__
    path = str(tmp_path / "kern.qasrx")
    save_artifact(path, exported, meta)
    call, meta2 = load_artifact(path)  # same version: no warning expected

    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram

    mel = np.asarray(log_mel_spectrogram(_audio(11, 1), DIMS.n_mels))
    buf, cur_len, *_ = call(mel)
    got = decode_artifact_tokens(buf, cur_len, meta2)
    (expected,) = decode(model, mel, opts)
    assert got[0] == list(expected.tokens)

    # version-mismatch warning path
    import json as _json

    with open(path, "rb") as f:
        raw = f.read()
    n = int(np.frombuffer(raw[8:12], np.uint32)[0])
    meta_bad = _json.loads(raw[12:12 + n].decode())
    meta_bad["jax_version"] = "0.0.1"
    head = _json.dumps(meta_bad).encode()
    path2 = str(tmp_path / "kern_bad.qasrx")
    with open(path2, "wb") as f:
        f.write(raw[:8])
        f.write(np.uint32(len(head)).tobytes())
        f.write(head)
        f.write(raw[12 + n:])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        load_artifact(path2)
    assert any("stability guarantee" in str(x.message) for x in w)


def test_export_with_kernels_rejects_cross_platform(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.export import export_greedy_decode

    opts = DecodingOptions(
        fp16=False, language="en", without_timestamps=True, sample_len=4
    )
    with pytest.raises(ValueError, match="TPU-only"):
        export_greedy_decode(
            model, opts, batch=1, from_audio=False, with_kernels=True,
            platforms=("tpu", "cpu"),
        )

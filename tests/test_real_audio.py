"""Real-audio end-to-end tests on the reference's spoken fixture (jfk.flac).

The container has no ffmpeg/soundfile, so the fixture is decoded by our
native FLAC reader (native/flac.cpp), validated here against an independent
pure-Python decoder (tests/flac_oracle.py).  The full-stack test then runs
mel -> encode -> decode -> transcribe -> word timing on the real speech with
random weights SHARED bit-for-bit between the reference (torch, executed in
place) and our stack, asserting token/segment/word-timing parity — the
offline-capable equivalent of the reference's integration test
(/root/reference/whisper/tests/test_transcribe.py:15-42, which needs
downloaded checkpoints).
"""

import numpy as np
import pytest

JFK = "/root/reference/whisper/tests/jfk.flac"


@pytest.fixture(scope="module")
def jfk_bytes():
    with open(JFK, "rb") as f:
        return f.read()


def test_flac_native_matches_python_oracle(jfk_bytes):
    from qasr_ijcnlp_tpu._native import native_flac_decode
    from tests import flac_oracle

    chans, rate, bps = flac_oracle.decode(jfk_bytes, max_frames=5)
    assert rate == 44100 and bps == 24 and len(chans) == 2
    n = len(chans[0])
    scale = 1.0 / (1 << (bps - 1))
    expect = ((np.asarray(chans[0], np.float64)
               + np.asarray(chans[1], np.float64)) * scale / 2.0)

    got = native_flac_decode(jfk_bytes, target_rate=rate)
    assert got is not None, "native library unavailable"
    np.testing.assert_allclose(got[:n], expect.astype(np.float32), atol=1e-7)


def test_flac_full_stream(jfk_bytes):
    from qasr_ijcnlp_tpu._native import native_flac_decode

    x = native_flac_decode(jfk_bytes, target_rate=44100)
    assert x.shape == (485100,)  # STREAMINFO total_samples, all frames decoded
    y = native_flac_decode(jfk_bytes, target_rate=16000)
    assert y.shape == (176000,)  # 11.0 s at 16 kHz
    assert float(np.abs(y).max()) < 1.0
    assert 0.01 < float(np.sqrt((y ** 2).mean())) < 0.5  # plausible speech


def test_load_audio_and_mel_on_real_speech(jfk_bytes):
    """Port of the reference audio test (whisper/tests/test_audio.py:8-19):
    load_audio properties + our mel matches torch.stft's on the same array."""
    import torch

    from qasr_ijcnlp_tpu.audio import SAMPLE_RATE, load_audio, log_mel_spectrogram
    from tests.oracle import reference_whisper

    ref = reference_whisper()

    audio = load_audio(JFK)
    assert audio.ndim == 1
    assert SAMPLE_RATE * 10 < audio.shape[0] < SAMPLE_RATE * 12
    assert 0 < audio.std() < 1

    mel_ours = np.asarray(log_mel_spectrogram(audio))
    mel_ref = ref.audio.log_mel_spectrogram(torch.from_numpy(audio)).numpy()
    assert mel_ours.shape == mel_ref.shape
    np.testing.assert_allclose(mel_ours, mel_ref, atol=1e-4)
    # the reference's dynamic-range property on real speech
    assert mel_ours.max() - mel_ours.min() <= 10.0
    mel_from_file = np.asarray(log_mel_spectrogram(JFK))
    np.testing.assert_allclose(mel_from_file, mel_ours, atol=1e-6)


@pytest.fixture(scope="module")
def shared_models():
    """Random-weight 2-layer/64-d model with REAL audio context (1500) and
    vocab, identical between torch and JAX."""
    import torch

    from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
    from qasr_ijcnlp_tpu.models.convert import from_torch_state_dict
    from tests.oracle import reference_whisper

    reference_whisper()
    from whisper.model import ModelDimensions as RefDims
    from whisper.model import Whisper as RefWhisper

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    torch.manual_seed(3)
    tm = RefWhisper(RefDims(**dims.to_dict())).eval()
    with torch.no_grad():
        tm.decoder.positional_embedding.normal_(0, 0.02)
    params = from_torch_state_dict(tm.state_dict(), dims)
    jm = WhisperModel(params, dims, name="real-audio-parity")
    jm.alignment_heads = np.asarray(tm.alignment_heads.to_dense().bool().numpy())
    return tm, jm


def test_real_audio_transcribe_parity(shared_models):
    """mel -> encoder -> decode loop -> long-form seek rules -> word-timing
    DTW, on real speech, token-identical between the two stacks."""
    import torch

    from qasr_ijcnlp_tpu.audio import load_audio
    from qasr_ijcnlp_tpu.transcribe import transcribe as our_transcribe
    from whisper.transcribe import transcribe as ref_transcribe

    tm, jm = shared_models
    audio = load_audio(JFK)

    kw = dict(
        language="en",
        temperature=(0.0,),
        word_timestamps=True,
        fp16=False,
        verbose=None,
    )
    with torch.no_grad():
        ref = ref_transcribe(tm, torch.from_numpy(audio), **kw)
    ours = our_transcribe(jm, audio, **kw)

    assert ours["language"] == ref["language"] == "en"
    assert len(ours["segments"]) == len(ref["segments"])
    for so, sr in zip(ours["segments"], ref["segments"]):
        assert so["tokens"] == list(sr["tokens"])
        assert so["text"] == sr["text"]
        assert abs(so["start"] - sr["start"]) < 1e-4
        assert abs(so["end"] - sr["end"]) < 1e-4
        words_o = so.get("words", [])
        words_r = sr.get("words", [])
        assert len(words_o) == len(words_r)
        for wo, wr in zip(words_o, words_r):
            assert wo["word"] == wr["word"]
            assert abs(wo["start"] - wr["start"]) < 0.02
            assert abs(wo["end"] - wr["end"]) < 0.02
    # the reference integration test's structural consistency assertions
    # (test_transcribe.py:24-33)
    timing_checked = False
    for seg in ours["segments"]:
        assert seg["start"] <= seg["end"]
        for w in seg.get("words", []):
            assert seg["start"] - 1e-6 <= w["start"] <= w["end"] <= seg["end"] + 1e-6
            timing_checked = True
    assert timing_checked or not any(
        s.get("words") for s in ref["segments"]
    )

# ---------------------------------------------------------------------------
# Base-width beam + word timing (VERDICT r2 item 6: strengthen the chain)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shared_models_base_width():
    """Random-weight model at BASE's widths (512-d, 8 heads; depth kept at 2
    for runtime), identical between torch and JAX — pins the parity chain at
    a second width class where the head geometry (dh=64, 4 lane groups)
    differs from the 64-d fixture."""
    import torch

    from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
    from qasr_ijcnlp_tpu.models.convert import from_torch_state_dict
    from tests.oracle import reference_whisper

    reference_whisper()
    from whisper.model import ModelDimensions as RefDims
    from whisper.model import Whisper as RefWhisper

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=512, n_audio_head=8,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=448, n_text_state=512,
        n_text_head=8, n_text_layer=2,
    )
    torch.manual_seed(7)
    tm = RefWhisper(RefDims(**dims.to_dict())).eval()
    with torch.no_grad():
        tm.decoder.positional_embedding.normal_(0, 0.02)
    params = from_torch_state_dict(tm.state_dict(), dims)
    jm = WhisperModel(params, dims, name="base-width-parity")
    jm.alignment_heads = np.asarray(
        tm.alignment_heads.to_dense().bool().numpy()
    )
    return tm, jm


def test_real_audio_beam_word_timing_parity_base_width(
    shared_models_base_width,
):
    """Beam search + word timestamps on real speech at base widths:
    token-identical transcripts and matching word timings between the two
    stacks (beam tie-breaks and DTW both exercised at dh=64 x 8 heads)."""
    import torch

    from qasr_ijcnlp_tpu.audio import load_audio
    from qasr_ijcnlp_tpu.transcribe import transcribe as our_transcribe
    from whisper.transcribe import transcribe as ref_transcribe

    tm, jm = shared_models_base_width
    audio = load_audio(JFK)

    kw = dict(
        language="en",
        temperature=(0.0,),
        beam_size=3,
        word_timestamps=True,
        fp16=False,
        verbose=None,
    )
    with torch.no_grad():
        ref = ref_transcribe(tm, torch.from_numpy(audio), **kw)
    ours = our_transcribe(jm, audio, **kw)

    assert ours["language"] == ref["language"] == "en"
    assert len(ours["segments"]) == len(ref["segments"])
    for so, sr in zip(ours["segments"], ref["segments"]):
        assert so["tokens"] == list(sr["tokens"])
        assert so["text"] == sr["text"]
        assert abs(so["start"] - sr["start"]) < 1e-4
        assert abs(so["end"] - sr["end"]) < 1e-4
        words_o = so.get("words", [])
        words_r = sr.get("words", [])
        assert len(words_o) == len(words_r)
        for wo, wr in zip(words_o, words_r):
            assert wo["word"] == wr["word"]
            assert abs(wo["start"] - wr["start"]) < 0.02
            assert abs(wo["end"] - wr["end"]) < 0.02


def test_malformed_flac_rice_partition_rejected():
    """Rice partition size smaller than the LPC order must be rejected as
    malformed: the residual count would underflow uint32 and write ~2^32
    samples past the block buffer (regression for a confirmed segfault)."""
    import pytest

    from qasr_ijcnlp_tpu._native import native_flac_decode

    class _BW:
        def __init__(self):
            self.bits = []

        def w(self, val, n):
            for i in range(n - 1, -1, -1):
                self.bits.append((val >> i) & 1)

        def bytes(self):
            while len(self.bits) % 8:
                self.bits.append(0)
            out = bytearray()
            for i in range(0, len(self.bits), 8):
                b = 0
                for bit in self.bits[i:i + 8]:
                    b = (b << 1) | bit
                out.append(b)
            return bytes(out)

    si = _BW()
    si.w(4096, 16); si.w(4096, 16)  # min/max blocksize
    si.w(0, 24); si.w(0, 24)        # min/max frame size
    si.w(16000, 20)                 # sample rate
    si.w(0, 3)                      # 1 channel
    si.w(15, 5)                     # 16 bps
    si.w(0, 36)                     # total samples unknown
    streaminfo = si.bytes() + b"\x00" * 16
    hdr = b"fLaC" + bytes([0x80, 0, 0, len(streaminfo)]) + streaminfo

    f = _BW()
    f.w(0b11111111111110, 14)  # sync
    f.w(0, 1); f.w(0, 1)
    f.w(12, 4)                 # blocksize 4096
    f.w(5, 4)                  # 16 kHz
    f.w(0, 4)                  # 1 channel
    f.w(4, 3)                  # 16 bps
    f.w(0, 1)
    f.w(0, 8)                  # frame number
    f.w(0, 8)                  # crc8
    f.w(0, 1); f.w(63, 6); f.w(0, 1)  # subframe: LPC order 32
    for _ in range(32):
        f.w(0, 16)             # warmup
    f.w(0, 4); f.w(0, 5)       # precision, shift
    for _ in range(32):
        f.w(0, 1)              # coefficients
    # residual: partition order 8 -> psize 16 < order 32 (the underflow)
    f.w(0, 2); f.w(8, 4); f.w(0, 4)
    data = hdr + f.bytes() + b"\xff" * (1 << 16)

    with pytest.raises(ValueError):
        native_flac_decode(data, 16000)

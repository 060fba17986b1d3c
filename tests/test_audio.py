"""Frontend parity: mel filterbank and log-mel spectrogram vs the reference."""

import numpy as np
import pytest

from qasr_ijcnlp_tpu import audio as qaudio


def test_constants():
    assert qaudio.N_SAMPLES == 480000
    assert qaudio.N_FRAMES == 3000
    assert qaudio.FRAMES_PER_SECOND == 100
    assert qaudio.TOKENS_PER_SECOND == 50


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filterbank_matches_reference_npz(n_mels):
    ref = np.load(
        "/root/reference/whisper/whisper/assets/mel_filters.npz", allow_pickle=False
    )[f"mel_{n_mels}"]
    ours = qaudio.mel_filters(n_mels)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-7)


def test_pad_or_trim(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    assert qaudio.pad_or_trim(x).shape == (qaudio.N_SAMPLES,)
    assert qaudio.pad_or_trim(x, 500).shape == (500,)
    np.testing.assert_array_equal(np.asarray(qaudio.pad_or_trim(x, 500)), x[:500])
    padded = np.asarray(qaudio.pad_or_trim(x, 2000))
    np.testing.assert_array_equal(padded[:1000], x)
    assert (padded[1000:] == 0).all()
    x2 = rng.standard_normal((3, 700)).astype(np.float32)
    assert qaudio.pad_or_trim(x2, 800).shape == (3, 800)


@pytest.mark.parametrize("n_samples", [16000, qaudio.N_SAMPLES])
def test_log_mel_matches_reference(rng, n_samples):
    from . import oracle

    whisper = oracle.reference_whisper()
    import torch

    wav = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
    ref = whisper.log_mel_spectrogram(torch.from_numpy(wav)).numpy()
    ours = np.asarray(qaudio.log_mel_spectrogram(wav))
    assert ours.shape == ref.shape == (80, n_samples // qaudio.HOP_LENGTH)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_log_mel_batched_and_padded(rng):
    from . import oracle

    whisper = oracle.reference_whisper()
    import torch

    wav = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
    # Our batched call clamps each item's dynamic range by its OWN max -
    # identical to calling the reference once per clip (which is how every
    # reference eval path uses it).  The reference's batched call instead
    # clamps by the batch-global max (audio.py:154), a quirk we deliberately
    # do not replicate: per-item results must not depend on batch-mates.
    ref = np.stack([
        whisper.log_mel_spectrogram(torch.from_numpy(w), padding=800).numpy()
        for w in wav
    ])
    ours = np.asarray(qaudio.log_mel_spectrogram(wav, padding=800))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_log_mel_on_speechlike_signal(rng):
    """Harmonic + noise signal exercises the full dynamic-range clamp path."""
    from . import oracle

    whisper = oracle.reference_whisper()
    import torch

    t = np.arange(qaudio.N_SAMPLES) / qaudio.SAMPLE_RATE
    wav = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.1 * np.sin(2 * np.pi * 880 * t)
        + 0.01 * rng.standard_normal(qaudio.N_SAMPLES)
    ).astype(np.float32)
    ref = whisper.log_mel_spectrogram(torch.from_numpy(wav)).numpy()
    ours = np.asarray(qaudio.log_mel_spectrogram(wav))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_resample_audio_antialiases():
    """Downsampling must low-pass first: a 12 kHz tone at 48 kHz is above
    the 16 kHz-Nyquist band and may not fold down to 4 kHz (regression for
    bare np.interp resampling)."""
    from qasr_ijcnlp_tpu.audio import resample_audio

    sr_in = 48000
    t = np.arange(sr_in // 2) / sr_in
    tone = (0.8 * np.sin(2 * np.pi * 12000 * t)).astype(np.float32)
    out = resample_audio(tone, sr_in, 16000)
    assert len(out) == 8000
    assert float(np.sqrt(np.mean(out**2))) < 0.05
    # In-band content survives: 1 kHz tone keeps its energy.
    tone_lo = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    out_lo = resample_audio(tone_lo, sr_in, 16000)
    rms = float(np.sqrt(np.mean(out_lo[100:-100] ** 2)))
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.02
    # Identity and upsample paths.
    assert resample_audio(tone, sr_in, sr_in) is not None
    up = resample_audio(out_lo, 16000, 32000)
    assert len(up) == 16000


def test_wav_extensible_format_falls_through_to_stdlib(tmp_path):
    """WAVE_FORMAT_EXTENSIBLE (fmt tag 0xFFFE, standard output of many
    recorders) is unsupported by the native decoder (-2); _load_wav must
    fall through to the stdlib wave module instead of raising (regression)."""
    import struct

    from qasr_ijcnlp_tpu.audio import _load_wav

    rng = np.random.default_rng(3)
    audio = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    pcm = (audio * 32767).astype(np.int16)
    # Hand-rolled WAVE_FORMAT_EXTENSIBLE container, 16-bit PCM mono 16 kHz.
    sub_fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    sub_fmt += struct.pack("<HHI", 22, 16, 1)  # cbSize, valid bits, mask
    sub_fmt += b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    data = pcm.tobytes()
    body = (b"WAVEfmt " + struct.pack("<I", len(sub_fmt)) + sub_fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    path = str(tmp_path / "ext.wav")
    with open(path, "wb") as f:
        f.write(wav)
    out = _load_wav(path, 16000)
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-4)


def test_log_mel_int16_exact_parity(rng):
    """int16 input uploads raw PCM and dequantizes on device; the mel must be
    bit-identical to pre-scaled float32 input (exact power-of-two divide)."""
    pcm = (rng.standard_normal(32000) * 8000).astype(np.int16)
    ref = np.asarray(qaudio.log_mel_spectrogram(pcm.astype(np.float32) / 32768.0))
    ours = np.asarray(qaudio.log_mel_spectrogram(pcm))
    np.testing.assert_array_equal(ours, ref)


def test_log_mel_int16_batched_and_padded(rng):
    pcm = (rng.standard_normal((2, 16000)) * 8000).astype(np.int16)
    ref = np.asarray(
        qaudio.log_mel_spectrogram(pcm.astype(np.float32) / 32768.0, padding=800)
    )
    ours = np.asarray(qaudio.log_mel_spectrogram(pcm, padding=800))
    np.testing.assert_array_equal(ours, ref)


def test_load_audio_any_wav_int16_passthrough(tmp_path, rng):
    """A mono 16-bit 16 kHz WAV loads losslessly as int16; the float and mel
    paths agree exactly with the public load_audio surface."""
    import wave

    pcm = (rng.standard_normal(16000) * 12000).astype(np.int16)
    path = str(tmp_path / "mono16k.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    raw = qaudio._load_audio_any(path)
    assert raw.dtype == np.int16
    np.testing.assert_array_equal(raw, pcm)
    np.testing.assert_array_equal(
        np.asarray(qaudio.load_audio(path)), pcm.astype(np.float32) / 32768.0
    )
    # Path input to the mel keeps the int16 fast path, same output.
    mel_from_path = np.asarray(qaudio.log_mel_spectrogram(path))
    mel_from_float = np.asarray(qaudio.log_mel_spectrogram(qaudio.load_audio(path)))
    np.testing.assert_array_equal(mel_from_path, mel_from_float)


def test_load_audio_any_falls_back_to_float(tmp_path, rng):
    """Stereo or non-16k WAVs need mixing/resampling, so the raw loader must
    return float32 identical to load_audio."""
    import wave

    pcm = (rng.standard_normal((8000, 2)) * 12000).astype(np.int16)
    path = str(tmp_path / "stereo16k.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    raw = qaudio._load_audio_any(path)
    assert raw.dtype == np.float32
    np.testing.assert_array_equal(raw, qaudio.load_audio(path))

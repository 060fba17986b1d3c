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

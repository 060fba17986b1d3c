"""Pallas kernel numerics (interpreter mode on CPU): flash attention and the
fused mel frontend must match the reference jnp paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _plain_attention(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(jnp.float32))


@pytest.mark.parametrize("T", [64, 200, 1500])
def test_flash_attention_matches_plain(rng, T):
    from qasr_ijcnlp_tpu.ops.flash import flash_attention

    B, H, Dh = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, H, T, Dh)), jnp.float32)
    ours = np.asarray(flash_attention(q, k, v))
    ref = np.asarray(_plain_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_flash_attention_cross_shape(rng):
    from qasr_ijcnlp_tpu.ops.flash import flash_attention

    q = jnp.asarray(rng.standard_normal((2, 2, 100, 64)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((2, 2, 300, 64)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((2, 2, 300, 64)), jnp.float32)
    ours = np.asarray(flash_attention(q, k, v))
    ref = np.asarray(_plain_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_encoder_with_flash_matches_without(rng):
    from qasr_ijcnlp_tpu.models import whisper as jmodel
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=64, n_audio_state=128, n_audio_head=2,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=128,
        n_text_head=2, n_text_layer=1,
    )
    params = jmodel.init_params(jax.random.PRNGKey(0), dims)
    mel = rng.standard_normal((1, 80, 128)).astype(np.float32)
    base = np.asarray(jmodel.encoder_apply(params["encoder"], mel, dims))
    jmodel.set_flash_attention(True)
    try:
        flash = np.asarray(jmodel.encoder_apply(params["encoder"], mel, dims))
    finally:
        jmodel.set_flash_attention(None)  # restore auto
    np.testing.assert_allclose(flash, base, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("seconds", [1.1, 30.0])
def test_fused_mel_matches_reference_path(rng, seconds):
    from qasr_ijcnlp_tpu.audio import log_mel_spectrogram
    from qasr_ijcnlp_tpu.ops.melfront import fused_log_mel_spectrogram

    audio = rng.standard_normal(int(16000 * seconds)).astype(np.float32) * 0.3
    ref = np.asarray(log_mel_spectrogram(audio))
    ours = np.asarray(fused_log_mel_spectrogram(audio))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_fused_mel_with_padding(rng):
    from qasr_ijcnlp_tpu.audio import N_SAMPLES, log_mel_spectrogram
    from qasr_ijcnlp_tpu.ops.melfront import fused_log_mel_spectrogram

    audio = rng.standard_normal(16000 * 3).astype(np.float32) * 0.1
    ref = np.asarray(log_mel_spectrogram(audio, padding=N_SAMPLES))
    ours = np.asarray(fused_log_mel_spectrogram(audio, padding=N_SAMPLES))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)

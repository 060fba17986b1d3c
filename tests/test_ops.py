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


@pytest.mark.parametrize("t_real", [640, 600])
def test_flash_packed_matches_plain(rng, t_real):
    """Packed (B, T, D) kernel vs head-split reference, incl. key masking."""
    from qasr_ijcnlp_tpu.ops.flash import flash_attention_packed

    B, H, Dh, T = 1, 2, 64, 640
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    ours = np.asarray(flash_attention_packed(q, k, v, H, t_real))

    def split(x):
        return x.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)).astype(jnp.float32)
    logits = jnp.where(jnp.arange(T) < t_real, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", w, split(v).astype(jnp.float32))
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, T, D))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_flash_packed_grad_matches_xla(rng):
    from qasr_ijcnlp_tpu.ops.flash import (
        _xla_attention_packed,
        flash_attention_packed,
    )

    B, H, Dh, T, t_real = 1, 2, 64, 512, 500
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)

    g1 = jax.grad(lambda a: flash_attention_packed(a, k, v, H, t_real).sum())(q)
    g2 = jax.grad(lambda a: _xla_attention_packed(a, k, v, H, t_real).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4,
                               rtol=1e-3)


def test_encoder_padded_flash_matches_unpadded(rng):
    """Encoder at a tile-aligned padded length (packed kernel path) must match
    the plain XLA encoder: padding rows are masked as keys and sliced off."""
    from qasr_ijcnlp_tpu.models import whisper as jmodel
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions

    # n_audio_ctx 520 -> pads to 640 inside encoder_apply when flash is on
    # (the pad gate requires the padded length >= 512, attention()'s packed
    # kernel gate).
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=520, n_audio_state=128, n_audio_head=2,
        n_audio_layer=2, n_vocab=100, n_text_ctx=16, n_text_state=128,
        n_text_head=2, n_text_layer=1,
    )
    params = jmodel.init_params(jax.random.PRNGKey(0), dims)
    mel = rng.standard_normal((1, 80, 1040)).astype(np.float32)
    base = np.asarray(jmodel.encoder_apply(params["encoder"], mel, dims))
    jmodel.set_flash_attention(True)
    try:
        flash = np.asarray(jmodel.encoder_apply(params["encoder"], mel, dims))
    finally:
        jmodel.set_flash_attention(None)  # restore auto
    assert flash.shape == base.shape
    np.testing.assert_allclose(flash, base, atol=5e-5, rtol=1e-4)


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


def test_int8_cross_attention_numerics():
    """The fused int8 kernel matches a plain-JAX dequantized attention given
    the same quantized operands (exactness of the kernel math itself)."""
    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.ops.decode_attn import int8_cross_attention, quantize_kv

    rng = np.random.default_rng(3)
    B, G, H, Dh, Ta = 2, 3, 4, 64, 200
    D = H * Dh
    k = jnp.asarray(rng.standard_normal((B, Ta, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Ta, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B * G, 1, D)), jnp.float32)

    k8, sk = quantize_kv(k, H)
    v8, sv = quantize_kv(v, H)
    out = np.asarray(int8_cross_attention(q, k8, sk, v8, sv, H, Ta))

    # reference: dequantize and run ordinary grouped attention in fp32
    kd = (k8.astype(jnp.float32) * sk[:, :, None, :])[..., :Ta]  # (B,H,Dh,Ta)
    vd = (v8.astype(jnp.float32) * sv[:, :, None, :])[..., :Ta]
    qh = (q * Dh ** -0.5).reshape(B, G, H, Dh)
    logits = jnp.einsum("bghd,bhdt->bght", qh, kd)
    w = jax.nn.softmax(logits, axis=-1)
    expect = jnp.einsum("bght,bhdt->bghd", w, vd).reshape(B * G, 1, D)
    np.testing.assert_allclose(out, np.asarray(expect), atol=2e-5, rtol=1e-5)


def test_int8_quantize_roundtrip_error_bound():
    from qasr_ijcnlp_tpu.ops.decode_attn import quantize_kv

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 100, 128)).astype(np.float32)
    q8, s = quantize_kv(jnp.asarray(x), 2)
    deq = np.asarray(q8, np.float32) * np.asarray(s)[:, :, None, :]
    deq = deq[..., :100]  # unpad
    xh = x.reshape(2, 100, 2, 64).transpose(0, 2, 3, 1)
    # symmetric per-(head, position) quantization: error <= scale/2
    bound = np.asarray(s)[:, :, None, :100] * 0.5 + 1e-7
    assert (np.abs(deq - xh) <= bound).all()


def test_decode_with_kv_int8_runs_and_is_close():
    """End-to-end greedy decode with the int8 cache: runs, and the selected
    tokens/logprobs stay close to the fp path on a random tiny model."""
    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
    from qasr_ijcnlp_tpu.models import whisper as jmodel

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=50, n_audio_state=64, n_audio_head=2,
        n_audio_layer=2, n_vocab=51865, n_text_ctx=48, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    params = jmodel.init_params(jax.random.PRNGKey(1), dims)
    m = WhisperModel(params, dims, name="int8-test")
    mel = jnp.asarray(
        np.random.default_rng(11).standard_normal((2, 80, 100)), jnp.float32
    )
    kw = dict(language="en", without_timestamps=True, sample_len=8, fp16=False)
    fp = decode(m, mel, DecodingOptions(**kw))
    q8 = decode(m, mel, DecodingOptions(kv_int8=True, **kw))
    for a, b in zip(fp, q8):
        assert abs(a.avg_logprob - b.avg_logprob) < 0.15

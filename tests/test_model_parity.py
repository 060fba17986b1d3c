"""Numerics parity of the JAX Whisper vs the reference PyTorch model.

Strategy: build a small random reference model in torch, save it in the
official checkpoint format, convert to our pytree, and compare encoder /
decoder / full-forward outputs and the incremental kv-cache path.
"""

import numpy as np
import pytest

from qasr_ijcnlp_tpu.models import ModelDimensions, whisper as jmodel
from qasr_ijcnlp_tpu.models.convert import (
    from_torch_state_dict,
    to_torch_state_dict,
)

SMALL = ModelDimensions(
    n_mels=80,
    n_audio_ctx=50,
    n_audio_state=64,
    n_audio_head=4,
    n_audio_layer=2,
    n_vocab=200,
    n_text_ctx=24,
    n_text_state=64,
    n_text_head=4,
    n_text_layer=2,
)


@pytest.fixture(scope="module")
def torch_model():
    from . import oracle

    oracle.reference_whisper()
    import torch
    from whisper.model import ModelDimensions as RefDims
    from whisper.model import Whisper as RefWhisper

    torch.manual_seed(0)
    model = RefWhisper(RefDims(**SMALL.to_dict())).eval()
    with torch.no_grad():
        # The reference leaves decoder.positional_embedding as torch.empty
        # (model.py:214) - uninitialized memory, occasionally NaN. Make the
        # oracle deterministic and finite.
        model.decoder.positional_embedding.normal_(0, 0.02)
    return model


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return from_torch_state_dict(torch_model.state_dict(), SMALL)


def _rand_mel(batch=2, seed=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((batch, SMALL.n_mels, SMALL.n_audio_ctx * 2)).astype(
        np.float32
    )


def test_encoder_parity(torch_model, jax_params):
    import torch

    mel = _rand_mel()
    with torch.no_grad():
        ref = torch_model.encoder(torch.from_numpy(mel)).numpy()
    ours = np.asarray(
        jmodel.encoder_apply(jax_params["encoder"], mel, SMALL)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_decoder_teacher_forced_parity(torch_model, jax_params):
    import torch

    mel = _rand_mel()
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, SMALL.n_vocab, (2, 8))
    with torch.no_grad():
        xa = torch_model.encoder(torch.from_numpy(mel))
        ref = torch_model.decoder(torch.from_numpy(tokens), xa).numpy()
    xa_j = jmodel.encoder_apply(jax_params["encoder"], mel, SMALL)
    ours = np.asarray(
        jmodel.decoder_apply(jax_params["decoder"], tokens, xa_j, SMALL)
    )
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_full_forward_parity(torch_model, jax_params):
    import torch

    mel = _rand_mel(seed=3)
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, SMALL.n_vocab, (2, 5))
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(mel), torch.from_numpy(tokens)).numpy()
    ours = np.asarray(jmodel.forward(jax_params, mel, tokens, SMALL))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_incremental_decode_matches_teacher_forced(jax_params):
    """The kv-cached step path must reproduce the full-context logits."""
    import jax.numpy as jnp

    mel = _rand_mel(seed=5)
    rng = np.random.default_rng(6)
    T = 7
    tokens = jnp.asarray(rng.integers(0, SMALL.n_vocab, (2, T)))
    xa = jmodel.encoder_apply(jax_params["encoder"], mel, SMALL)
    full = jmodel.decoder_apply(jax_params["decoder"], tokens, xa, SMALL)

    cache = jmodel.init_kv_cache(SMALL, batch=2)
    cache = jmodel.precompute_cross_kv(jax_params["decoder"], xa, cache)
    # Prompt pass (first 3 tokens), then token-by-token.
    logits0, cache = jmodel.decoder_step(
        jax_params["decoder"], tokens[:, :3], cache, SMALL
    )
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(full[:, :3]), atol=2e-4, rtol=1e-3
    )
    for t in range(3, T):
        step_logits, cache = jmodel.decoder_step(
            jax_params["decoder"], tokens[:, t : t + 1], cache, SMALL
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full[:, t]),
            atol=2e-4,
            rtol=1e-3,
        )


def test_state_dict_round_trip(torch_model, jax_params):
    sd = to_torch_state_dict(jax_params, SMALL)
    ref_sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    for key, val in sd.items():
        assert key in ref_sd, key
        np.testing.assert_allclose(val, ref_sd[key], atol=1e-6)
    # Every reference param (not buffer) must be covered.
    param_keys = {name for name, _ in torch_model.named_parameters()}
    missing = param_keys - set(sd)
    assert not missing, missing


def test_init_params_shapes(jax_params):
    import jax

    init = jmodel.init_params(jax.random.PRNGKey(0), SMALL)
    ref_shapes = jax.tree.map(lambda x: x.shape, jax_params)
    init_shapes = jax.tree.map(lambda x: x.shape, init)
    assert ref_shapes == init_shapes


def test_bf16_forward_close_to_fp32(jax_params):
    import jax.numpy as jnp

    mel = _rand_mel(seed=7)
    rng = np.random.default_rng(8)
    tokens = rng.integers(0, SMALL.n_vocab, (2, 4))
    f32 = jmodel.forward(jax_params, mel, tokens, SMALL)
    bf16 = jmodel.forward(jax_params, mel, tokens, SMALL, jnp.bfloat16)
    # Logit-scale agreement; argmax should rarely differ on random nets.
    assert np.abs(np.asarray(f32) - np.asarray(bf16)).mean() < 0.2


def test_attention_xla_path_masks_padded_keys():
    """attention(t_real=T) on tile-padded q/k/v must ignore the padding key
    rows on the XLA fallback path too (it used to mask only inside the
    Pallas kernels, silently attending garbage keys when kernels were
    off)."""
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.models import whisper as m

    rng = np.random.default_rng(21)
    B, T, Tp, D, H = 2, 20, 32, 16, 2
    q = rng.standard_normal((B, T, D)).astype(np.float32)
    k = rng.standard_normal((B, T, D)).astype(np.float32)
    v = rng.standard_normal((B, T, D)).astype(np.float32)
    qp = np.zeros((B, Tp, D), np.float32); qp[:, :T] = q
    kp = np.zeros((B, Tp, D), np.float32); kp[:, :T] = k
    vp = np.zeros((B, Tp, D), np.float32); vp[:, :T] = v

    base = np.asarray(m.attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), H
    ))
    padded = np.asarray(m.attention(
        jnp.asarray(qp), jnp.asarray(kp), jnp.asarray(vp), H, t_real=T
    ))[:, :T]
    np.testing.assert_allclose(padded, base, atol=1e-6, rtol=1e-6)

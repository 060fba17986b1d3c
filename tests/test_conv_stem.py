"""Fused conv stem (ops/conv_stem.py) vs the XLA conv formulation.

Interpreter mode on CPU; the XLA oracle `_xla_stem` replicates the
production `encoder_apply` stem (conv -> gelu -> conv(s2) -> gelu -> +pos
-> pad) bit-for-bit in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr_ijcnlp_tpu.models import whisper as model
from qasr_ijcnlp_tpu.models.dims import tiny_dims
from qasr_ijcnlp_tpu.ops.conv_stem import (
    _xla_stem,
    fused_conv_stem,
    stem_applicable,
)


@pytest.fixture(scope="module")
def stem_params():
    params = model.init_params(jax.random.PRNGKey(0), tiny_dims())
    return {k: params["encoder"][k] for k in ("conv1", "conv2", "pos")}


def test_applicability():
    assert stem_applicable(80, 3000, 1500, 1536)
    assert not stem_applicable(80, 3000, 1400, 1536)  # wrong stride ratio
    assert stem_applicable(80, 3000, 1500, 1536, 768)   # chunked variant
    assert stem_applicable(128, 3000, 1500, 1536, 1024)
    assert not stem_applicable(128, 3000, 1500, 1536, 1280)  # VMEM gate
    assert not stem_applicable(80, 3000, 1500, 1000, 768)  # chunk-misaligned


def _wide_stem_params(d_model, n_mels=80, seed=4):
    import math

    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)

    def conv_init(kk, out_c, in_c, width):
        bound = 1.0 / math.sqrt(in_c * width)
        k1, k2 = jax.random.split(kk)
        return {
            "w": jax.random.uniform(
                k1, (out_c, in_c, width), jnp.float32, -bound, bound
            ),
            "b": jax.random.uniform(k2, (out_c,), jnp.float32, -bound, bound),
        }

    return {
        "conv1": conv_init(ks[0], d_model, n_mels, 3),
        "conv2": conv_init(ks[1], d_model, d_model, 3),
        "pos": jax.random.normal(ks[2], (1500, d_model)) * 0.02,
    }


@pytest.mark.parametrize("d_model", [768, 1024])
def test_stem_chunked_matches_xla(d_model):
    """D > 512 routes to the time-chunked kernel (VERDICT r2 item 4): the
    overlapping-slab taps must reproduce the conv boundary semantics
    exactly, including the zero left-padding row of conv2."""
    params = _wide_stem_params(d_model)
    mel = jax.random.normal(jax.random.PRNGKey(11), (1, 80, 3000),
                            jnp.float32)
    y_k = fused_conv_stem(params, mel, 1536, "float32")
    y_x = _xla_stem(params, mel, 1536, "float32")
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(y_x), atol=3e-5
    )
    assert float(jnp.abs(y_k[:, 1500:]).max()) == 0.0


def test_stem_matches_xla_f32(stem_params):
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 3000), jnp.float32)
    y_k = fused_conv_stem(stem_params, mel, 1536, "float32")
    y_x = _xla_stem(stem_params, mel, 1536, "float32")
    assert y_k.shape == (2, 1536, 384)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_x), atol=1e-5)


def test_stem_padding_rows_zero(stem_params):
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 3000), jnp.float32)
    y = fused_conv_stem(stem_params, mel, 1536, "float32")
    assert float(jnp.max(jnp.abs(y[:, 1500:]))) == 0.0


def test_stem_gradient(stem_params):
    mel = jax.random.normal(jax.random.PRNGKey(3), (1, 80, 3000), jnp.float32)

    def loss_k(p):
        return jnp.sum(fused_conv_stem(p, mel, 1536, "float32") ** 2)

    def loss_x(p):
        return jnp.sum(_xla_stem(p, mel, 1536, "float32") ** 2)

    g_k = jax.grad(loss_k)(stem_params)
    g_x = jax.grad(loss_x)(stem_params)
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-4
        )


def test_encoder_apply_with_stem_matches_plain():
    """Whole tiny encoder with the fused stem + blocks vs the XLA path."""
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    mel = jax.random.normal(jax.random.PRNGKey(5), (1, 80, 3000), jnp.float32)
    model.set_flash_attention(True)
    try:
        y_fused = model.encoder_apply(params["encoder"], mel, dims)
        model.set_flash_attention(False)
        y_plain = model.encoder_apply(params["encoder"], mel, dims)
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_plain), atol=5e-5
        )
    finally:
        model.set_flash_attention(None)

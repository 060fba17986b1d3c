"""Fused encoder block kernels (ops/encoder_block.py) vs the XLA oracle.

Runs in Pallas interpreter mode on CPU (the kernels compile for real only on
a TPU backend).  The oracle `_xla_block` is itself pinned against the
model's unfused block path, so kernel == oracle == production numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr_ijcnlp_tpu.models import whisper as model
from qasr_ijcnlp_tpu.models.dims import tiny_dims
from qasr_ijcnlp_tpu.ops.encoder_block import (
    _xla_block,
    fused_block_applicable,
    fused_encoder_block,
)


@pytest.fixture(scope="module")
def block_params():
    return model._init_block(jax.random.PRNGKey(0), 384, cross_attention=False)


def test_applicability():
    assert fused_block_applicable(6, 384, 1536)       # tiny
    assert fused_block_applicable(8, 512, 1536)       # base
    assert fused_block_applicable(12, 768, 1536)      # small (F-tiled finish)
    assert fused_block_applicable(16, 1024, 1536)     # medium (chunked LN)
    assert fused_block_applicable(20, 1280, 1536)     # large (128/512 tiles)
    assert not fused_block_applicable(6, 384, 1000)    # non-tile-aligned


def test_fused_block_large_geometry_ftiled():
    """D=1280 (large) exercises the narrow 128-row/512-col finish tiling
    that keeps large's block set under VMEM (VERDICT r2 item 4)."""
    bp = model._init_block(jax.random.PRNGKey(9), 1280, cross_attention=False)
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 512, 1280), jnp.float32)
    y_k = fused_encoder_block(x, bp, 20, 500)
    y_x = _xla_block(x, bp, 20, 500)
    np.testing.assert_allclose(
        np.asarray(y_k[:, :500]), np.asarray(y_x[:, :500]), atol=3e-5
    )


def test_fused_block_matches_xla_f32(block_params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 384), jnp.float32)
    y_k = fused_encoder_block(x, block_params, 6, 500)
    y_x = _xla_block(x, block_params, 6, 500)
    np.testing.assert_allclose(
        np.asarray(y_k[:, :500]), np.asarray(y_x[:, :500]), atol=2e-5
    )


def test_fused_block_matches_xla_bf16(block_params):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 512, 384), jnp.bfloat16)
    y_k = fused_encoder_block(x, block_params, 6, 500).astype(jnp.float32)
    y_x = _xla_block(x, block_params, 6, 500).astype(jnp.float32)
    # bf16 rounding-order differences only
    np.testing.assert_allclose(
        np.asarray(y_k[:, :500]), np.asarray(y_x[:, :500]), atol=0.08
    )


def test_fused_block_no_mask_path(block_params):
    # t_real == Tp exercises the mask-free branch
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 512, 384), jnp.float32)
    y_k = fused_encoder_block(x, block_params, 6, 512)
    y_x = _xla_block(x, block_params, 6, 512)
    np.testing.assert_allclose(
        np.asarray(y_k), np.asarray(y_x), atol=2e-5
    )


def test_fused_block_small_geometry_ftiled():
    """D=768 exercises the F-tiled finish kernel (streamed MLP weights)."""
    bp = model._init_block(jax.random.PRNGKey(7), 768, cross_attention=False)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 512, 768), jnp.float32)
    y_k = fused_encoder_block(x, bp, 12, 500)
    y_x = _xla_block(x, bp, 12, 500)
    np.testing.assert_allclose(
        np.asarray(y_k[:, :500]), np.asarray(y_x[:, :500]), atol=2e-5
    )


def test_trunk_short_input_falls_back():
    """A trunk input shorter than n_audio_ctx (possible via the shared
    quantum-encoder path) must NOT take the fused-block path when its own
    padded length doesn't tile — the gate is evaluated at the runtime
    length (regression: the finish kernel grid would silently skip rows)."""
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 1100, 384), jnp.float32)
    model.set_flash_attention(True)
    try:
        y = model.transformer_trunk(params["encoder"], x, dims)
        model.set_flash_attention(False)
        y_plain = model.transformer_trunk(params["encoder"], x, dims)
        assert y.shape == (1, 1100, 384)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_plain), atol=5e-5
        )
    finally:
        model.set_flash_attention(None)


def test_fused_block_gradient(block_params):
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 512, 384), jnp.float32)

    def loss_k(x):
        return jnp.sum(fused_encoder_block(x, block_params, 6, 500)[:, :500] ** 2)

    def loss_x(x):
        return jnp.sum(_xla_block(x, block_params, 6, 500)[:, :500] ** 2)

    g_k = jax.grad(loss_k)(x)
    g_x = jax.grad(loss_x)(x)
    np.testing.assert_allclose(
        np.asarray(g_k), np.asarray(g_x), atol=1e-4, rtol=1e-4
    )


def test_encoder_apply_fused_matches_unfused():
    """Whole tiny encoder: fused-block path vs the plain XLA path."""
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    mel = jax.random.normal(jax.random.PRNGKey(5), (1, 80, 3000), jnp.float32)
    model.set_flash_attention(True)   # forces the fused/pallas path on
    try:
        y_fused = model.encoder_apply(params["encoder"], mel, dims)
        model.set_flash_attention(False)
        y_plain = model.encoder_apply(params["encoder"], mel, dims)
        assert y_fused.shape == y_plain.shape == (1, 1500, 384)
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_plain), atol=5e-5
        )
    finally:
        model.set_flash_attention(None)

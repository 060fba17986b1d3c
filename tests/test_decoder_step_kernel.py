"""Fused decoder-step kernel (ops/decoder_step.py) parity vs the unfused step.

The kernel ships DEFAULT-OFF (the round-4 on-chip A/B measured it ~2x slower
than the unfused XLA step at the headline protocol — see docs/BENCHMARKS.md
"Fused decoder-step excursion"), but it remains an opt-in research path, so
its numerics are pinned here.  On CPU the kernel runs in Pallas interpret
mode automatically (fused_decoder_layer_step passes
``interpret = backend != "tpu"``), so this file exercises the real kernel
logic in the default suite; run with ``QASR_TEST_PLATFORM=tpu`` for the
on-chip Mosaic-compiled variant of every test.

Documented parity contract (the kernel is NOT bit-identical to the unfused
step — its online-softmax chunking reorders the fp reductions):

* float32: max |logit delta| <= 5e-4 per step.
* bfloat16: max |logit delta| <= 3e-2 per step (measured max ~1.6e-2 on-chip
  at B=512 random-init, round 4).
* argmax stability: the fused and unfused argmax must agree on every row
  whose top-2 logit gap exceeds 2x the dtype tolerance; rows inside the gap
  are genuine fp ties and may flip.

Reference anchor: the serial per-token decode these paths replace,
/root/reference/whisper/whisper/decoding.py:680-710.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qasr_ijcnlp_tpu.models import ModelDimensions
from qasr_ijcnlp_tpu.models import whisper as model
from qasr_ijcnlp_tpu.ops.decoder_step import (
    fused_cache_applicable,
    fused_decoder_step,
    fused_step_applicable,
    fused_step_enabled,
    set_fused_decoder_step,
    to_fused_cache,
)

# Smallest geometry the kernel supports: d_model in (384, 512) with
# 64-wide heads (fused_step_applicable), batch a multiple of BT=8.
DIMS = ModelDimensions(
    n_mels=80,
    n_audio_ctx=64,
    n_audio_state=384,
    n_audio_head=6,
    n_audio_layer=1,
    n_vocab=256,
    n_text_ctx=64,
    n_text_state=384,
    n_text_head=6,
    n_text_layer=2,
)
B = 8
PROMPT = 3


@pytest.fixture(scope="module")
def params():
    return model.init_params(jax.random.PRNGKey(0), DIMS)


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    set_fused_decoder_step(None)


def _prompted_cache(params, dtype):
    """Unfused cache after a PROMPT-token prompt pass (decode/loop.py
    ``_prompt_pass`` shape: cross-KV precomputed once, prompt committed)."""
    rng = np.random.default_rng(5)
    feats = jnp.asarray(
        rng.standard_normal((B, DIMS.n_audio_ctx, DIMS.n_text_state)) * 0.1,
        dtype,
    )
    cache = model.init_kv_cache(DIMS, B, dtype)
    cache = model.precompute_cross_kv(
        params["decoder"], feats, cache, n_head=DIMS.n_text_head
    )
    prompt = jnp.asarray(
        rng.integers(0, DIMS.n_vocab, (B, PROMPT)), jnp.int32
    )
    _, cache = model.decoder_step(
        params["decoder"], prompt, cache, DIMS, dtype
    )
    return cache


def _run_steps(params, dtype, tokens_per_step):
    """Drive the SAME fixed token sequence through both step functions and
    return (unfused_logits, fused_logits), each a list of (B, V) arrays."""
    cache_u = _prompted_cache(params, dtype)
    cache_f = to_fused_cache(cache_u, DIMS)
    assert fused_cache_applicable(cache_u, DIMS, B)
    unfused, fused = [], []
    for tok in tokens_per_step:
        lu, cache_u = model.decoder_step(
            params["decoder"], tok, cache_u, DIMS, dtype
        )
        lf, cache_f = fused_decoder_step(
            params["decoder"], tok, cache_f, DIMS, dtype
        )
        unfused.append(np.asarray(lu[:, 0], np.float32))
        fused.append(np.asarray(lf[:, 0], np.float32))
    return unfused, fused


def _fixed_tokens(n_steps, seed=9):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.integers(0, DIMS.n_vocab, (B, 1)), jnp.int32)
        for _ in range(n_steps)
    ]


def _assert_parity(unfused, fused, atol):
    for step, (lu, lf) in enumerate(zip(unfused, fused)):
        delta = np.max(np.abs(lu - lf))
        assert delta <= atol, f"step {step}: max |logit delta| {delta} > {atol}"
        # argmax-stability bound: agree wherever the top-2 gap clears 2*atol
        top2 = np.sort(lu, axis=-1)[:, -2:]
        gap = top2[:, 1] - top2[:, 0]
        au, af = lu.argmax(-1), lf.argmax(-1)
        unstable = (au != af) & (gap > 2 * atol)
        assert not unstable.any(), (
            f"step {step}: argmax flipped on separated rows "
            f"{np.nonzero(unstable)[0].tolist()} (gap {gap[unstable]})"
        )


def test_fused_step_logits_parity_f32(params):
    unfused, fused = _run_steps(params, jnp.float32, _fixed_tokens(5))
    _assert_parity(unfused, fused, atol=5e-4)


def test_fused_step_logits_parity_bf16(params):
    unfused, fused = _run_steps(params, jnp.bfloat16, _fixed_tokens(5))
    _assert_parity(unfused, fused, atol=3e-2)


def test_greedy_loop_fused_wiring(params):
    """End-to-end greedy_decode with the kernel opted in: exercises the
    loop's use_fused gate + to_fused_cache conversion + the fused cache
    threading through lax.while_loop; tokens must match the unfused loop
    exactly at f32 (random-init logit gaps are orders of magnitude above
    the f32 parity tolerance)."""
    from qasr_ijcnlp_tpu.decode.filters import FilterConfig
    from qasr_ijcnlp_tpu.decode.loop import LoopConfig, greedy_decode

    eot = DIMS.n_vocab - 1
    suppress = np.zeros(DIMS.n_vocab, np.uint8)
    suppress[eot] = 1  # keep every row alive for the full sample_len
    filters = FilterConfig(
        n_vocab=DIMS.n_vocab,
        sample_begin=PROMPT,
        eot=eot,
        timestamp_begin=DIMS.n_vocab,
        no_timestamps=None,
        suppress_blank=False,
        suppress_mask=bytes(suppress),
        blank_mask=None,
        apply_timestamp_rules=False,
        max_initial_timestamp_index=None,
    )
    cfg = LoopConfig(
        dims=DIMS,
        filters=filters,
        sample_begin=PROMPT,
        sot_index=0,
        sample_len=6,
        eot=eot,
        timestamp_begin=DIMS.n_vocab,
        no_speech=None,
        compute_dtype="float32",
    )
    rng = np.random.default_rng(5)
    feats = jnp.asarray(
        rng.standard_normal((B, DIMS.n_audio_ctx, DIMS.n_text_state)) * 0.1,
        jnp.float32,
    )
    initial = jnp.asarray(
        rng.integers(0, DIMS.n_vocab, (B, PROMPT)), jnp.int32
    )
    key = jax.random.PRNGKey(0)

    set_fused_decoder_step(False)
    buf_u, len_u, lp_u, *_ = greedy_decode(params, cfg, feats, initial, key)
    set_fused_decoder_step(True)
    buf_f, len_f, lp_f, *_ = greedy_decode(params, cfg, feats, initial, key)

    np.testing.assert_array_equal(np.asarray(buf_u), np.asarray(buf_f))
    assert int(len_u) == int(len_f)
    np.testing.assert_allclose(
        np.asarray(lp_u), np.asarray(lp_f), atol=1e-3
    )


def test_default_off():
    """Round-5 contract: the kernel is opt-in (it loses the headline A/B);
    the default-path decode must never route through it."""
    assert fused_step_enabled() is False
    set_fused_decoder_step(True)
    assert fused_step_enabled() is True
    set_fused_decoder_step(None)
    assert fused_step_enabled() is False


def test_applicability_gates():
    assert fused_step_applicable(6, 384, 8)
    assert fused_step_applicable(8, 512, 64)
    assert not fused_step_applicable(6, 384, 12)   # batch % BT != 0
    assert not fused_step_applicable(4, 256, 8)    # small/odd width
    assert not fused_step_applicable(12, 768, 8)   # weights exceed VMEM plan
    assert not fused_step_applicable(6, 384, 8, groups=2)  # beam pools

    cache = model.init_kv_cache(DIMS, B, jnp.float32, cross_batch=B // 2)
    assert not fused_cache_applicable(cache, DIMS, B)  # grouped cross cache
    cache8 = model.init_kv_cache(DIMS, B, jnp.float32, cross_int8=True)
    assert not fused_cache_applicable(cache8, DIMS, B)  # int8 cross cache

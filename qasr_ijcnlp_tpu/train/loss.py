"""Training losses: teacher-forced cross-entropy with ignore-index masking.

The reference computes shifted CE with ``ignore_index`` (token path −100,
/root/reference/train_classical_whisper_asr.py:198-207; char path 0 =
``<PAD>``, /root/reference/train_quantum_whisper_asr.py:133-177).  Here the
ignore-index is a mask multiply — the XLA-friendly formulation — and the
shift is done by the caller so the loss itself is shape-agnostic.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def masked_cross_entropy(
    logits: jnp.ndarray,  # (B, T, V) float
    targets: jnp.ndarray,  # (B, T) int; positions == ignore_index are masked
    ignore_index: int = -100,
) -> jnp.ndarray:
    """Mean CE over non-ignored positions (scalar, fp32)."""
    mask = (targets != ignore_index).astype(jnp.float32)
    safe = jnp.where(targets == ignore_index, 0, targets)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe
    )
    total = jnp.sum(ce * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def masked_cross_entropy_sum(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    ignore_index: int = -100,
):
    """(sum CE over non-ignored positions, count) — the unreduced form that
    gradient accumulation needs: summing (sum, count) pairs across
    microbatches and dividing at the end reproduces the full-batch mean
    EXACTLY (averaging per-microbatch means would mis-weight microbatches
    with different valid-token counts)."""
    mask = (targets != ignore_index).astype(jnp.float32)
    safe = jnp.where(targets == ignore_index, 0, targets)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe
    )
    return jnp.sum(ce * mask), jnp.sum(mask)


def shifted_token_loss(logits, tokens, ignore_index=-100):
    """Next-token CE: logits[:, :-1] predict tokens[:, 1:] (the reference's
    teacher-forced shift, train_classical_whisper_asr.py:198-207)."""
    return masked_cross_entropy(logits[:, :-1], tokens[:, 1:], ignore_index)


def shifted_token_loss_sum(logits, tokens, ignore_index=-100):
    """(sum, count) form of :func:`shifted_token_loss`."""
    return masked_cross_entropy_sum(logits[:, :-1], tokens[:, 1:], ignore_index)

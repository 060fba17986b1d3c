"""Jitted autoregressive decode loops (greedy/sampling and beam search).

The reference's ``DecodingTask._main_loop`` (whisper/decoding.py:680-710) is a
Python loop over tokens with hook-based kv-caching and per-row Python logit
filters.  Here the whole loop is a single ``lax.while_loop`` under ``jit``:

* fixed-shape token buffers (B, n_text_ctx + 1); the write index is the only
  dynamic value, so XLA keeps the cache update in-place;
* the filter state (last/penultimate token, running max timestamp) is carried
  as scalars-per-row instead of re-scanning the history;
* beam search (reference BeamSearchDecoder, decoding.py:301-404) is
  re-expressed with fixed-shape sort/cumsum selection and a bounded finished
  set, exactly reproducing the reference's candidate-scan semantics including
  the early break after `beam_size` unfinished candidates.

Everything here is shape-static per (dims, options) signature; the host-side
wrapper in decode/__init__.py caches the compiled functions.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import whisper as model
from ..models.dims import ModelDimensions
from .filters import FilterConfig, apply_filters, _log_softmax


class LoopConfig(NamedTuple):
    dims: ModelDimensions
    filters: FilterConfig
    sample_begin: int  # == len(initial_tokens)
    sot_index: int
    sample_len: int
    eot: int
    timestamp_begin: int
    no_speech: Optional[int]
    compute_dtype: str = "float32"
    # bf16 logits + filters (the reference's own fp16 decode protocol,
    # decoding.py fp16 path): halves the per-step (B, V) logits HBM traffic.
    # Score accumulation still happens in fp32.  Measured neutral at B=512
    # on-chip (the logits passes hide under the cross-KV DMA critical path),
    # so it stays OFF to keep the TPU decode fp-exact vs the tested path;
    # the plumbing remains for bigger-vocab/batch experiments.
    logits_bf16: bool = False
    # Store the cross K/V int8-quantized (ops/decode_attn.py): halves the
    # decode loop's dominant HBM stream; opt-in, not fp-token-exact.
    kv_int8: bool = False
    # Device mesh (hashable, so part of the static jit key): routes the
    # encoder through the explicit tensor-parallel trunk when its model
    # axis is > 1.  None = single-device or plain GSPMD data parallelism.
    mesh: Optional[object] = None
    # Tokens decoded per while_loop iteration.  The loop-carried math is
    # identical for any value; unrolling amortizes the backend's fixed
    # per-iteration dispatch cost (measured ~3 ms/iteration through the TPU
    # tunnel vs sub-ms of actual compute).  Early-exit on all-finished is
    # checked every `unroll` tokens.
    unroll: int = 4


def _encode_audio(params, mel, cfg: LoopConfig):
    """Encoder forward inside the decode jit: fusing mel -> features -> token
    loop into ONE program saves a host round trip per decode call (the
    tunneled device link costs ~25 ms of dispatch latency per jitted call).
    The quantum-vs-classical variant is derived from the params tree by
    dispatch_encoder_apply."""
    return model.dispatch_encoder_apply(
        params["encoder"], mel, cfg.dims, jnp.dtype(cfg.compute_dtype),
        mesh=cfg.mesh,
    )


def _prompt_pass(params, cfg: LoopConfig, audio_features, initial_tokens,
                 ctx: Optional[int] = None):
    """Encoder features -> cross-kv + prompt logits + no-speech probs.

    ``audio_features`` has one row per AUDIO; ``initial_tokens`` one row per
    hypothesis (B_audio * groups, group-major).  The cross-KV is stored once
    per audio and shared across its group (models/whisper.py
    ``init_kv_cache``), so beam/best-of decode never replicates — or, each
    step, re-reads — G copies of the (L, Ta, D) cross cache.

    ``ctx`` overrides the self-cache length (the decode engine sizes its
    slot pool once for the whole pool's lifetime).
    """
    B = initial_tokens.shape[0]
    dtype = jnp.dtype(cfg.compute_dtype)
    # Bound the self cache to the reachable length (prompt + samples + the
    # unroll overshoot), rounded up to the bf16 sublane tile (16): every
    # decode step streams the whole buffer, so unreachable positions are
    # pure waste (64-token decodes: a 128-row cache wastes 60% of the
    # self-KV stream vs the 80 rows actually reachable).
    if ctx is None:
        reach = cfg.sample_begin + cfg.sample_len + cfg.unroll + 1
        ctx = min(cfg.dims.n_text_ctx, (reach + 15) // 16 * 16)
    cache = model.init_kv_cache(
        cfg.dims, B, dtype, cross_batch=audio_features.shape[0], ctx=ctx,
        cross_int8=cfg.kv_int8,
    )
    cache = model.precompute_cross_kv(
        params["decoder"], audio_features, cache, n_head=cfg.dims.n_text_head
    )
    logits_all, cache = model.decoder_step(
        params["decoder"], initial_tokens, cache, cfg.dims, dtype,
        logits_dtype=_logits_dtype(cfg),
    )
    if cfg.no_speech is not None:
        probs_at_sot = jax.nn.softmax(
            logits_all[:, cfg.sot_index].astype(jnp.float32), axis=-1
        )
        no_speech_probs = probs_at_sot[:, cfg.no_speech]
    else:
        no_speech_probs = jnp.full((B,), jnp.nan, jnp.float32)
    return cache, logits_all[:, -1], no_speech_probs


def _logits_dtype(cfg: LoopConfig):
    return jnp.bfloat16 if cfg.logits_bf16 else jnp.float32


def _filter_state(tokens_buf, cur_len, cfg: LoopConfig):
    """(last, prev, max_ts) per row, derived once at loop entry."""
    B = tokens_buf.shape[0]
    last = jnp.full((B,), -1, jnp.int32)
    prev = jnp.full((B,), -1, jnp.int32)
    max_ts = jnp.zeros((B,), jnp.int32)
    return last, prev, max_ts


def _update_ts_state(last, prev, max_ts, next_tok, ts_begin):
    prev = last
    last = next_tok
    is_ts = next_tok >= ts_begin
    max_ts = jnp.where(is_ts, jnp.maximum(max_ts, next_tok), max_ts)
    return last, prev, max_ts


# ---------------------------------------------------------------------------
# Greedy / temperature sampling
# ---------------------------------------------------------------------------


def greedy_decode(
    params,
    cfg: LoopConfig,
    audio_input: jnp.ndarray,
    initial_tokens: jnp.ndarray,
    rng: jnp.ndarray,
    temperature: float = 0.0,
    encode: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Un-jitted entry: derives the static argmax-vs-categorical program
    choice from the CONCRETE temperature and passes the value itself as a
    traced scalar, so the fallback ladder's re-decodes (0.2..1.0) all reuse
    ONE compiled sampling program (and t=0 one argmax program) — a direct
    caller can never silently pair a nonzero temperature with the argmax
    program."""
    t = float(temperature)
    from ..ops.decoder_step import fused_step_enabled

    return _greedy_decode_jit(
        params, cfg, audio_input, initial_tokens, rng, jnp.float32(t),
        sample=(t != 0.0), encode=encode,
        # Static jit-key member: the opt-in fused-step flag must retrace —
        # it is read at trace time, so leaving it out of the key would let a
        # post-compile set_fused_decoder_step() silently reuse the other
        # path's executable.
        fused=fused_step_enabled(),
    )


def greedy_cache_size() -> int:
    """Compiled greedy-loop program count (diagnostic/test hook; isolates
    jax's private jit-cache counter in one place).  -1 if the private API
    is unavailable in this jax version."""
    try:
        return _greedy_decode_jit._cache_size()
    except AttributeError:
        return -1


@partial(jax.jit, static_argnames=("cfg", "sample", "encode", "fused"))
def _greedy_decode_jit(
    params,
    cfg: LoopConfig,
    audio_input: jnp.ndarray,  # (B_audio, Ta, D) features, or mel if encode
    initial_tokens: jnp.ndarray,  # (B_audio * groups, sample_begin)
    rng: jnp.ndarray,
    temperature: jnp.ndarray = 0.0,  # traced: one compile serves the ladder
    sample: bool = False,  # static: argmax (False) vs categorical program
    encode: bool = False,
    fused: bool = False,  # static: opt-in fused decoder-step kernel
) -> Tuple[jnp.ndarray, ...]:
    """Returns (tokens_buf (B, n_ctx+1), final_len, sum_logprobs, no_speech,
    audio_features).  With ``encode=True``, ``audio_input`` is the (B, n_mels,
    3000) mel and the encoder runs inside this same program."""
    B = initial_tokens.shape[0]
    n_ctx = cfg.dims.n_text_ctx
    eot = cfg.eot

    audio_features = (
        _encode_audio(params, audio_input, cfg) if encode
        else audio_input
    )
    cache, logits, no_speech_probs = _prompt_pass(
        params, cfg, audio_features, initial_tokens
    )

    # Fused per-layer decoder-step kernel (ops/decoder_step.py): collapses
    # the ~50 XLA fusion boundaries of the unfused single-token step into
    # one pallas_call per layer.  OPT-IN (``fused`` static arg, derived from
    # set_fused_decoder_step by the unjitted entry): the on-chip A/B
    # (scripts/bench_fused_step.py) measures it slower than the unfused XLA
    # step, so it never enables itself.  Applicability is static (geometry);
    # the cache is converted to the kernel's T-on-lanes layout once, before
    # the loop.
    from ..ops.decoder_step import (
        fused_cache_applicable, fused_decoder_step, to_fused_cache,
    )

    use_fused = (
        fused
        and cfg.mesh is None
        and fused_cache_applicable(cache, cfg.dims, B)
    )
    if use_fused:
        cache = to_fused_cache(cache, cfg.dims)
    step_fn = fused_decoder_step if use_fused else model.decoder_step

    buf = jnp.full((B, n_ctx + 1), eot, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, initial_tokens.astype(jnp.int32), (0, 0))
    cur_len = jnp.asarray(cfg.sample_begin, jnp.int32)
    sum_logprobs = jnp.zeros((B,), jnp.float32)
    finished = jnp.zeros((B,), bool)
    last, prev, max_ts = _filter_state(buf, cur_len, cfg)

    def cond(state):
        i, _, cur_len = state[0], state[1], state[2]
        finished = state[5]
        return (
            (i < cfg.sample_len)
            & ~jnp.all(finished)
            & (cur_len <= cfg.dims.n_text_ctx)
        )

    def body(state):
        (i, buf, cur_len, cache, sum_logprobs, finished, logits, last, prev,
         max_ts, rng) = state
        for j in range(cfg.unroll):
            # Sub-steps past sample_len or the context limit (only possible
            # inside an unrolled iteration) commit nothing: rows act as
            # finished.  This mirrors the exact exit predicate in `cond`.
            active = ((i + j) < cfg.sample_len) & (
                cur_len <= cfg.dims.n_text_ctx
            )
            filtered = apply_filters(
                cfg.filters, logits, cur_len, last, prev, max_ts
            )
            # Only the argmax-vs-categorical choice changes program
            # structure; the temperature VALUE is a traced scalar so the
            # fallback ladder (0.2..1.0) reuses ONE compiled program instead
            # of recompiling the whole encoder+loop per temperature.
            if not sample:
                next_tok = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
            else:
                rng, key = jax.random.split(rng)
                next_tok = jax.random.categorical(
                    key, filtered / temperature
                ).astype(jnp.int32)
            # Only the chosen token's logprob is needed: gather + scalar lse
            # instead of materializing the full (B, V) log-softmax (saves a
            # 212 MB/step HBM round trip at B=512).  lse math in fp32 even
            # when the logits buffer is bf16.
            m32 = jnp.max(filtered, axis=-1).astype(jnp.float32)
            z = filtered.astype(jnp.float32) - m32[:, None]
            lse = m32 + jnp.log(jnp.sum(jnp.exp(z), axis=-1))
            chosen = jnp.take_along_axis(
                filtered, next_tok[:, None], axis=-1
            )[:, 0]
            cur_lp = chosen.astype(jnp.float32) - lse
            commit = (~finished) & active
            sum_logprobs = sum_logprobs + cur_lp * commit
            next_tok = jnp.where(commit, next_tok, eot)
            buf = jax.vmap(lambda row, t: row.at[cur_len].set(t))(buf, next_tok)
            finished = finished | (next_tok == eot)
            last, prev, max_ts = _update_ts_state(
                last, prev, max_ts, next_tok, cfg.timestamp_begin
            )
            step_logits, cache = step_fn(
                params["decoder"], next_tok[:, None], cache, cfg.dims,
                jnp.dtype(cfg.compute_dtype),
                logits_dtype=_logits_dtype(cfg),
            )
            logits = step_logits[:, 0]
            cur_len = cur_len + 1
        return (i + cfg.unroll, buf, cur_len, cache, sum_logprobs, finished,
                logits, last, prev, max_ts, rng)

    state = (jnp.asarray(0, jnp.int32), buf, cur_len, cache, sum_logprobs,
             finished, logits, last, prev, max_ts, rng)
    state = jax.lax.while_loop(cond, body, state)
    _, buf, cur_len, _, sum_logprobs, _, _, _, _, _, _ = state
    # Return only the reachable token columns: everything past them is eot
    # fill, and the host fetches these buffers over a (possibly remote)
    # device link every decode call.
    reach = min(cfg.sample_begin + cfg.sample_len + 1, n_ctx + 1)
    return buf[:, :reach], cur_len, sum_logprobs, no_speech_probs, audio_features


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------


def _beam_transition(cfg, K: int, C: int, logits, buf, cur_rows,
                     sum_logprobs, fin_toks, fin_scores, fin_count,
                     last, prev, max_ts):
    """One beam-search selection step over B groups of K hypothesis rows.

    Shared by the batch beam loop (``beam_decode``, all groups in lockstep)
    and the continuous-batching engine (``decode/engine.py``, each group at
    its own position).  ``logits`` (B*K, V) are the decoder outputs for the
    tokens at ``cur_rows - 1``; ``cur_rows`` (B*K,) int32 is each row's
    write position, constant within a group.  Returns the updated
    (buf, sum_logprobs, fin_toks, fin_scores, fin_count, last, prev,
    max_ts) plus ``flat_src`` — the parent-row gather the caller must apply
    to its self-attention cache — and ``new_tok``, the (B*K,) tokens just
    written.  Reference: BeamSearchDecoder.update, decoding.py:323-380.
    """
    BK = logits.shape[0]
    B = BK // K
    eot = cfg.eot
    W = buf.shape[1]

    filtered = apply_filters(cfg.filters, logits, cur_rows, last, prev, max_ts)
    logprobs = _log_softmax(filtered)  # (BK, V)
    cand = sum_logprobs[:, None] + logprobs  # (BK, V)
    top_lp, top_id = jax.lax.top_k(cand, K + 1)  # (BK, K+1)
    top_lp = top_lp.reshape(B, K * (K + 1))
    top_id = top_id.reshape(B, K * (K + 1))
    parent = jnp.tile(
        jnp.repeat(jnp.arange(K), K + 1)[None, :], (B, 1)
    )  # (B, K(K+1)) source beam of each candidate

    order = jnp.argsort(-top_lp, axis=-1)
    s_lp = jnp.take_along_axis(top_lp, order, axis=-1)
    s_id = jnp.take_along_axis(top_id, order, axis=-1)
    s_parent = jnp.take_along_axis(parent, order, axis=-1)
    s_eot = s_id == eot

    # Reference scan semantics (decoding.py:348-360): walk candidates in
    # score order; eot -> finished set, others -> next beams; stop once
    # beam_size non-eot are saved.
    noneot_excl = jnp.cumsum(~s_eot, axis=-1) - (~s_eot).astype(jnp.int32)
    processed = noneot_excl < K

    # --- select the K continuing beams ---
    live = ~s_eot & processed
    slot = jnp.where(live, noneot_excl, K)  # target beam slot, K = drop

    # scatter candidates into slots 0..K-1
    def scatter_rows(slot_row, val_row, fill):
        out = jnp.full((K + 1,), fill, val_row.dtype)
        out = out.at[slot_row].set(val_row)  # dropped ones hit slot K
        return out[:K]

    new_lp = jax.vmap(scatter_rows, (0, 0, None))(slot, s_lp, -jnp.inf)
    new_id = jax.vmap(scatter_rows, (0, 0, None))(slot, s_id, eot)
    new_parent = jax.vmap(scatter_rows, (0, 0, None))(slot, s_parent, 0)

    # --- gather parent state into the new beam order ---
    pre_buf = buf  # pre-gather buffers (finished-candidate prefixes below)
    flat_src = (jnp.arange(B)[:, None] * K + new_parent).reshape(-1)  # (BK,)
    buf = buf[flat_src]
    new_tok = new_id.reshape(-1).astype(jnp.int32)
    # cur_rows is group-constant, so it is invariant under the parent gather
    buf = jax.vmap(lambda row, i, t: row.at[i].set(t))(buf, cur_rows, new_tok)
    last = last[flat_src]
    prev = prev[flat_src]
    max_ts = max_ts[flat_src]
    last, prev, max_ts = _update_ts_state(
        last, prev, max_ts, new_tok, cfg.timestamp_begin
    )
    sum_logprobs = new_lp.reshape(-1)

    # --- append eligible finished candidates (bounded by C) ---
    # Vectorized bounded-set append (replaces a serial scan over the
    # K(K+1) candidates): eligible destinations are unique per audio
    # (eot_rank is a running count), so one scatter commits them all;
    # ineligible candidates route to an overflow slot C that is dropped.
    elig = s_eot & processed
    eot_rank = jnp.cumsum(elig, axis=-1) - elig.astype(jnp.int32)
    dest = fin_count[:, None] + eot_rank  # (B, K(K+1))
    can_add = elig & (dest < C)
    dest_c = jnp.where(can_add, dest, C)

    parent_bufs = pre_buf.reshape(B, K, W)
    cand_bufs = jnp.take_along_axis(
        parent_bufs, s_parent[:, :, None], axis=1
    )  # (B, K(K+1), W): each candidate's parent prefix
    cur_g = cur_rows.reshape(B, K)[:, 0]  # (B,) per-group position
    cand_bufs = jax.vmap(lambda cb, i: cb.at[:, i].set(eot))(cand_bufs, cur_g)
    ft_ext = jnp.concatenate(
        [fin_toks, jnp.zeros((B, 1, W), fin_toks.dtype)], axis=1
    )
    fs_ext = jnp.concatenate(
        [fin_scores, jnp.zeros((B, 1), fin_scores.dtype)], axis=1
    )
    fin_toks = jax.vmap(lambda ft, d, v: ft.at[d].set(v))(
        ft_ext, dest_c, cand_bufs
    )[:, :C]
    fin_scores = jax.vmap(lambda fs, d, v: fs.at[d].set(v))(
        fs_ext, dest_c, s_lp
    )[:, :C]
    fin_count = jnp.minimum(fin_count + jnp.sum(elig, axis=-1), C)

    return (buf, sum_logprobs, fin_toks, fin_scores, fin_count,
            last, prev, max_ts, flat_src, new_tok)


@partial(jax.jit, static_argnames=("cfg", "beam_size", "max_candidates",
                                   "encode"))
def beam_decode(
    params,
    cfg: LoopConfig,
    audio_input: jnp.ndarray,  # (B, Ta, D) features (or mel if encode)
    initial_tokens: jnp.ndarray,  # (B*K, sample_begin)
    beam_size: int,
    max_candidates: int,
    encode: bool = False,
):
    """Fixed-shape beam search with a bounded finished set.

    Returns (beams (B, K, n_ctx+1), beam_scores (B, K),
             finished_tokens (B, C, n_ctx+1), finished_scores (B, C),
             finished_count (B,), no_speech_probs (B,), audio_features).
    """
    K, C = beam_size, max_candidates
    BK = initial_tokens.shape[0]
    B = BK // K
    n_ctx = cfg.dims.n_text_ctx
    eot = cfg.eot

    audio_features = (
        _encode_audio(params, audio_input, cfg) if encode
        else audio_input
    )
    cache, logits, no_speech_all = _prompt_pass(
        params, cfg, audio_features, initial_tokens
    )
    no_speech_probs = no_speech_all[::K]

    buf = jnp.full((BK, n_ctx + 1), eot, jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, initial_tokens.astype(jnp.int32), (0, 0))
    cur_len = jnp.asarray(cfg.sample_begin, jnp.int32)
    # Only beam 0 of each audio starts live; duplicates would dominate topk.
    sum_logprobs = jnp.tile(
        jnp.where(jnp.arange(K) == 0, 0.0, -jnp.inf)[None, :], (B, 1)
    ).reshape(BK)
    fin_toks = jnp.full((B, C, n_ctx + 1), eot, jnp.int32)
    fin_scores = jnp.full((B, C), -jnp.inf, jnp.float32)
    fin_count = jnp.zeros((B,), jnp.int32)
    last, prev, max_ts = _filter_state(buf, cur_len, cfg)

    def _live(state):
        i, cur_len, fin_count = state[0], state[2], state[8]
        return (
            (i < cfg.sample_len)
            & ~jnp.all(fin_count >= C)
            & (cur_len <= cfg.dims.n_text_ctx)
        )

    cond = _live

    def body(state):
        # Unrolled sub-steps amortize per-iteration dispatch; each sub-step
        # re-checks the exact exit predicate via lax.cond so semantics are
        # identical to the step-at-a-time loop.
        for _ in range(cfg.unroll):
            state = jax.lax.cond(_live(state), _substep, lambda s: s, state)
        return state

    def _substep(state):
        (i, buf, cur_len, cache, sum_logprobs, logits, fin_toks, fin_scores,
         fin_count, last, prev, max_ts) = state

        cur_rows = jnp.full((BK,), cur_len, jnp.int32)
        (buf, sum_logprobs, fin_toks, fin_scores, fin_count, last, prev,
         max_ts, flat_src, new_tok) = _beam_transition(
            cfg, K, C, logits, buf, cur_rows, sum_logprobs,
            fin_toks, fin_scores, fin_count, last, prev, max_ts,
        )
        # Rearrange only the self-attention cache: beams never cross audio
        # groups, and the cross cache is stored once per AUDIO (not per beam),
        # so it needs no gather at all.
        cache_g = {
            **cache,
            "self_k": [k[flat_src] for k in cache["self_k"]],
            "self_v": [v[flat_src] for v in cache["self_v"]],
        }

        step_logits, cache_g = model.decoder_step(
            params["decoder"], new_tok[:, None], cache_g, cfg.dims,
            jnp.dtype(cfg.compute_dtype),
            logits_dtype=_logits_dtype(cfg),
        )
        return (i + 1, buf, cur_len + 1, cache_g, sum_logprobs,
                step_logits[:, 0], fin_toks, fin_scores, fin_count, last, prev,
                max_ts)

    state = (jnp.asarray(0, jnp.int32), buf, cur_len, cache, sum_logprobs,
             logits, fin_toks, fin_scores, fin_count, last, prev, max_ts)
    state = jax.lax.while_loop(cond, body, state)
    (_, buf, cur_len, _, sum_logprobs, _, fin_toks, fin_scores, fin_count,
     *_rest) = state
    # Trim to the reachable columns before the host fetch (see greedy_decode).
    reach = min(cfg.sample_begin + cfg.sample_len + 1, n_ctx + 1)
    return (
        buf.reshape(B, K, n_ctx + 1)[:, :, :reach],
        sum_logprobs.reshape(B, K),
        fin_toks[:, :, :reach],
        fin_scores,
        fin_count,
        no_speech_probs,
        audio_features,
    )

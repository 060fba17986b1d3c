"""Continuous-batching decode engine (slot-based, vLLM-style).

The micro-batcher (serving.BatchingTranscriber) decodes each batch to
completion before the next one starts, so one long utterance head-of-line
blocks every request behind it, and a request arriving mid-batch waits for
the whole decode.  This engine keeps a FIXED pool of B slots live on the
device; every jitted step advances all occupied slots by ``unroll`` tokens,
and finished slots are refilled mid-flight from the waiting queue without
disturbing the others.  The enabling primitive is the per-row KV-cache
offset added for speculative decoding (models/whisper.py decoder_step
``offsets``): every slot sits at its OWN position in its own cache rows,
so admission is just scattering fresh cross-KV/prompt state into freed
rows.

The reference has no serving layer at all (closest: the one-batch-at-a-
time eval loop, /root/reference/evaluate_pretrained_whisper.py:150-210);
this is a beyond-reference capability.

Exactness: each request's tokens equal the plain decode of that request
alone — greedy pools run the same filtered-argmax progression with per-row
filter state; beam pools (``options.beam_size``) run groups of K hypothesis
rows through the shared ``_beam_transition`` and freeze each group on
exactly the solo beam loop's exit predicate; only scheduling differs.
With ``language=None`` on a multilingual model, admission also runs the
reference's language-id protocol (one sot forward) per request inside the
same program.

Trade-off vs the jitted while_loop decode: the loop is host-driven (one
dispatch + one small fetch per ``unroll`` tokens), costing tunnel latency
per block, in exchange for zero head-of-line blocking and mid-flight
admission.  Use the micro-batcher for homogeneous offline batches; use the
engine for latency-sensitive mixed traffic.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..models import whisper as model
from .loop import (
    LoopConfig,
    _beam_transition,
    _encode_audio,
    _filter_state,
    _logits_dtype,
    _prompt_pass,
)
from .speculative import _argmax_commit, _lookup_propose, _verify_chain


class _EngineState(NamedTuple):
    """Device-resident slot pool.  All shapes fixed at (slots, ...)."""

    self_k: tuple  # per layer (B, Tmax, D)
    self_v: tuple
    cross_k: tuple  # per layer (B, Ta, D) fp — or (B, H, Dh, Tp) int8 when
    #                 the pool is quantized (cross_sk non-empty)
    cross_v: tuple
    buf: jnp.ndarray  # (B, W) committed tokens (eot-filled tail)
    cur: jnp.ndarray  # (B,) committed count (incl. prompt)
    finished: jnp.ndarray  # (B,) bool
    last: jnp.ndarray
    prev: jnp.ndarray
    max_ts: jnp.ndarray
    sum_lp: jnp.ndarray
    no_speech: jnp.ndarray  # (B,) prob captured at admit
    lang: jnp.ndarray  # (B,) detected language token (-1 = fixed language)
    # kv_int8 pools only: per layer (B, H, Tp) dequant scales.  Empty tuples
    # on the fp path (the pytree structure is part of the jit key, so each
    # mode compiles its own programs).
    cross_sk: tuple = ()
    cross_sv: tuple = ()


def _admit_frontend(params, cfg: LoopConfig, mels, init_tokens, scales,
                    audio_frontend: bool, lang_mask, detect: bool):
    """Shared admission preamble for the greedy and beam pools: optional
    in-program mel (int16 wire dequant), encode, optional per-request
    language id (reference protocol, whisper/decoding.py:18-77) written
    into the prompt's language slot.  Returns (xa, init_tokens, lang_tok);
    lang_tok is -1 for fixed-language pools."""
    dt = jnp.dtype(cfg.compute_dtype)
    A = mels.shape[0]
    if audio_frontend:
        from ..audio import log_mel_spectrogram

        mels = log_mel_spectrogram(
            mels.astype(jnp.float32) * scales[:, None], cfg.dims.n_mels
        )
    xa = _encode_audio(params, mels, cfg)
    if detect:
        sot_tok = init_tokens[:, cfg.sot_index: cfg.sot_index + 1]
        lang_logits = model.decoder_apply(
            params["decoder"], sot_tok, xa, cfg.dims, dt
        )[:, 0].astype(jnp.float32)
        lang_tok = jnp.argmax(
            jnp.where(lang_mask, lang_logits, -jnp.inf), axis=-1
        ).astype(jnp.int32)
        init_tokens = init_tokens.at[:, cfg.sot_index + 1].set(lang_tok)
    else:
        lang_tok = jnp.full((A,), -1, jnp.int32)
    return xa, init_tokens, lang_tok


def _cache_of(state: _EngineState) -> Dict:
    cache = {
        "self_k": list(state.self_k),
        "self_v": list(state.self_v),
        "idx": jnp.zeros((), jnp.int32),  # unused on the offsets path
    }
    if state.cross_sk:
        cache["cross_k8"] = list(state.cross_k)
        cache["cross_sk"] = list(state.cross_sk)
        cache["cross_v8"] = list(state.cross_v)
        cache["cross_sv"] = list(state.cross_sv)
    else:
        cache["cross_k"] = list(state.cross_k)
        cache["cross_v"] = list(state.cross_v)
    return cache


@partial(
    jax.jit, static_argnames=("cfg", "unroll", "gamma"), donate_argnums=(2,)
)
def _engine_step(
    params, cfg: LoopConfig, state: _EngineState, unroll: int,
    gamma: int = 0,
):
    """Advance every slot by up to ``unroll`` tokens — or, with ``gamma``,
    by ``unroll`` lookup-speculative rounds of 1..gamma+1 commits each
    (finished slots are inert).  One dispatch for the whole block."""
    dt = jnp.dtype(cfg.compute_dtype)
    n_ctx = cfg.dims.n_text_ctx
    cache = _cache_of(state)
    buf, cur = state.buf, state.cur
    finished = state.finished
    last, prev, max_ts = state.last, state.prev, state.max_ts
    sum_lp = state.sum_lp
    for _ in range(unroll):
        feed_at = jnp.maximum(cur - 1, 0)
        if gamma:
            # Prompt-lookup slab round (decode/speculative.py): propose from
            # the row's own history, verify all proposals in one width-
            # (gamma+1) forward, commit while they match the filtered argmax.
            anchor = jnp.take_along_axis(buf, feed_at[:, None], axis=1)[:, 0]
            props = _lookup_propose(buf, feed_at, anchor, prev, gamma)
            slab = jnp.stack([anchor] + props, axis=1)
            logits, cache = model.decoder_step(
                params["decoder"], slab, cache, cfg.dims, dt,
                logits_dtype=_logits_dtype(cfg), offsets=feed_at,
            )
            buf, cur, finished, sum_lp, last, prev, max_ts = _verify_chain(
                cfg, logits, props, buf, cur, finished, sum_lp, last, prev,
                max_ts,
            )
            # out-of-budget slots retire (the chain only sets finished on
            # eot; mirror the greedy loop's cond)
            finished = finished | ~(
                (cur - cfg.sample_begin < cfg.sample_len) & (cur <= n_ctx)
            )
            continue
        tok = jnp.take_along_axis(buf, feed_at[:, None], axis=1)
        logits, cache = model.decoder_step(
            params["decoder"], tok, cache, cfg.dims, dt,
            logits_dtype=_logits_dtype(cfg), offsets=feed_at,
        )
        e, lp = _argmax_commit(
            cfg, logits[:, 0].astype(jnp.float32), cur, last, prev, max_ts
        )
        commit = (
            ~finished
            & (cur - cfg.sample_begin < cfg.sample_len)
            & (cur <= n_ctx)
        )
        sum_lp = sum_lp + lp * commit
        write = jnp.where(
            commit, e,
            jnp.take_along_axis(
                buf, jnp.minimum(cur, n_ctx)[:, None], axis=1
            )[:, 0],
        )
        buf = jax.vmap(lambda row, i, t: row.at[i].set(t))(
            buf, jnp.minimum(cur, n_ctx), write
        )
        # a slot out of budget without eot also retires (mirrors the greedy
        # loop's cond: no further commits are possible)
        finished = finished | (commit & (e == cfg.eot)) | ~commit
        prev = jnp.where(commit, last, prev)
        last = jnp.where(commit, e, last)
        max_ts = jnp.where(
            commit & (e >= cfg.timestamp_begin), jnp.maximum(max_ts, e),
            max_ts,
        )
        cur = cur + commit
    return state._replace(
        self_k=tuple(cache["self_k"]), self_v=tuple(cache["self_v"]),
        buf=buf, cur=cur, finished=finished, last=last, prev=prev,
        max_ts=max_ts, sum_lp=sum_lp,
    )


@partial(
    jax.jit, static_argnames=("cfg", "tmax", "audio_frontend", "detect"),
    donate_argnums=(2,),  # the slot pool is always replaced by the result
)
def _engine_admit(
    params, cfg: LoopConfig, state: _EngineState,
    slot_ids: jnp.ndarray,  # (A,) int32 — duplicates allowed ONLY as
    #                          padding that repeats a real id (identical
    #                          payload rows make the duplicate writes agree)
    mels: jnp.ndarray,  # (A, n_mels, T) mel — or, with ``audio_frontend``,
    #                      (A, n_samples) int16 peak-quantized raw audio
    init_tokens: jnp.ndarray,  # (A, sample_begin)
    tmax: int,
    scales: Optional[jnp.ndarray] = None,  # (A,) int16 dequant factors
    audio_frontend: bool = False,
    lang_mask: Optional[jnp.ndarray] = None,  # (n_vocab,) bool
    detect: bool = False,
):
    """Encode + prompt-pass A requests and scatter them into their slots.

    With ``audio_frontend`` the mel runs INSIDE this same program (audio
    crosses the (possibly tunneled) link as int16 — half the bytes — and
    admission costs ONE dispatch total, like the fused decode loop)."""
    A = mels.shape[0]
    xa, init_tokens, lang_tok = _admit_frontend(
        params, cfg, mels, init_tokens, scales, audio_frontend, lang_mask,
        detect,
    )
    sub, last_logits, no_speech = _prompt_pass(
        params, cfg, xa, init_tokens, ctx=tmax
    )

    sb = jnp.asarray(cfg.sample_begin, jnp.int32)
    neg1 = jnp.full((A,), -1, jnp.int32)
    tok0, lp0 = _argmax_commit(
        cfg, last_logits.astype(jnp.float32), sb, neg1, neg1,
        jnp.zeros((A,), jnp.int32),
    )

    row = jnp.full((A, state.buf.shape[1]), cfg.eot, jnp.int32)
    row = jax.lax.dynamic_update_slice(
        row, init_tokens.astype(jnp.int32), (0, 0)
    )
    row = row.at[:, cfg.sample_begin].set(tok0)

    ids = slot_ids
    if state.cross_sk:
        # int8 pool: the quantization (ops/decode_attn.quantize_kv, applied
        # inside _prompt_pass) is per (row, head, position), so scattering
        # values + scales row-wise is exactly the fp scatter.
        cross = dict(
            cross_k=tuple(
                big.at[ids].set(s)
                for big, s in zip(state.cross_k, sub["cross_k8"])
            ),
            cross_sk=tuple(
                big.at[ids].set(s)
                for big, s in zip(state.cross_sk, sub["cross_sk"])
            ),
            cross_v=tuple(
                big.at[ids].set(s)
                for big, s in zip(state.cross_v, sub["cross_v8"])
            ),
            cross_sv=tuple(
                big.at[ids].set(s)
                for big, s in zip(state.cross_sv, sub["cross_sv"])
            ),
        )
    else:
        cross = dict(
            cross_k=tuple(
                big.at[ids].set(s)
                for big, s in zip(state.cross_k, sub["cross_k"])
            ),
            cross_v=tuple(
                big.at[ids].set(s)
                for big, s in zip(state.cross_v, sub["cross_v"])
            ),
        )
    return state._replace(
        self_k=tuple(
            big.at[ids].set(s) for big, s in zip(state.self_k, sub["self_k"])
        ),
        self_v=tuple(
            big.at[ids].set(s) for big, s in zip(state.self_v, sub["self_v"])
        ),
        **cross,
        buf=state.buf.at[ids].set(row),
        cur=state.cur.at[ids].set(cfg.sample_begin + 1),
        finished=state.finished.at[ids].set(tok0 == cfg.eot),
        last=state.last.at[ids].set(tok0),
        prev=state.prev.at[ids].set(-1),
        max_ts=state.max_ts.at[ids].set(
            jnp.where(tok0 >= cfg.timestamp_begin, tok0, 0).astype(jnp.int32)
        ),
        sum_lp=state.sum_lp.at[ids].set(lp0),
        no_speech=state.no_speech.at[ids].set(no_speech),
        lang=state.lang.at[ids].set(lang_tok),
    )


class _BeamState(NamedTuple):
    """Device-resident beam slot pool: G request groups x K hypothesis rows.

    Row arrays are (G*K, ...) group-major; per-request arrays are (G, ...).
    The cross-KV is stored once per GROUP (grouped cross-attention,
    models/whisper.py ``_grouped_cross_attention``), exactly like the batch
    beam loop."""

    self_k: tuple  # per layer (G*K, Tmax, D)
    self_v: tuple
    cross_k: tuple  # per layer (G, Ta, D) — fp only (no int8 beam pools)
    cross_v: tuple
    buf: jnp.ndarray  # (G*K, W) hypothesis tokens (eot-filled tail)
    cur: jnp.ndarray  # (G,) write position (constant across a group's rows)
    done: jnp.ndarray  # (G,) bool — group retired/free
    sum_lp: jnp.ndarray  # (G*K,) cumulative beam logprobs
    fin_toks: jnp.ndarray  # (G, C, W) bounded finished set
    fin_scores: jnp.ndarray  # (G, C)
    fin_count: jnp.ndarray  # (G,)
    last: jnp.ndarray  # (G*K,) filter state
    prev: jnp.ndarray
    max_ts: jnp.ndarray
    no_speech: jnp.ndarray  # (G,)
    lang: jnp.ndarray  # (G,)


def _beam_live(cfg: LoopConfig, C: int, cur, fin_count):
    """The solo beam loop's continue predicate, per group (loop.py
    ``beam_decode._live`` with i = cur - sample_begin): freezing each group
    on exactly this predicate makes its result identical to decoding that
    request alone."""
    return (
        (cur - cfg.sample_begin < cfg.sample_len)
        & (fin_count < C)
        & (cur <= cfg.dims.n_text_ctx)
    )


@partial(
    jax.jit, static_argnames=("cfg", "unroll", "K", "C"), donate_argnums=(2,)
)
def _beam_engine_step(
    params, cfg: LoopConfig, state: _BeamState, unroll: int, K: int, C: int
):
    """Advance every live group by up to ``unroll`` beam transitions in one
    dispatch.  Done/free groups are inert: their rows still flow through the
    (batched) forward+transition, but every update is masked out and their
    self-KV gather is the identity."""
    dt = jnp.dtype(cfg.compute_dtype)
    cache = {
        "self_k": list(state.self_k), "self_v": list(state.self_v),
        "cross_k": list(state.cross_k), "cross_v": list(state.cross_v),
        "idx": jnp.zeros((), jnp.int32),  # unused on the offsets path
    }
    buf, cur, done, sum_lp = state.buf, state.cur, state.done, state.sum_lp
    fin_toks, fin_scores, fin_count = (
        state.fin_toks, state.fin_scores, state.fin_count
    )
    last, prev, max_ts = state.last, state.prev, state.max_ts
    idr = jnp.arange(buf.shape[0])
    for _ in range(unroll):
        may = ~done
        cur_rows = jnp.repeat(cur, K)
        may_rows = jnp.repeat(may, K)
        feed_at = jnp.maximum(cur_rows - 1, 0)
        # Feed each row's last selected token; its KV (position cur-1) is
        # written HERE, one iteration after selection — the same cache rows
        # the batch loop produces, since the parent gather below permutes
        # whole rows (frozen rows recompute identical values, and clamped
        # writes past tmax touch only rows re-initialized at admission).
        tok = jnp.take_along_axis(buf, feed_at[:, None], axis=1)
        logits, cache = model.decoder_step(
            params["decoder"], tok, cache, cfg.dims, dt,
            logits_dtype=_logits_dtype(cfg), offsets=feed_at,
        )
        (t_buf, t_sum, t_ft, t_fs, t_fc, t_last, t_prev, t_maxts,
         flat_src, _tok) = _beam_transition(
            cfg, K, C, logits[:, 0].astype(jnp.float32), buf, cur_rows,
            sum_lp, fin_toks, fin_scores, fin_count, last, prev, max_ts,
        )
        src = jnp.where(may_rows, flat_src, idr)
        cache["self_k"] = [k[src] for k in cache["self_k"]]
        cache["self_v"] = [v[src] for v in cache["self_v"]]
        buf = jnp.where(may_rows[:, None], t_buf, buf)
        sum_lp = jnp.where(may_rows, t_sum, sum_lp)
        last = jnp.where(may_rows, t_last, last)
        prev = jnp.where(may_rows, t_prev, prev)
        max_ts = jnp.where(may_rows, t_maxts, max_ts)
        fin_toks = jnp.where(may[:, None, None], t_ft, fin_toks)
        fin_scores = jnp.where(may[:, None], t_fs, fin_scores)
        fin_count = jnp.where(may, t_fc, fin_count)
        cur = jnp.where(may, cur + 1, cur)
        done = done | (may & ~_beam_live(cfg, C, cur, fin_count))
    return state._replace(
        self_k=tuple(cache["self_k"]), self_v=tuple(cache["self_v"]),
        buf=buf, cur=cur, done=done, sum_lp=sum_lp, fin_toks=fin_toks,
        fin_scores=fin_scores, fin_count=fin_count, last=last, prev=prev,
        max_ts=max_ts,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "tmax", "K", "C", "audio_frontend", "detect"),
    donate_argnums=(2,),
)
def _beam_admit(
    params, cfg: LoopConfig, state: _BeamState,
    group_ids: jnp.ndarray,  # (A,) int32 — duplicates allowed as padding
    #                           that repeats a real id (identical payloads)
    mels: jnp.ndarray,
    init_tokens: jnp.ndarray,  # (A, sample_begin)
    tmax: int, K: int, C: int,
    scales: Optional[jnp.ndarray] = None,
    audio_frontend: bool = False,
    lang_mask: Optional[jnp.ndarray] = None,
    detect: bool = False,
):
    """Encode + prompt-pass A requests, run their FIRST beam transition from
    the prompt logits (so the pool's groups are uniformly 'forward then
    transition'), and scatter the K-row groups into their slots."""
    A = mels.shape[0]
    xa, init_tokens, lang_tok = _admit_frontend(
        params, cfg, mels, init_tokens, scales, audio_frontend, lang_mask,
        detect,
    )
    init_rep = jnp.repeat(init_tokens, K, axis=0)  # (A*K, sb)
    sub, last_logits, no_speech_all = _prompt_pass(
        params, cfg, xa, init_rep, ctx=tmax
    )
    no_speech = no_speech_all[::K]

    W = state.buf.shape[1]
    eot = cfg.eot
    buf = jnp.full((A * K, W), eot, jnp.int32)
    buf = jax.lax.dynamic_update_slice(
        buf, init_rep.astype(jnp.int32), (0, 0)
    )
    # Only beam 0 of each request starts live (loop.py beam_decode init).
    sum_lp = jnp.tile(
        jnp.where(jnp.arange(K) == 0, 0.0, -jnp.inf)[None, :], (A, 1)
    ).reshape(A * K)
    fin_toks = jnp.full((A, C, W), eot, jnp.int32)
    fin_scores = jnp.full((A, C), -jnp.inf, jnp.float32)
    fin_count = jnp.zeros((A,), jnp.int32)
    last, prev, max_ts = _filter_state(buf, cfg.sample_begin, cfg)
    cur_rows = jnp.full((A * K,), cfg.sample_begin, jnp.int32)
    (buf, sum_lp, fin_toks, fin_scores, fin_count, last, prev, max_ts,
     flat_src, _tok) = _beam_transition(
        cfg, K, C, last_logits.astype(jnp.float32), buf, cur_rows, sum_lp,
        fin_toks, fin_scores, fin_count, last, prev, max_ts,
    )
    self_k = [k[flat_src] for k in sub["self_k"]]
    self_v = [v[flat_src] for v in sub["self_v"]]

    cur_new = jnp.full((A,), cfg.sample_begin + 1, jnp.int32)
    grp_done = ~_beam_live(cfg, C, cur_new, fin_count)

    gids = group_ids
    rids = (gids[:, None] * K + jnp.arange(K)).reshape(-1)
    return state._replace(
        self_k=tuple(
            big.at[rids].set(s) for big, s in zip(state.self_k, self_k)
        ),
        self_v=tuple(
            big.at[rids].set(s) for big, s in zip(state.self_v, self_v)
        ),
        cross_k=tuple(
            big.at[gids].set(s)
            for big, s in zip(state.cross_k, sub["cross_k"])
        ),
        cross_v=tuple(
            big.at[gids].set(s)
            for big, s in zip(state.cross_v, sub["cross_v"])
        ),
        buf=state.buf.at[rids].set(buf),
        cur=state.cur.at[gids].set(cur_new),
        done=state.done.at[gids].set(grp_done),
        sum_lp=state.sum_lp.at[rids].set(sum_lp),
        fin_toks=state.fin_toks.at[gids].set(fin_toks),
        fin_scores=state.fin_scores.at[gids].set(fin_scores),
        fin_count=state.fin_count.at[gids].set(fin_count),
        last=state.last.at[rids].set(last),
        prev=state.prev.at[rids].set(prev),
        max_ts=state.max_ts.at[rids].set(max_ts),
        no_speech=state.no_speech.at[gids].set(no_speech),
        lang=state.lang.at[gids].set(lang_tok),
    )


@dataclass
class _Request:
    payload: np.ndarray  # (n_mels, T) mel, or int16 audio (audio_frontend)
    scale: float = 1.0
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    error: Optional[str] = None


class DecodeEngine:
    """Host orchestrator: a worker thread admits queued requests into free
    slots and steps the pool; ``submit`` blocks until that request's slot
    retires.  Thread-safe."""

    def __init__(
        self,
        model_obj,
        options=None,
        slots: int = 8,
        unroll: int = 4,
        admit_width: int = 2,
        audio_frontend: bool = False,
        lookup_gamma: int = 0,
        mesh=None,
        metrics=None,
    ):
        """``audio_frontend``: submit() takes RAW 16 kHz audio (padded to
        30 s, peak-quantized to int16 on the host) and the mel runs inside
        the admission program — the serving configuration.  Without it,
        submit() takes a precomputed (n_mels, T) mel.

        ``lookup_gamma``: > 0 turns each step iteration into a prompt-lookup
        speculative round — up to gamma+1 tokens commit per slot per
        forward, still token-exact (decode/speculative.py).

        ``mesh``: shard the slot pool (and the params, via model.shard)
        along the mesh's data axis — data-parallel continuous batching for
        multi-chip hosts.  ``slots`` must be a mesh-size multiple.

        ``metrics``: a serving.ServerMetrics-like registry (``inc``/``set``)
        to record admissions, retirements, committed tokens, step
        dispatches, and current slot occupancy under ``engine_*`` names."""
        from . import DecodingOptions, DecodingTask

        from dataclasses import replace

        options = options or DecodingOptions(
            language="en", without_timestamps=True
        )
        self._detect = False
        if options.language is None:
            # Multilingual models get per-request language id inside the
            # admission program ("en" below is only the placeholder the
            # prompt is built around); English-only vocabularies have no
            # language slot and simply decode as English.
            self._detect = model_obj.is_multilingual
            options = replace(options, language="en")
        if options.temperature != 0 or options.best_of:
            raise ValueError(
                "DecodeEngine decodes at temperature 0 (greedy or beam); "
                "best_of requires sampling"
            )
        self.beam = options.beam_size or 0
        if self.beam:
            if lookup_gamma:
                raise ValueError(
                    "lookup_gamma speculative rounds are greedy-only"
                )
            if options.kv_int8:
                raise ValueError(
                    "kv_int8 beam pools are unsupported (grouped int8 "
                    "cross-attention)"
                )
            if mesh is not None and mesh.devices.size > 1:
                raise ValueError("beam engine pools do not shard over a mesh")
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        if self.mesh is not None:
            ndata = self.mesh.shape["data"]
            if slots % ndata:
                raise ValueError(
                    f"slots ({slots}) must be a multiple of the mesh's "
                    f"data axis ({ndata})"
                )
            # Params go on the mesh (TP/replicated specs) and the model
            # pins it, so the DecodingTask below builds mesh-aware programs.
            model_obj.shard(self.mesh)
        self.model = model_obj
        task = DecodingTask(model_obj, options)
        self.task = task
        self.cfg = task.loop_cfg._replace(unroll=unroll)
        self.tokenizer = task.tokenizer
        self.slots = slots
        self.unroll = unroll
        self.admit_width = min(admit_width, slots)
        self.admit_calls = 0  # diagnostic: distinct admission dispatches
        self.audio_frontend = audio_frontend
        self.metrics = metrics
        if self._detect:
            mask = np.zeros(model_obj.dims.n_vocab, bool)
            mask[list(self.tokenizer.all_language_tokens)] = True
            self._lang_mask = jnp.asarray(mask)
            self._lang_codes = dict(
                zip(
                    self.tokenizer.all_language_tokens,
                    self.tokenizer.all_language_codes,
                )
            )
        else:
            self._lang_mask = None
            self._lang_codes = {}

        self.lookup_gamma = lookup_gamma
        dims = model_obj.dims
        # spec rounds write K/V up to anchor + gamma past the last
        # committable position
        reach = (
            task.sample_begin + task.sample_len
            + max(unroll, lookup_gamma + 1) + 1
        )
        self.tmax = min(dims.n_text_ctx, (reach + 15) // 16 * 16)
        if self.beam:
            # bounded finished set of C = round(K * patience) candidates
            # (reference decoding.py:318)
            self.max_cands = max(
                round(self.beam * (self.task.options.patience or 1.0)), 1
            )
        self.state = self._fresh_state()
        self._post_init()

    def _fresh_state(self):
        """An empty slot pool for the configured mode (also used to rebuild
        after a dispatch consumed the donated pool and then failed)."""
        dims = self.model.dims
        dt = jnp.dtype(self.cfg.compute_dtype)
        slots = self.slots
        sb1 = self.cfg.sample_begin + 1
        if self.beam:
            # G = slots request groups x K hypothesis rows; cross-KV once
            # per group (grouped cross-attention).
            K = self.beam
            proto = model.init_kv_cache(
                dims, slots * K, dt, cross_batch=slots, ctx=self.tmax
            )
            W = dims.n_text_ctx + 1
            return _BeamState(
                self_k=tuple(proto["self_k"]),
                self_v=tuple(proto["self_v"]),
                cross_k=tuple(proto["cross_k"]),
                cross_v=tuple(proto["cross_v"]),
                buf=jnp.full((slots * K, W), self.cfg.eot, jnp.int32),
                cur=jnp.full((slots,), sb1, jnp.int32),
                done=jnp.ones((slots,), bool),
                sum_lp=jnp.zeros((slots * K,), jnp.float32),
                fin_toks=jnp.full(
                    (slots, self.max_cands, W), self.cfg.eot, jnp.int32
                ),
                fin_scores=jnp.full(
                    (slots, self.max_cands), -jnp.inf, jnp.float32
                ),
                fin_count=jnp.zeros((slots,), jnp.int32),
                last=jnp.full((slots * K,), -1, jnp.int32),
                prev=jnp.full((slots * K,), -1, jnp.int32),
                max_ts=jnp.zeros((slots * K,), jnp.int32),
                no_speech=jnp.full((slots,), jnp.nan, jnp.float32),
                lang=jnp.full((slots,), -1, jnp.int32),
            )
        proto = model.init_kv_cache(
            dims, slots, dt, ctx=self.tmax, cross_int8=self.cfg.kv_int8
        )
        if self.cfg.kv_int8:
            # int8 slot pool: cross_k/cross_v carry the int8 buffers; the
            # per-(head, position) dequant scales ride in cross_sk/cross_sv.
            cross = dict(
                cross_k=tuple(proto["cross_k8"]),
                cross_sk=tuple(proto["cross_sk"]),
                cross_v=tuple(proto["cross_v8"]),
                cross_sv=tuple(proto["cross_sv"]),
            )
        else:
            cross = dict(
                cross_k=tuple(proto["cross_k"]),
                cross_v=tuple(proto["cross_v"]),
            )
        state = _EngineState(
            self_k=tuple(proto["self_k"]),
            self_v=tuple(proto["self_v"]),
            **cross,
            buf=jnp.full(
                (slots, dims.n_text_ctx + 1), self.cfg.eot, jnp.int32
            ),
            cur=jnp.full((slots,), sb1, jnp.int32),
            finished=jnp.ones((slots,), bool),
            last=jnp.full((slots,), -1, jnp.int32),
            prev=jnp.full((slots,), -1, jnp.int32),
            max_ts=jnp.zeros((slots,), jnp.int32),
            sum_lp=jnp.zeros((slots,), jnp.float32),
            no_speech=jnp.full((slots,), jnp.nan, jnp.float32),
            lang=jnp.full((slots,), -1, jnp.int32),
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            s = NamedSharding(self.mesh, PartitionSpec("data"))
            state = jax.tree.map(lambda x: jax.device_put(x, s), state)
        return state

    def _recover_state_if_deleted(self):
        """After a failed dispatch: the step/admit programs DONATE the pool
        (donate_argnums), so a runtime failure that fired after the donation
        leaves self.state pointing at deleted buffers and every later
        dispatch would raise forever.  Detect that and rebuild an empty
        pool; any request still occupying a slot has lost its kv-state, so
        it is failed (waiters whose result already arrived are left alone).
        """
        try:
            dead = any(
                getattr(x, "is_deleted", lambda: False)()
                for x in jax.tree.leaves(self.state)
            )
        except Exception:
            dead = True
        if not dead:
            return
        for i, req in enumerate(self._occupant):
            if req is not None:
                if req.result is None and req.error is None:
                    req.error = (
                        "engine pool lost (device failure mid-dispatch)"
                    )
                req.event.set()
                self._occupant[i] = None
        self.state = self._fresh_state()

    def _post_init(self):
        """Host-side scheduling state + worker start (shared by the greedy
        and beam pool constructors)."""
        self._init = np.asarray(self.task.initial_tokens, np.int32)
        self._occupant: List[Optional[_Request]] = [None] * self.slots
        self._queue: List[_Request] = []
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()
        # Same teardown hazard as serving.BatchingTranscriber: a daemon
        # worker cancelled MID-DEVICE-CALL aborts remote/tunneled runtimes
        # with a bare C++ terminate.  Join it before interpreter exit.
        import atexit

        atexit.register(self.close)

    # -- client side --------------------------------------------------------

    def submit(self, x: np.ndarray, timeout: float = 600.0) -> dict:
        """Blocking request.  ``x``: a (n_mels, T) mel, or raw 16 kHz audio
        when the engine was built with ``audio_frontend`` (padded/trimmed
        and int16 peak-quantized here; dequantized on device)."""
        if self._stop.is_set():
            raise RuntimeError("engine is closed")
        if self.audio_frontend:
            from ..audio import pad_or_trim

            audio = np.asarray(x)
            if audio.dtype == np.int16:
                audio = audio.astype(np.float32) / 32768.0
            audio = pad_or_trim(np.asarray(audio, np.float32))
            peak = float(max(np.max(np.abs(audio)), 1e-9))
            req = _Request(
                payload=(audio * (32767.0 / peak)).astype(np.int16),
                scale=peak / 32767.0,
            )
        else:
            req = _Request(payload=np.asarray(x, np.float32))
        with self._lock:
            # under the same lock close() drains with: a request appended
            # after the drain would otherwise hang its waiter
            if self._stop.is_set():
                raise RuntimeError("engine is closed")
            self._queue.append(req)
        self._wake.set()
        if not req.event.wait(timeout):
            raise TimeoutError("decode timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def close(self):
        if self._stop.is_set():
            return  # idempotent (called again by atexit)
        self._stop.set()
        import atexit

        try:
            atexit.unregister(self.close)
        except Exception:
            pass
        self._wake.set()
        self._worker.join(timeout=600)
        with self._lock:
            for req in self._queue:
                req.error = "engine shutting down"
                req.event.set()
            self._queue.clear()
        for i, req in enumerate(self._occupant):
            if req is not None:
                req.error = "engine shutting down"
                req.event.set()
                self._occupant[i] = None

    # -- worker -------------------------------------------------------------

    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self._occupant) if r is None]

    def _admit_some(self):
        free = self._free_slots()
        while free:
            with self._lock:
                take = self._queue[: min(len(free), self.admit_width)]
                del self._queue[: len(take)]
            if not take:
                return
            ids = free[: len(take)]
            free = free[len(take):]
            # pad to the compiled admission width by REPEATING the last real
            # row (duplicate scatter indices with identical payloads agree)
            A = self.admit_width
            pad = A - len(take)
            try:
                payloads = np.stack(
                    [r.payload for r in take] + [take[-1].payload] * pad
                )
                scales = np.asarray(
                    [r.scale for r in take] + [take[-1].scale] * pad,
                    np.float32,
                )
                sids = np.asarray(ids + [ids[-1]] * pad, np.int32)
                init = np.tile(self._init, (A, 1))
                if self.beam:
                    self.state = _beam_admit(
                        self.model.params, self.cfg, self.state,
                        jnp.asarray(sids), jnp.asarray(payloads),
                        jnp.asarray(init),
                        tmax=self.tmax, K=self.beam, C=self.max_cands,
                        scales=jnp.asarray(scales),
                        audio_frontend=self.audio_frontend,
                        lang_mask=self._lang_mask, detect=self._detect,
                    )
                else:
                    self.state = _engine_admit(
                        self.model.params, self.cfg, self.state,
                        jnp.asarray(sids), jnp.asarray(payloads),
                        jnp.asarray(init),
                        tmax=self.tmax, scales=jnp.asarray(scales),
                        audio_frontend=self.audio_frontend,
                        lang_mask=self._lang_mask, detect=self._detect,
                    )
            except Exception as e:  # fail THESE requests (already dequeued:
                # nobody else will ever wake them), keep the pool serving
                msg = f"{type(e).__name__}: {e}"
                for req in take:
                    req.error = msg
                    req.event.set()
                # a failure AFTER the dispatch consumed the donated pool
                # would otherwise brick every later step/admit
                self._recover_state_if_deleted()
                return
            self.admit_calls += 1
            for slot, req in zip(ids, take):
                self._occupant[slot] = req
            if self.metrics is not None:
                self.metrics.inc("engine_admitted_total", len(take))
                self.metrics.inc("engine_admit_dispatches_total")

    def _retire_finished_beam(self):
        done = jax.device_get(self.state.done)
        retire = [
            g for g, r in enumerate(self._occupant)
            if r is not None and done[g]
        ]
        if not retire:
            return
        buf, sum_lp, fin_toks, fin_scores, fin_count, no_speech, lang = (
            jax.device_get(
                (self.state.buf, self.state.sum_lp, self.state.fin_toks,
                 self.state.fin_scores, self.state.fin_count,
                 self.state.no_speech, self.state.lang)
            )
        )
        from . import _cut_at_eot, finalize_beam_group, rank_group

        K, eot, sb = self.beam, self.cfg.eot, self.cfg.sample_begin
        lp_alpha = self.task.options.length_penalty
        for g in retire:
            req = self._occupant[g]
            # Same finalize + ranker as the batch task (_run_beam) — the
            # parity-critical math lives once, in decode/__init__.py.
            seqs, scores = finalize_beam_group(
                fin_toks[g], fin_scores[g], int(fin_count[g]),
                buf[g * K: (g + 1) * K], sum_lp[g * K: (g + 1) * K],
                K, eot,
            )
            sliced = [_cut_at_eot(seq, sb, eot) for seq in seqs]
            best = rank_group(sliced, scores, lp_alpha)
            ids = sliced[best]
            text = self.tokenizer.decode(ids).strip()
            req.result = {
                "text": text,
                "tokens": [int(t) for t in ids],
                "avg_logprob": scores[best] / (len(ids) + 1),
                "no_speech_prob": float(no_speech[g]),
                "language": self._lang_codes.get(
                    int(lang[g]), self.task.options.language or "en"
                ),
            }
            req.event.set()
            self._occupant[g] = None
            if self.metrics is not None:
                self.metrics.inc("engine_retired_total")
                self.metrics.inc(
                    "engine_committed_tokens_total", len(ids) + 1
                )

    def _retire_finished(self):
        if self.beam:
            return self._retire_finished_beam()
        finished, cur = jax.device_get(
            (self.state.finished, self.state.cur)
        )
        done = [
            i for i, r in enumerate(self._occupant)
            if r is not None and finished[i]
        ]
        if not done:
            return
        # Fetch the whole (small) metadata arrays: gathering just the done
        # rows with device indexing would compile a new gather per distinct
        # len(done).
        buf, sum_lp, no_speech, lang = jax.device_get(
            (self.state.buf, self.state.sum_lp, self.state.no_speech,
             self.state.lang)
        )
        eot = self.cfg.eot
        sb = self.cfg.sample_begin
        for slot in done:
            req = self._occupant[slot]
            s = np.asarray(buf[slot])[sb: int(cur[slot])]
            hits = np.nonzero(s == eot)[0]
            ids = s[: hits[0]].tolist() if hits.size else s.tolist()
            text = self.tokenizer.decode(ids).strip()
            req.result = {
                "text": text,
                "tokens": [int(t) for t in ids],
                "avg_logprob": float(sum_lp[slot]) / (len(ids) + 1),
                "no_speech_prob": float(no_speech[slot]),
                "language": self._lang_codes.get(
                    int(lang[slot]), self.task.options.language or "en"
                ),
            }
            req.event.set()
            self._occupant[slot] = None
            if self.metrics is not None:
                self.metrics.inc("engine_retired_total")
                self.metrics.inc(
                    "engine_committed_tokens_total", len(ids) + 1
                )

    def _run(self):
        while not self._stop.is_set():
            with self._lock:
                idle = not self._queue and all(
                    r is None for r in self._occupant
                )
            if idle:
                if self.metrics is not None:
                    # keep the gauge honest while drained (it is otherwise
                    # only written on active iterations)
                    self.metrics.set("engine_slots_occupied", 0)
                self._wake.wait(timeout=0.1)
                self._wake.clear()
                continue
            try:
                self._admit_some()
                occupied = sum(r is not None for r in self._occupant)
                if self.metrics is not None:
                    self.metrics.set("engine_slots_occupied", occupied)
                if occupied:
                    if self.beam:
                        self.state = _beam_engine_step(
                            self.model.params, self.cfg, self.state,
                            self.unroll, K=self.beam, C=self.max_cands,
                        )
                    else:
                        self.state = _engine_step(
                            self.model.params, self.cfg, self.state,
                            self.unroll, gamma=self.lookup_gamma,
                        )
                    if self.metrics is not None:
                        self.metrics.inc("engine_step_dispatches_total")
                    self._retire_finished()
            except Exception as e:  # fail live requests, keep serving
                msg = f"{type(e).__name__}: {e}"
                for i, req in enumerate(self._occupant):
                    if req is not None:
                        req.error = msg
                        req.event.set()
                        self._occupant[i] = None
                # a failure AFTER the dispatch consumed the donated pool
                # would otherwise brick every later step/admit
                self._recover_state_if_deleted()

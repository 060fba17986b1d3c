"""Word-level timing: median-filtered cross-attention + DTW alignment.

TPU-native rebuild of the reference timing stack
(/root/reference/whisper/whisper/timing.py:19-242 and the Triton kernels in
triton_ops.py:13-117):

* :func:`median_filter` — width-w sliding median as a jitted sort network
  over w rolled copies (vs the Triton bubble-sort kernel / torch unfold);
* :func:`dtw` — the O(N+M)-step anti-diagonal wavefront expressed as a
  ``lax.scan`` over skewed diagonals (the same skew trick as the reference's
  Triton kernel, timing.py:113-121, but compiler-scheduled); the backtrace
  walk is sequential pointer-chasing, done on host in numpy;
* :func:`find_alignment` — cross-attention qk collection via an explicit
  scan output (models.whisper.decoder_apply_with_cross_qk) instead of torch
  forward hooks, then z-norm → median filter → DTW → word boundaries;
* :func:`add_word_timestamps` — the duration-anomaly heuristics and
  punctuation merging (timing.py:245-388), pure host logic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import HOP_LENGTH, SAMPLE_RATE, TOKENS_PER_SECOND
from ..models import whisper as model
from ..tokenizer import Tokenizer


# ---------------------------------------------------------------------------
# Median filter
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("width",))
def _median_filter_jit(x: jnp.ndarray, width: int) -> jnp.ndarray:
    pad = width // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    T = x.shape[-1]
    windows = jnp.stack([xp[..., k : k + T] for k in range(width)], axis=-2)
    return jnp.sort(windows, axis=-2)[..., pad, :]


def median_filter(x, width: int):
    """Sliding median along the last axis, reflect-padded (timing.py:19-54)."""
    assert width > 0 and width % 2 == 1, "`width` should be an odd number"
    x = jnp.asarray(x)
    if x.shape[-1] <= width // 2:
        return x
    return _median_filter_jit(x, width)


# ---------------------------------------------------------------------------
# DTW
# ---------------------------------------------------------------------------


def _bucket(n: int, step: int) -> int:
    return ((n + step - 1) // step) * step


@partial(jax.jit, static_argnames=("N", "M"))
def _dtw_trace(x: jnp.ndarray, N: int, M: int) -> jnp.ndarray:
    """Wavefront DP over anti-diagonals.

    x: (N, M) cost matrix. Returns trace (N+M-1, N+1) int8 where row d-2
    holds the move chosen for every cell on diagonal i+j=d (0 diag, 1 up,
    2 left — reference move encoding, timing.py:90-103).
    """
    BIG = jnp.float32(jnp.inf)
    i_idx = jnp.arange(N + 1)

    # Skew x into per-diagonal rows: xs[k, i] = x[i-1, (k+2)-i-1].
    k_idx = jnp.arange(N + M - 1)[:, None]
    row = i_idx[None, :] - 1
    col = k_idx + 1 - i_idx[None, :]
    valid_x = (row >= 0) & (row < N) & (col >= 0) & (col < M)
    xs = jnp.where(valid_x, x[jnp.clip(row, 0, N - 1), jnp.clip(col, 0, M - 1)], 0.0)

    c0 = jnp.where(i_idx == 0, 0.0, BIG)  # diagonal d=0: only cost[0,0]=0
    c1 = jnp.full((N + 1,), BIG)  # diagonal d=1: borders

    def step(carry, inp):
        cm1, cm2 = carry  # diagonals d-1 and d-2
        xs_k, d = inp
        j = d - i_idx
        valid = (i_idx >= 1) & (i_idx <= N) & (j >= 1) & (j <= M)
        up_prev = jnp.concatenate([jnp.full((1,), BIG), cm2[:-1]])  # cost[i-1,j-1]
        up = jnp.concatenate([jnp.full((1,), BIG), cm1[:-1]])  # cost[i-1,j]
        left = cm1  # cost[i,j-1]
        t = jnp.where(
            (up_prev < up) & (up_prev < left),
            0,
            jnp.where((up < up_prev) & (up < left), 1, 2),
        ).astype(jnp.int8)
        c = jnp.where(t == 0, up_prev, jnp.where(t == 1, up, left))
        new = jnp.where(valid, xs_k + c, BIG)
        return (new, cm1), t

    ds = jnp.arange(2, N + M + 1, dtype=jnp.int32)
    (_, _), traces = jax.lax.scan(step, (c1, c0), (xs, ds))
    return traces


def _backtrace(trace: np.ndarray) -> np.ndarray:
    """Walk the move matrix from (N, M) to the origin (timing.py:57-79)."""
    i, j = trace.shape[0] - 1, trace.shape[1] - 1
    trace = trace.copy()
    trace[0, :] = 2
    trace[:, 0] = 1
    path = []
    while i > 0 or j > 0:
        path.append((i - 1, j - 1))
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.array(path)[::-1].T


def dtw(x) -> np.ndarray:
    """Minimum-cost monotone alignment path through cost matrix ``x`` (N, M).

    Returns (2, path_len): text indices and time indices.  Shapes are
    bucketed (N to 32, M to 256) so XLA compiles a handful of signatures;
    padding never affects the DP for the real region (the recurrence is
    causal in both i and j).
    """
    x = np.asarray(x, np.float32)
    N, M = x.shape
    Nb, Mb = _bucket(max(N, 1), 32), _bucket(max(M, 1), 256)
    xb = np.zeros((Nb, Mb), np.float32)
    xb[:N, :M] = x
    traces = np.asarray(_dtw_trace(jnp.asarray(xb), Nb, Mb))

    # Un-skew the diagonals into a (N+1, M+1) move matrix.
    trace = np.full((N + 1, M + 1), -1, np.int8)
    d = np.arange(2, N + M + 1)
    for dd in d:
        i = np.arange(max(1, dd - M), min(N, dd - 1) + 1)
        trace[i, dd - i] = traces[dd - 2, i]
    return _backtrace(trace)


# ---------------------------------------------------------------------------
# Alignment
# ---------------------------------------------------------------------------


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


@partial(jax.jit, static_argnames=("dims", "eot"))
def _cross_qk_tensors(
    params,
    tokens: jnp.ndarray,  # (1, T_pad) int32
    xa: jnp.ndarray,  # (1, 1500, D)
    head_idx: jnp.ndarray,  # (n_sel,) int32 flat indices into L*H
    dims,
    eot: int,
):
    """Teacher-forced decoder pass: per-token probs + the SELECTED alignment
    heads' raw cross-attention logits.

    Shapes depend only on the bucketed token length and the (per-model
    constant) selected-head count, so this — the expensive decoder graph —
    compiles once per token bucket.  Gathering the heads HERE (vs masking
    after the fact) keeps everything downstream at n_sel rows instead of
    L*H: for large (32x20=640 heads, ~20 selected) that is the difference
    between a ~12 GB and a ~0.4 GB median-filter intermediate — the
    reference stacks only the selected heads too (timing.py:206-207)."""
    logits, qks = model.decoder_apply_with_cross_qk(
        params["decoder"], tokens, xa, dims
    )
    # Renormalize over non-special tokens only (timing.py:198-199).
    probs = jax.nn.softmax(logits[0, :, :eot], axis=-1)
    L, _, H, T, Ta = qks.shape
    w = qks[:, 0].reshape(L * H, T, Ta)[head_idx]
    return probs, w


@partial(
    jax.jit, static_argnames=("medfilt_width", "num_frames_tok", "t_real")
)
def _alignment_matrix(
    w: jnp.ndarray,  # (n_sel, T_pad, 1500) raw cross-attention logits
    qk_scale: jnp.ndarray,  # traced f32 scalar
    medfilt_width: int,
    num_frames_tok: int,
    t_real: int,
):
    """Exact reference pipeline (timing.py:207-215) over the REAL rows and
    frames only: slice -> softmax -> z-norm over the token axis (ddof=0,
    real rows only — padded rows must not shift the per-column statistics)
    -> median filter -> head mean.  Static args are (width, frames, tokens):
    this stage recompiles per distinct final-window size, but it is a small
    elementwise+sort graph — the expensive decoder stage above is shape-
    stable.  The reference's short-input guard (timing.py:22-24: inputs no
    wider than the half-filter pass through unfiltered) applies here too."""
    w = w[:, :t_real, :num_frames_tok]
    w = jax.nn.softmax(w * qk_scale, axis=-1)
    mean = jnp.mean(w, axis=-2, keepdims=True)
    std = jnp.std(w, axis=-2, keepdims=True)
    w = (w - mean) / std
    if num_frames_tok > medfilt_width // 2:
        w = _median_filter_jit(w, medfilt_width)
    return jnp.mean(w, axis=0)


def find_alignment(
    model_obj,
    tokenizer: Tokenizer,
    text_tokens: List[int],
    mel: jnp.ndarray,
    num_frames: int,
    *,
    medfilt_width: int = 7,
    qk_scale: float = 1.0,
    audio_features=None,
) -> List[WordTiming]:
    """Token-to-time alignment via cross-attention DTW (timing.py:163-242).

    ``audio_features`` (optional, (1500, D) or (1, 1500, D) float32) reuses
    already-encoded features for this window — the transcribe loop encodes
    every window for decoding moments before aligning it, so passing them
    here halves the per-window encoder cost.  Non-float32 features (e.g. a
    bf16 decode) are re-encoded instead, keeping alignment numerics
    identical to the standalone path.
    """
    if len(text_tokens) == 0:
        return []
    nf = num_frames // 2
    if nf == 0:
        # A sliver window shorter than one output frame has nothing to
        # align against (the reference crashes on this edge; we return no
        # word timings instead).
        return []

    tokens = [
        *tokenizer.sot_sequence,
        tokenizer.no_timestamps,
        *text_tokens,
        tokenizer.eot,
    ]
    T_real = len(tokens)
    # Bucket the token length so XLA compiles few signatures; causal
    # self-attention + per-row cross-attention make pad rows inert (the
    # pad rows are sliced away before the z-norm statistics).
    T_pad = _bucket(T_real, 32)
    tok_arr = np.full((1, T_pad), tokenizer.eot, np.int32)
    tok_arr[0, :T_real] = tokens

    xa = None
    if audio_features is not None:
        if hasattr(audio_features, "device_row"):
            # DecodingResult.audio_features lazy row: slice on device
            # instead of jnp.asarray, which would fetch the whole batch to
            # host and back
            audio_features = audio_features.device_row()
        feat = jnp.asarray(audio_features)
        if feat.dtype == jnp.float32:
            xa = feat[None] if feat.ndim == 2 else feat
    if xa is None:
        if mel.ndim == 2:
            mel = mel[None]
        xa = model_obj.embed_audio(jnp.asarray(mel))

    heads = model_obj.alignment_heads
    if heads is None:
        heads = model_obj.default_alignment_heads()
    head_idx = np.flatnonzero(np.asarray(heads).reshape(-1)).astype(np.int32)

    probs, w = _cross_qk_tensors(
        model_obj.params,
        jnp.asarray(tok_arr),
        xa,
        jnp.asarray(head_idx),
        model_obj.dims,
        tokenizer.eot,
    )
    matrix = _alignment_matrix(
        w, jnp.float32(qk_scale), medfilt_width, nf, T_real
    )
    probs = np.asarray(probs)
    matrix = np.asarray(matrix)

    sot_len = len(tokenizer.sot_sequence)
    # Teacher-forced row sot_len+k predicts text token k (the no_timestamps
    # token sits between the sot sequence and the text).
    text_token_probs = [
        float(probs[sot_len + k, tid]) for k, tid in enumerate(text_tokens)
    ]

    # Rows [no_timestamps, *text_tokens] participate in the alignment
    # (timing.py:214-216).
    matrix = matrix[sot_len : T_real - 1]
    text_indices, time_indices = dtw(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(
        list(text_tokens) + [tokenizer.eot]
    )
    if len(word_tokens) <= 1:
        return []
    word_boundaries = np.pad(np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0))

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        float(np.mean(text_token_probs[i:j]))
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    return [
        WordTiming(word, toks, start, end, prob)
        for word, toks, start, end, prob in zip(
            words, word_tokens, start_times, end_times, word_probabilities
        )
    ]


def _absorb_timing(src: WordTiming, dst: WordTiming, front: bool) -> None:
    """Move src's text+tokens onto dst (keeping dst's times) and empty src.

    Emptied entries stay in the list rather than being deleted so the
    token-count bookkeeping in add_word_timestamps stays index-stable."""
    if front:
        dst.word = src.word + dst.word
        dst.tokens = src.tokens + dst.tokens
    else:
        dst.word = dst.word + src.word
        dst.tokens = dst.tokens + src.tokens
    src.word = ""
    src.tokens = []


def merge_punctuations(
    alignment: List[WordTiming], prepended: str, appended: str
) -> None:
    """Fold punctuation-only timings into their neighbors.

    Behavior spec matching the reference (timing.py:245-276): two linear
    passes.  Opening marks (tokenized as a space + mark) glue onto the word
    that FOLLOWS them — scanned right-to-left so chains of marks land on the
    same word; closing marks glue onto the word that PRECEDES them —
    scanned left-to-right, same chaining property.
    """
    follower = len(alignment) - 1
    for i in range(len(alignment) - 2, -1, -1):
        cur = alignment[i]
        if cur.word.startswith(" ") and cur.word.strip() in prepended:
            _absorb_timing(cur, alignment[follower], front=True)
        else:
            follower = i

    anchor = 0
    for j in range(1, len(alignment)):
        cur = alignment[j]
        if not alignment[anchor].word.endswith(" ") and cur.word in appended:
            _absorb_timing(cur, alignment[anchor], front=False)
        else:
            anchor = j


_SENTENCE_END_MARKS = ".。!！?？"

# Plausible-duration budget: the per-word duration cap is twice the median
# observed duration, with the median itself capped at 0.7 s; a word sitting
# more than 4 medians after the previous speech is "after a pause".
# Behavior spec matching the reference's tuning (timing.py:305-310) — the
# ratios are the contract, pinned by the word-timing parity tests.
_MEDIAN_DURATION_CAP = 0.7
_MAX_DURATION_RATIO = 2
_PAUSE_MEDIAN_RATIO = 4


def _duration_budget(alignment: List[WordTiming]):
    """(median_duration, max_duration, any_observed) over nonzero words."""
    durations = np.array([w.end - w.start for w in alignment])
    durations = durations[durations.nonzero()]
    median = float(np.median(durations)) if len(durations) else 0.0
    median = min(_MEDIAN_DURATION_CAP, median)
    return median, median * _MAX_DURATION_RATIO, len(durations) > 0


def _clip_sentence_boundary_outliers(
    alignment: List[WordTiming], max_duration: float
) -> None:
    """An over-long word AT a sentence end keeps its start (the DTW smeared
    its end into the pause); one right AFTER a sentence end keeps its end."""
    for k in range(1, len(alignment)):
        if alignment[k].end - alignment[k].start > max_duration:
            if alignment[k].word in _SENTENCE_END_MARKS:
                alignment[k].end = alignment[k].start + max_duration
            elif alignment[k - 1].word in _SENTENCE_END_MARKS:
                alignment[k].start = alignment[k].end - max_duration


def _shorten_first_word_after_pause(
    words: List[dict], last_speech_timestamp: float,
    median_duration: float, max_duration: float,
) -> None:
    """The first word after a long pause must not be implausibly long (the
    DTW tends to stretch it back across the silence): pull its start (and,
    when the second word is also stretched, the shared boundary) forward."""
    stretched = (
        words[0]["end"] - words[0]["start"] > max_duration
        or (
            len(words) > 1
            and words[1]["end"] - words[0]["start"] > max_duration * 2
        )
    )
    after_pause = (
        words[0]["end"] - last_speech_timestamp
        > median_duration * _PAUSE_MEDIAN_RATIO
    )
    if not (after_pause and stretched):
        return
    if len(words) > 1 and words[1]["end"] - words[1]["start"] > max_duration:
        boundary = max(words[1]["end"] / 2, words[1]["end"] - max_duration)
        words[0]["end"] = words[1]["start"] = boundary
    words[0]["start"] = max(0, words[0]["end"] - max_duration)


def _reconcile_segment_bounds(
    segment: dict, words: List[dict], median_duration: float
) -> None:
    """Make the timestamp-token segment bounds and the word timings agree:
    each bound moves to the nearer word edge unless that would cut more
    than half a second into the adjacent word, in which case the word edge
    moves instead."""
    if (
        segment["start"] < words[0]["end"]
        and segment["start"] - 0.5 > words[0]["start"]
    ):
        words[0]["start"] = max(
            0, min(words[0]["end"] - median_duration, segment["start"])
        )
    else:
        segment["start"] = words[0]["start"]

    if (
        segment["end"] > words[-1]["start"]
        and segment["end"] + 0.5 < words[-1]["end"]
    ):
        words[-1]["end"] = max(
            words[-1]["start"] + median_duration, segment["end"]
        )
    else:
        segment["end"] = words[-1]["end"]


def add_word_timestamps(
    *,
    segments: List[dict],
    model_obj,
    tokenizer: Tokenizer,
    mel: jnp.ndarray,
    num_frames: int,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    last_speech_timestamp: float,
    **kwargs,
) -> None:
    """Attach per-word dicts to each segment: DTW alignment, punctuation
    folding, then the plausible-duration reconciliation rules above
    (reference surface: timing.py:279-388)."""
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [t for t in seg["tokens"] if t < tokenizer.eot] for seg in segments
    ]
    text_tokens = [t for seg in text_tokens_per_segment for t in seg]
    alignment = find_alignment(
        model_obj, tokenizer, text_tokens, mel, num_frames, **kwargs
    )
    median_duration, max_duration, observed = _duration_budget(alignment)
    if observed:
        _clip_sentence_boundary_outliers(alignment, max_duration)

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    word_index = 0

    for segment, seg_text_tokens in zip(segments, text_tokens_per_segment):
        # Walk the alignment until this segment's token budget is spent.
        # Entries emptied by merge_punctuations have tokens=[] and count 0
        # here; their tokens are charged to the ABSORBING entry when it is
        # walked (which may sit in the adjacent segment when punctuation
        # merges across a boundary — reference-parity behavior).
        saved_tokens = 0
        words = []
        while word_index < len(alignment) and saved_tokens < len(seg_text_tokens):
            timing = alignment[word_index]
            if timing.word:
                words.append(
                    dict(
                        word=timing.word,
                        start=round(time_offset + timing.start, 2),
                        end=round(time_offset + timing.end, 2),
                        probability=timing.probability,
                    )
                )
            saved_tokens += len(timing.tokens)
            word_index += 1

        if len(words) > 0:
            _shorten_first_word_after_pause(
                words, last_speech_timestamp, median_duration, max_duration
            )
            _reconcile_segment_bounds(segment, words, median_duration)
            last_speech_timestamp = segment["end"]

        segment["words"] = words

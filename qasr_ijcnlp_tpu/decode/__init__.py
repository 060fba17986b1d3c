"""Decoding API: options, results, language detection, and decode().

Host-side orchestration over the jitted loops in decode/loop.py; the public
surface mirrors the reference (whisper/decoding.py:80-127, 792-826) so
downstream code and CLIs are drop-in compatible.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field, replace
from typing import Dict, Iterable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import CHUNK_LENGTH
from ..models import whisper as model
from ..tokenizer import Tokenizer, get_tokenizer
from ..utils import compression_ratio
from . import loop as _loop
from .filters import build_config


class Draft:
    """Handle pairing a DRAFT model with the speculation width ``gamma``
    for speculative greedy decoding (decode/speculative.py).

    ``model=None`` selects model-free PROMPT-LOOKUP drafting: proposals are
    copied from the row's own token history (prompt + committed tokens)
    instead of a second model — zero extra weights, wins on repetitive
    text, still token-exact.

    A plain class (identity hash/eq) rather than a dataclass so that a
    DecodingOptions carrying one stays hashable for the per-model task
    cache; two Draft objects are interchangeable only if they are the same
    object, which is exactly the task-cache granularity we want (the wrapped
    model's params may be swapped in place).
    """

    __slots__ = ("model", "gamma")

    def __init__(self, model=None, gamma: int = 4):
        if gamma < 1:
            raise ValueError("draft gamma must be >= 1")
        self.model = model
        self.gamma = int(gamma)


@dataclass(frozen=True)
class DecodingOptions:
    """Mirror of the reference options (decoding.py:80-114)."""

    task: str = "transcribe"
    language: Optional[str] = None

    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None

    length_penalty: Optional[float] = None

    prompt: Optional[Union[str, List[int]]] = None
    prefix: Optional[Union[str, List[int]]] = None

    suppress_tokens: Optional[Union[str, Iterable[int]]] = "-1"
    suppress_blank: bool = True

    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0

    # On TPU "fp16" selects bfloat16 (the native half precision); fp32 off it.
    fp16: bool = True

    # Perf opt-in: int8-quantized cross-attention K/V cache via the fused
    # Pallas decode kernel (ops/decode_attn.py).  Halves the decode loop's
    # dominant HBM stream; int8 rounding perturbs logits ~1e-2, so tokens
    # are not guaranteed identical to the fp path.
    kv_int8: bool = False

    # Perf opt-in: speculative greedy decoding (decode/speculative.py).
    # ``Draft(small_model, gamma)`` makes the draft model propose gamma
    # tokens per round; the target verifies them in ONE slab forward, so
    # committed tokens cost ~1/acceptance-rate fewer weight+KV HBM streams.
    # Token-exact vs plain greedy.  Engages only when temperature == 0 with
    # no beam/best_of and the decode input is a mel (both encoders run
    # inside the decode program); other configurations fall back silently.
    draft: Optional[Draft] = None

    # Perf opt-in: trim conditioning prompts to a multiple of this many
    # tokens so the jitted decode loop sees a bounded set of shape signatures
    # (each distinct prompt length is a fresh XLA compile).  Dropping the
    # OLDEST prompt tokens only shortens context but can change long-form
    # transcripts; the default None keeps exact reference prompt handling
    # (whisper/transcribe.py:288-293).  The transcribe CLI exposes this as
    # --prompt_bucket.
    prompt_bucket: Optional[int] = None


class _LazyFeaturesRow:
    """One row of a batched on-device feature array, materialized lazily.

    The reference returns a tensor per result (decoding.py:117-127).  Eagerly
    copying (B, 1500, D) to the host would tax every decode call; indexing
    the device array per row would pay one transfer per item.  This holder
    converts the WHOLE batch once, on first host access from any row, and
    shares it across the batch's results.
    """

    __slots__ = ("_batch", "_index", "_cell")

    def __init__(self, batch, index: int, cell: list):
        self._batch = batch
        self._index = index
        self._cell = cell  # shared [host_batch or None]

    def _host(self) -> np.ndarray:
        if self._cell[0] is None:
            self._cell[0] = np.asarray(self._batch)
        return self._cell[0][self._index]

    def __array__(self, dtype=None, copy=None):
        arr = self._host()
        return arr.astype(dtype) if dtype is not None else arr

    def __getitem__(self, key):
        return self._host()[key]

    def __len__(self):
        # answerable from metadata — must not force the device->host fetch
        return int(self._batch.shape[1])

    def device_row(self):
        """This row as a DEVICE array (no host round trip) — for consumers
        feeding the features back into jitted code, e.g. word-timing
        alignment reusing the window's decode features."""
        return self._batch[self._index]

    @property
    def shape(self):
        return tuple(self._batch.shape[1:])

    @property
    def dtype(self):
        return self._batch.dtype


def _lazy_rows(batch, n: int) -> List[_LazyFeaturesRow]:
    cell = [None]
    return [_LazyFeaturesRow(batch, i, cell) for i in range(n)]


@dataclass(frozen=True)
class DecodingResult:
    audio_features: Optional[np.ndarray]
    language: str
    language_probs: Optional[Dict[str, float]] = None
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


def _compute_dtype(fp16: bool) -> str:
    if not fp16:
        return "float32"
    return "bfloat16" if jax.default_backend() == "tpu" else "float32"


@functools.partial(
    jax.jit, static_argnames=("dims", "compute_dtype", "mesh")
)
def _encode_mel(params, mel, dims, compute_dtype, mesh=None):
    return model.dispatch_encoder_apply(
        params["encoder"], mel, dims, jnp.dtype(compute_dtype), mesh=mesh,
    )


def _audio_features(model_obj, mel: jnp.ndarray, fp16: bool) -> jnp.ndarray:
    dims = model_obj.dims
    if mel.shape[-2:] == (dims.n_audio_ctx, dims.n_audio_state):
        return mel  # already encoded
    return _encode_mel(
        model_obj.params, mel, dims, _compute_dtype(fp16),
        mesh=getattr(model_obj, "mesh", None),
    )


@functools.partial(jax.jit, static_argnames=("dims", "mask_key"))
def _lang_logits(params, audio_features, sot: int, dims, mask_key, mask):
    B = audio_features.shape[0]
    x = jnp.full((B, 1), sot, jnp.int32)
    logits = model.decoder_apply(params["decoder"], x, audio_features, dims)[:, 0]
    return jnp.where(mask, logits, -jnp.inf)


def detect_language(
    model_obj, mel, tokenizer: Optional[Tokenizer] = None
) -> Tuple[np.ndarray, List[Dict[str, float]]]:
    """Most probable language token + per-language probabilities.

    Reference: whisper/decoding.py:18-77.
    """
    if tokenizer is None:
        tokenizer = get_tokenizer(
            model_obj.is_multilingual, num_languages=model_obj.num_languages
        )
    if (
        tokenizer.language is None
        or tokenizer.language_token not in tokenizer.sot_sequence
    ):
        raise ValueError(
            "This model doesn't have language tokens so it can't perform lang id"
        )

    mel = jnp.asarray(mel)
    single = mel.ndim == 2
    if single:
        mel = mel[None]
    xa = _audio_features(model_obj, mel, fp16=True)

    mask = np.zeros(model_obj.dims.n_vocab, bool)
    mask[list(tokenizer.all_language_tokens)] = True
    logits = _lang_logits(
        model_obj.params, xa, tokenizer.sot, model_obj.dims,
        "langs", jnp.asarray(mask),
    )
    language_tokens = np.asarray(jnp.argmax(logits, axis=-1))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    language_probs = [
        {
            c: float(probs[i, j])
            for j, c in zip(tokenizer.all_language_tokens, tokenizer.all_language_codes)
        }
        for i in range(mel.shape[0])
    ]
    if single:
        return language_tokens[0], language_probs[0]
    return language_tokens, language_probs


def _cut_at_eot(seq, sample_begin: int, eot: int) -> List[int]:
    """Sampled-region tokens up to (excluding) the first eot.  numpy cut +
    .tolist(): ~3x faster than Python list/index per row."""
    s = np.asarray(seq)[sample_begin:]
    hits = np.nonzero(s == eot)[0]
    return s[: hits[0]].tolist() if hits.size else s.tolist()


def finalize_beam_group(fin_toks_g, fin_scores_g, fin_count_g: int,
                        beams_g, beam_scores_g, K: int, eot: int):
    """Reference BeamSearchDecoder.finalize (decoding.py:384-404) for ONE
    audio/request: the bounded finished set, topped up with the best
    unfinished beams (eot appended) when fewer than beam_size finished.
    Shared by the batch task (_run_beam) and the engine's beam retirement —
    the parity-critical math must not fork."""
    seqs = [list(fin_toks_g[c]) for c in range(fin_count_g)]
    scores = [float(fin_scores_g[c]) for c in range(fin_count_g)]
    if len(seqs) < K:
        for j in np.argsort(beam_scores_g)[::-1]:
            seqs.append(list(beams_g[j]) + [eot])
            scores.append(float(beam_scores_g[j]))
            if len(seqs) >= K:
                break
    return seqs, scores


def rank_group(sliced: List[List[int]], scores: List[float],
               length_penalty: Optional[float]) -> int:
    """MaximumLikelihoodRanker for one group (reference decoding.py:190-213):
    index of the best candidate under the length penalty."""

    def _score(lp, length):
        if length_penalty is None:
            penalty = length
        else:
            penalty = ((5 + length) / 6) ** length_penalty
        return lp / penalty

    return int(
        np.argmax([_score(p, len(t)) for p, t in zip(scores, sliced)])
    )


class DecodingTask:
    """Host-side planner: resolves options to static loop configs, runs the
    jitted loop, post-processes to DecodingResults."""

    def __init__(self, model_obj, options: DecodingOptions):
        self.model = model_obj
        language = options.language or "en"
        self.tokenizer = get_tokenizer(
            model_obj.is_multilingual,
            num_languages=model_obj.num_languages,
            language=language,
            task=options.task,
        )
        self.options = self._verify_options(options)

        self.n_group: int = options.beam_size or options.best_of or 1
        self.n_ctx: int = model_obj.dims.n_text_ctx
        self.sample_len: int = options.sample_len or model_obj.dims.n_text_ctx // 2

        self.sot_sequence = self.tokenizer.sot_sequence
        if self.options.without_timestamps:
            self.sot_sequence = self.tokenizer.sot_sequence_including_notimestamps

        self.initial_tokens: Tuple[int, ...] = self._get_initial_tokens()
        self.sample_begin: int = len(self.initial_tokens)
        self.sot_index: int = self.initial_tokens.index(self.tokenizer.sot)

        max_initial_timestamp_index = None
        if not options.without_timestamps and options.max_initial_timestamp:
            precision = CHUNK_LENGTH / model_obj.dims.n_audio_ctx
            max_initial_timestamp_index = round(
                options.max_initial_timestamp / precision
            )

        filters = build_config(
            self.tokenizer,
            model_obj.dims.n_vocab,
            self.sample_begin,
            self._get_suppress_tokens() if options.suppress_tokens else (),
            options.suppress_blank,
            options.without_timestamps,
            max_initial_timestamp_index,
        )
        self.loop_cfg = _loop.LoopConfig(
            dims=model_obj.dims,
            filters=filters,
            sample_begin=self.sample_begin,
            sot_index=self.sot_index,
            sample_len=self.sample_len,
            eot=self.tokenizer.eot,
            timestamp_begin=min(self.tokenizer.timestamp_begin, model_obj.dims.n_vocab),
            no_speech=self.tokenizer.no_speech
            if self.tokenizer.no_speech is not None
            and self.tokenizer.no_speech < model_obj.dims.n_vocab
            else None,
            compute_dtype=_compute_dtype(options.fp16),
            kv_int8=options.kv_int8,
            mesh=getattr(model_obj, "mesh", None),
        )

        self.draft_cfg = None
        self.use_lookup_draft = (
            options.draft is not None and options.draft.model is None
        )
        if options.draft is not None and options.draft.model is not None:
            dd = options.draft.model.dims
            td = model_obj.dims
            if dd.n_vocab != td.n_vocab or dd.n_mels != td.n_mels:
                raise ValueError(
                    f"draft model (vocab {dd.n_vocab}, {dd.n_mels} mels) is "
                    f"incompatible with the target (vocab {td.n_vocab}, "
                    f"{td.n_mels} mels); draft and target must share the "
                    "tokenizer and mel frontend"
                )
            # Same filters/prompt geometry as the target (same tokenizer by
            # the check above); only dims and mesh differ.  kv_int8 stays
            # off for the draft: its cache traffic is already small and the
            # perturbation would cost acceptance.
            self.draft_cfg = self.loop_cfg._replace(
                dims=dd,
                kv_int8=False,
                mesh=getattr(options.draft.model, "mesh", None),
            )
        # Committed-tokens / verify-rounds diagnostic from the last
        # speculative run (mean accepted slab length ~= speedup factor).
        self.last_spec_rounds: Optional[int] = None

    # -- option/prompt resolution (reference decoding.py:572-642) -----------

    def _verify_options(self, options: DecodingOptions) -> DecodingOptions:
        if options.beam_size is not None and options.best_of is not None:
            raise ValueError("beam_size and best_of can't be given together")
        if options.temperature == 0 and options.best_of is not None:
            raise ValueError("best_of with greedy sampling (T=0) is not compatible")
        if options.patience is not None and options.beam_size is None:
            raise ValueError("patience requires beam_size to be given")
        if options.length_penalty is not None and not (
            0 <= options.length_penalty <= 1
        ):
            raise ValueError("length_penalty (alpha) should be a value between 0 and 1")
        return options

    def _get_initial_tokens(self) -> Tuple[int, ...]:
        tokens = list(self.sot_sequence)

        if prefix := self.options.prefix:
            prefix_tokens = (
                self.tokenizer.encode(" " + prefix.strip())
                if isinstance(prefix, str)
                else prefix
            )
            if self.sample_len is not None:
                max_prefix_len = self.n_ctx // 2 - self.sample_len
                prefix_tokens = prefix_tokens[-max_prefix_len:]
            tokens = tokens + prefix_tokens

        if prompt := self.options.prompt:
            prompt_tokens = (
                self.tokenizer.encode(" " + prompt.strip())
                if isinstance(prompt, str)
                else list(prompt)
            )
            prompt_tokens = prompt_tokens[-(self.n_ctx // 2 - 1) :]
            if bucket := self.options.prompt_bucket:
                keep = (len(prompt_tokens) // bucket) * bucket
                prompt_tokens = prompt_tokens[-keep:] if keep else []
            if prompt_tokens:
                tokens = [self.tokenizer.sot_prev] + prompt_tokens + tokens
        if len(tokens) > self.n_ctx:
            # The reference's default sample_len makes max_prefix_len 0, so
            # a prefix is never trimmed ([-0:] is a no-op, decoding.py:
            # 597-598) and an overlong one crashes its positional-embedding
            # lookup.  Same contract here, but fail with a message instead
            # of an opaque XLA shape error out of the jitted loop.
            raise ValueError(
                f"initial tokens (sot sequence + prefix/prompt) are "
                f"{len(tokens)} long, exceeding the decoder context "
                f"{self.n_ctx}; shorten prefix/prompt or pass a sample_len "
                f"below n_text_ctx//2 so the prefix budget is positive"
            )
        return tuple(tokens)

    def _get_suppress_tokens(self) -> Tuple[int, ...]:
        suppress_tokens = self.options.suppress_tokens
        if isinstance(suppress_tokens, str):
            suppress_tokens = [int(t) for t in suppress_tokens.split(",")]
        if -1 in suppress_tokens:
            suppress_tokens = [t for t in suppress_tokens if t >= 0]
            suppress_tokens.extend(self.tokenizer.non_speech_tokens)
        elif suppress_tokens is None or len(suppress_tokens) == 0:
            suppress_tokens = []
        else:
            assert isinstance(suppress_tokens, list), "suppress_tokens must be a list"
            # copy: the extend below must not mutate the caller's
            # DecodingOptions list (the reference aliases it, decoding.py:
            # 615-641 — a repeated-decode leak we do not reproduce)
            suppress_tokens = list(suppress_tokens)

        suppress_tokens.extend(
            [
                self.tokenizer.transcribe,
                self.tokenizer.translate,
                self.tokenizer.sot,
                self.tokenizer.sot_prev,
                self.tokenizer.sot_lm,
            ]
        )
        if self.tokenizer.no_speech is not None:
            suppress_tokens.append(self.tokenizer.no_speech)
        return tuple(sorted(set(t for t in suppress_tokens if t < self.model.dims.n_vocab)))

    # -- ranking (reference MaximumLikelihoodRanker, decoding.py:190-213) ----

    def _rank(self, tokens: List[List[List[int]]], sum_logprobs: List[List[float]]):
        return [
            rank_group(s, p, self.options.length_penalty)
            for s, p in zip(tokens, sum_logprobs)
        ]

    # -- main entry ----------------------------------------------------------

    def run(self, mel: jnp.ndarray) -> List[DecodingResult]:
        tokenizer = self.tokenizer
        n_audio = mel.shape[0]
        opts = self.options
        dims = self.model.dims

        # When the language is known and the input is a raw mel, the encoder
        # runs INSIDE the decode loop's jit (one program, one dispatch - the
        # tunneled device link costs ~25 ms per jitted call).  Language
        # detection needs the features on the host first, so that path keeps
        # the separate encoder call.
        is_mel = mel.shape[-2:] != (dims.n_audio_ctx, dims.n_audio_state)
        fuse_encode = is_mel and opts.language is not None and opts.task != "lang_id"

        audio_features = (
            None if fuse_encode else _audio_features(self.model, mel, opts.fp16)
        )

        # language detection (overwrites the language slot in sot_sequence)
        languages = [opts.language] * n_audio
        language_probs = None
        init = np.tile(np.asarray(self.initial_tokens, np.int32), (n_audio, 1))
        if opts.language is None or opts.task == "lang_id":
            lang_tokens, language_probs = detect_language(
                self.model, audio_features, tokenizer
            )
            languages = [max(p, key=p.get) for p in language_probs]
            if opts.language is None:
                init[:, self.sot_index + 1] = np.asarray(lang_tokens)
        if opts.task == "lang_id":
            rows = _lazy_rows(audio_features, n_audio)
            return [
                DecodingResult(
                    audio_features=rows[i],
                    language=languages[i],
                    language_probs=language_probs[i],
                )
                for i in range(n_audio)
            ]

        # Hypothesis rows are group-major (audio i, group g) = row i*G+g; the
        # audio features stay one-row-per-audio — the loops share the cross-KV
        # across each group instead of replicating it.
        init_rep = (
            init if self.n_group == 1
            else np.repeat(init, self.n_group, axis=0)
        )
        audio_input = mel if fuse_encode else audio_features
        if opts.beam_size is not None:
            out = self._run_beam(audio_input, init_rep, fuse_encode)
        else:
            out = self._run_greedy(audio_input, init_rep, fuse_encode)
        tokens_lists, logprobs_lists, no_speech_probs, audio_features = out

        # slice sampled region and cut at eot (the host post-processing is
        # ~5% of a large-batch decode call)
        eot = tokenizer.eot
        sliced: List[List[List[int]]] = [
            [_cut_at_eot(seq, self.sample_begin, eot) for seq in group]
            for group in tokens_lists
        ]

        selected = self._rank(sliced, logprobs_lists)
        tokens = [g[i] for i, g in zip(selected, sliced)]
        texts = [tokenizer.decode(t).strip() for t in tokens]
        sum_logprobs = [lp[i] for i, lp in zip(selected, logprobs_lists)]
        avg_logprobs = [lp / (len(t) + 1) for t, lp in zip(tokens, sum_logprobs)]

        rows = _lazy_rows(audio_features, n_audio)
        return [
            DecodingResult(
                audio_features=rows[i],
                language=languages[i],
                tokens=tokens[i],
                text=texts[i],
                avg_logprob=float(avg_logprobs[i]),
                no_speech_prob=float(no_speech_probs[i]),
                temperature=opts.temperature,
                compression_ratio=compression_ratio(texts[i]),
            )
            for i in range(n_audio)
        ]

    def _run_greedy(self, audio_input, init_rep, fuse_encode: bool = False):
        n_rep = init_rep.shape[0]
        n_audio = n_rep // self.n_group
        greedy = self.options.temperature == 0 and self.n_group == 1
        # A model draft needs its own encoder features, so the input must be
        # the mel (the language-detection path pre-encodes the target's
        # features and falls back to plain greedy); lookup drafting has no
        # second encoder and works on either input.
        use_spec = self.draft_cfg is not None and greedy and fuse_encode
        use_lookup = self.use_lookup_draft and greedy
        if use_spec or use_lookup:
            from .speculative import lookup_greedy_decode, spec_greedy_decode

            if use_lookup:
                buf, cur_len, sum_lp, no_speech, xa, rounds = (
                    lookup_greedy_decode(
                        self.model.params,
                        self.loop_cfg,
                        audio_input,
                        jnp.asarray(init_rep),
                        gamma=self.options.draft.gamma,
                        encode=fuse_encode,
                    )
                )
            else:
                buf, cur_len, sum_lp, no_speech, xa, rounds = (
                    spec_greedy_decode(
                        self.model.params,
                        self.options.draft.model.params,
                        self.loop_cfg,
                        self.draft_cfg,
                        audio_input,
                        jnp.asarray(init_rep),
                        gamma=self.options.draft.gamma,
                    )
                )
            buf, sum_lp, no_speech, rounds = jax.device_get(
                (buf, sum_lp, no_speech, rounds)
            )
            self.last_spec_rounds = int(rounds)
            no_speech = no_speech[:: self.n_group]
            tokens_lists = [[buf[i]] for i in range(n_audio)]
            logprob_lists = [[float(sum_lp[i])] for i in range(n_audio)]
            return tokens_lists, logprob_lists, no_speech, xa

        rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        buf, cur_len, sum_lp, no_speech, xa = _loop.greedy_decode(
            self.model.params,
            self.loop_cfg,
            audio_input,
            jnp.asarray(init_rep),
            rng,
            float(self.options.temperature),
            encode=fuse_encode,
        )
        # One batched device->host fetch (per-array np.asarray costs a round
        # trip each over a tunneled device link).
        buf, sum_lp, no_speech = jax.device_get((buf, sum_lp, no_speech))
        no_speech = no_speech[:: self.n_group]
        tokens_lists = [
            [buf[i * self.n_group + g] for g in range(self.n_group)]
            for i in range(n_audio)
        ]
        logprob_lists = [
            [float(sum_lp[i * self.n_group + g]) for g in range(self.n_group)]
            for i in range(n_audio)
        ]
        return tokens_lists, logprob_lists, no_speech, xa

    def _run_beam(self, audio_input, init_rep, fuse_encode: bool = False):
        K = self.options.beam_size
        patience = self.options.patience or 1.0
        C = max(round(K * patience), 1)
        beams, beam_scores, fin_toks, fin_scores, fin_count, no_speech, xa = (
            _loop.beam_decode(
                self.model.params,
                self.loop_cfg,
                audio_input,
                jnp.asarray(init_rep),
                K,
                C,
                encode=fuse_encode,
            )
        )
        beams, beam_scores, fin_toks, fin_scores, fin_count, no_speech = (
            jax.device_get(
                (beams, beam_scores, fin_toks, fin_scores, fin_count, no_speech)
            )
        )

        tokens_lists, logprob_lists = [], []
        for b in range(beams.shape[0]):
            seqs, scores = finalize_beam_group(
                fin_toks[b], fin_scores[b], int(fin_count[b]),
                beams[b], beam_scores[b], K, self.tokenizer.eot,
            )
            tokens_lists.append(seqs)
            logprob_lists.append(scores)
        return tokens_lists, logprob_lists, no_speech, xa


# DecodingTask construction builds vocab-size filter masks on the host;
# reuse tasks across calls with identical (model, options).  The cache lives
# ON the model object, so it dies with the model — a global cache keyed by
# id(model) could serve a stale task (wrong dims/filters) to a new model
# that happens to land at a recycled address.  Options with list-valued
# prompt/prefix are unhashable - those build fresh.
_TASK_CACHE_ATTR = "_qasr_task_cache"


def _get_task(model_obj, options: DecodingOptions) -> "DecodingTask":
    try:
        cache = getattr(model_obj, _TASK_CACHE_ATTR, None)
        if cache is None:
            cache = {}
            setattr(model_obj, _TASK_CACHE_ATTR, cache)
        task = cache.get(options)
        if task is None:
            task = DecodingTask(model_obj, options)
            if len(cache) < 64:
                cache[options] = task
        return task
    except (TypeError, AttributeError):  # unhashable options / frozen model
        return DecodingTask(model_obj, options)


def decode(
    model_obj,
    mel,
    options: DecodingOptions = DecodingOptions(),
    **kwargs,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30-second mel segment(s) (reference decoding.py:792-826)."""
    mel = jnp.asarray(mel)
    if single := mel.ndim == 2:
        mel = mel[None]
    if kwargs:
        options = replace(options, **kwargs)
    result = _get_task(model_obj, options).run(mel)
    return result[0] if single else result

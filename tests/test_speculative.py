"""Speculative greedy decoding: token-EXACT vs the plain greedy loop.

The reference has no speculative decoding (whisper/decoding.py decodes one
token per forward); this is a beyond-reference capability, so the contract
under test is INTERNAL exactness: for any draft model, spec_greedy_decode
must emit exactly the token sequence (and scores) the target's own greedy
decode emits.  A weak draft may be slow; it must never be wrong.

Also covers the two primitives the path added:
* models/whisper.py decoder_step(offsets=...) — per-row KV-cache write
  positions with position-masked rewind,
* decode/filters.py apply_filters with a per-row ``cur_len``.
"""

import dataclasses

import numpy as np
import pytest

import jax

import jax.numpy as jnp

from qasr_ijcnlp_tpu.models import ModelDimensions
from qasr_ijcnlp_tpu.models.whisper import (
    decoder_step,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)

DIMS = ModelDimensions(
    n_mels=80,
    n_audio_ctx=50,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=51865,
    n_text_ctx=48,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)


def _decoder_setup(seed, B=3, Ta=None, dims=DIMS):
    rng = np.random.default_rng(seed)
    params = init_params(jax.random.PRNGKey(seed), dims)["decoder"]
    xa = jnp.asarray(
        rng.standard_normal(
            (B, Ta or dims.n_audio_ctx, dims.n_audio_state)
        ).astype(np.float32)
    )
    cache = init_kv_cache(dims, B, jnp.float32)
    cache = precompute_cross_kv(params, xa, cache, n_head=dims.n_text_head)
    return params, cache, rng


class TestDecoderStepOffsets:
    def test_uniform_offsets_match_scalar_path(self):
        """offsets filled with the scalar idx reproduce the scalar path."""
        params, cache, rng = _decoder_setup(0)
        B = 3
        prompt = jnp.asarray(rng.integers(0, 1000, (B, 4)), jnp.int32)
        logits_s, cache_s = decoder_step(params, prompt, cache, DIMS)
        off = jnp.zeros((B,), jnp.int32)
        logits_o, cache_o = decoder_step(
            params, prompt, cache, DIMS, offsets=off
        )
        np.testing.assert_allclose(logits_o, logits_s, atol=1e-5)
        for l in range(DIMS.n_text_layer):
            np.testing.assert_allclose(
                cache_o["self_k"][l], cache_s["self_k"][l], atol=1e-6
            )
        # scalar idx advances only on the scalar path
        assert int(cache_s["idx"]) == 4
        assert int(cache_o["idx"]) == 0

        # one more step from position 4, both ways
        tok = jnp.asarray(rng.integers(0, 1000, (B, 1)), jnp.int32)
        l_s, _ = decoder_step(params, tok, cache_s, DIMS)
        l_o, _ = decoder_step(
            params, tok, cache_o, DIMS, offsets=jnp.full((B,), 4, jnp.int32)
        )
        np.testing.assert_allclose(l_o, l_s, atol=1e-5)

    def test_ragged_offsets_match_per_row_replay(self):
        """Rows at different positions equal each row decoded alone."""
        params, cache, rng = _decoder_setup(1)
        B = 3
        lens = [2, 5, 3]  # per-row committed prefix lengths
        prefixes = [
            jnp.asarray(rng.integers(0, 1000, (1, n)), jnp.int32)
            for n in lens
        ]
        # Batched: feed each row its prefix in two chunks with per-row
        # offsets (padding rows shorter than the chunk is exercised by the
        # ragged second chunk).
        slab1 = jnp.concatenate(
            [jnp.pad(p[:, :2], ((0, 0), (0, max(0, 2 - p.shape[1])))) for p in prefixes]
        )
        off0 = jnp.zeros((B,), jnp.int32)
        _, cache_b = decoder_step(params, slab1, cache, DIMS, offsets=off0)
        # second chunk: rows 1 and 2 continue; row 0 re-feeds a dummy at its
        # own offset (overwrites nothing it needs — mimics a rejected draft)
        slab2 = jnp.stack(
            [
                jnp.pad(p[0, 2:], (0, 3 - max(0, p.shape[1] - 2)))
                for p in prefixes
            ]
        ).astype(jnp.int32)
        off1 = jnp.asarray([2, 2, 2], jnp.int32)
        _, cache_b = decoder_step(params, slab2, cache_b, DIMS, offsets=off1)
        # Now query one fresh token per row at each row's TRUE offset; rows
        # whose ragged tail wrote garbage past their true length must not see
        # it (position mask) — this is the rewind mechanism.
        q = jnp.asarray(rng.integers(0, 1000, (B, 1)), jnp.int32)
        logits_b, _ = decoder_step(
            params, q, cache_b, DIMS, offsets=jnp.asarray(lens, jnp.int32)
        )

        for b, n in enumerate(lens):
            params_r, cache_r, _ = _decoder_setup(1, B=3)
            # replay row b alone through the scalar path
            cache_1 = {
                "idx": cache_r["idx"],
                "self_k": [k[b : b + 1] for k in cache_r["self_k"]],
                "self_v": [v[b : b + 1] for v in cache_r["self_v"]],
                "cross_k": [k[b : b + 1] for k in cache_r["cross_k"]],
                "cross_v": [v[b : b + 1] for v in cache_r["cross_v"]],
            }
            _, cache_1 = decoder_step(params_r, prefixes[b], cache_1, DIMS)
            logits_1, _ = decoder_step(params_r, q[b : b + 1], cache_1, DIMS)
            np.testing.assert_allclose(
                logits_b[b : b + 1], logits_1, atol=2e-5
            )


class TestPerRowFilters:
    def test_per_row_cur_len_matches_scalar(self):
        from qasr_ijcnlp_tpu.decode.filters import apply_filters
        from qasr_ijcnlp_tpu.decode import DecodingTask, DecodingOptions
        from qasr_ijcnlp_tpu.models import WhisperModel

        model = WhisperModel(init_params(jax.random.PRNGKey(2), DIMS), DIMS, name="t")
        task = DecodingTask(model, DecodingOptions(language="en", fp16=False))
        cfg = task.loop_cfg.filters

        rng = np.random.default_rng(3)
        B = 4
        logits = jnp.asarray(
            rng.standard_normal((B, DIMS.n_vocab)).astype(np.float32)
        )
        last = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
        prev = jnp.asarray(rng.integers(0, 1000, (B,)), jnp.int32)
        max_ts = jnp.asarray(
            [0, cfg and task.loop_cfg.timestamp_begin + 3, 0, 0], jnp.int32
        )
        cur = jnp.asarray(
            [task.sample_begin, task.sample_begin + 2,
             task.sample_begin + 5, task.sample_begin + 1],
            jnp.int32,
        )
        out_rows = apply_filters(cfg, logits, cur, last, prev, max_ts)
        for b in range(B):
            out_b = apply_filters(
                cfg,
                logits[b : b + 1],
                cur[b],
                last[b : b + 1],
                prev[b : b + 1],
                max_ts[b : b + 1],
            )
            np.testing.assert_array_equal(
                np.asarray(out_rows[b : b + 1]), np.asarray(out_b)
            )


class TestSpecDecodeParity:
    @pytest.fixture(scope="class")
    def target(self):
        from qasr_ijcnlp_tpu.models import WhisperModel

        return WhisperModel(init_params(jax.random.PRNGKey(7), DIMS), DIMS, name="target")

    def _mel(self, batch=2, seed=11):
        rng = np.random.default_rng(seed)
        return rng.standard_normal(
            (batch, 80, DIMS.n_audio_ctx * 2)
        ).astype(np.float32)

    def _decode(self, model, mel, draft=None, **kw):
        from qasr_ijcnlp_tpu.decode import DecodingOptions, decode

        return decode(
            model, mel,
            DecodingOptions(fp16=False, language="en", draft=draft, **kw),
        )

    @pytest.mark.parametrize("without_timestamps", [True, False])
    def test_self_draft_exact(self, target, without_timestamps):
        """Draft == target: every proposal accepted, full-slab commits; the
        output must equal plain greedy token-for-token."""
        from qasr_ijcnlp_tpu.decode import Draft, _get_task, DecodingOptions

        mel = self._mel(batch=2, seed=13)
        base = self._decode(
            target, mel, without_timestamps=without_timestamps
        )
        draft = Draft(target, gamma=3)
        spec = self._decode(
            target, mel, draft=draft, without_timestamps=without_timestamps
        )
        for b, s in zip(base, spec):
            assert list(s.tokens) == list(b.tokens)
            assert s.text == b.text
            np.testing.assert_allclose(s.avg_logprob, b.avg_logprob, atol=1e-4)
            np.testing.assert_allclose(
                s.no_speech_prob, b.no_speech_prob, atol=1e-5
            )
        # acceptance diagnostic: all proposals accepted => rounds well under
        # the emitted token count
        task = _get_task(
            target,
            DecodingOptions(
                fp16=False, language="en", draft=draft,
                without_timestamps=without_timestamps,
            ),
        )
        n_toks = max(len(r.tokens) for r in spec) + 1  # + eot
        assert task.last_spec_rounds is not None
        assert task.last_spec_rounds <= -(-n_toks // 1)  # ran
        if n_toks > 8:
            assert task.last_spec_rounds < n_toks

    @pytest.mark.parametrize("gamma", [1, 4])
    def test_weak_draft_exact(self, target, gamma):
        """A DIFFERENT random model drafts: near-zero acceptance exercises
        the mismatch/correction path; output must still be exact."""
        from qasr_ijcnlp_tpu.decode import Draft
        from qasr_ijcnlp_tpu.models import WhisperModel

        draft_model = WhisperModel(
            init_params(jax.random.PRNGKey(99), DIMS), DIMS, name="draft"
        )
        mel = self._mel(batch=3, seed=17)
        base = self._decode(target, mel)
        spec = self._decode(target, mel, draft=Draft(draft_model, gamma=gamma))
        for b, s in zip(base, spec):
            assert list(s.tokens) == list(b.tokens)
            np.testing.assert_allclose(s.avg_logprob, b.avg_logprob, atol=1e-4)

    def test_smaller_draft_dims_exact(self, target):
        """Production shape: a narrower/shallower draft model."""
        from qasr_ijcnlp_tpu.decode import Draft
        from qasr_ijcnlp_tpu.models import WhisperModel

        small = dataclasses.replace(DIMS, 
            n_audio_state=32, n_audio_head=2, n_audio_layer=1,
            n_text_state=32, n_text_head=2, n_text_layer=1,
        )
        draft_model = WhisperModel(
            init_params(jax.random.PRNGKey(5), small), small, name="draft-small"
        )
        mel = self._mel(batch=2, seed=23)
        base = self._decode(target, mel)
        spec = self._decode(target, mel, draft=Draft(draft_model, gamma=2))
        for b, s in zip(base, spec):
            assert list(s.tokens) == list(b.tokens)

    def test_incompatible_draft_raises(self, target):
        from qasr_ijcnlp_tpu.decode import Draft

        bad = dataclasses.replace(DIMS, n_vocab=51864)
        from qasr_ijcnlp_tpu.models import WhisperModel

        dm = WhisperModel(init_params(jax.random.PRNGKey(1), bad), bad, name="bad")
        with pytest.raises(ValueError, match="incompatible"):
            self._decode(target, self._mel(1), draft=Draft(dm))

    def test_temperature_falls_back(self, target):
        """t>0 silently uses the sampling loop (spec path is greedy-only)."""
        from qasr_ijcnlp_tpu.decode import Draft

        res = self._decode(
            target, self._mel(1), draft=Draft(target), temperature=0.7,
        )
        assert res[0].temperature == 0.7


def test_transcribe_threads_draft_exactly():
    """transcribe(..., draft=...) routes every greedy window through the
    speculative path and produces the identical transcript structure."""
    import jax

    from qasr_ijcnlp_tpu.decode import Draft
    from qasr_ijcnlp_tpu.models import WhisperModel
    from qasr_ijcnlp_tpu.models.whisper import init_params as _ip
    from qasr_ijcnlp_tpu.transcribe import transcribe

    # transcribe feeds 30 s windows, so the encoder needs the full 1500-frame
    # context; widths stay narrow for CPU speed
    dims = dataclasses.replace(DIMS, n_audio_ctx=1500, n_text_ctx=448)
    model = WhisperModel(_ip(jax.random.PRNGKey(7), dims), dims, name="t")

    rng = np.random.default_rng(0)
    t = np.arange(int(4.0 * 16000)) / 16000.0
    audio = (
        0.1 * np.sin(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 0.7 * t)) * t)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)

    kw = dict(
        language="en",
        temperature=0.0,
        sample_len=12,
        no_speech_threshold=None,
        logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    base = transcribe(model, audio, **kw)
    spec = transcribe(model, audio, draft=Draft(model, gamma=2), **kw)
    assert spec["text"] == base["text"]
    assert [s["tokens"] for s in spec["segments"]] == [
        s["tokens"] for s in base["segments"]
    ]


class TestLookupDraft:
    """Model-free prompt-lookup drafting (Draft(None)): same exactness
    contract, zero extra weights."""

    @pytest.fixture(scope="class")
    def target(self):
        from qasr_ijcnlp_tpu.models import WhisperModel

        return WhisperModel(
            init_params(jax.random.PRNGKey(7), DIMS), DIMS, name="target"
        )

    def _mel(self, batch, seed):
        rng = np.random.default_rng(seed)
        return rng.standard_normal(
            (batch, 80, DIMS.n_audio_ctx * 2)
        ).astype(np.float32)

    @pytest.mark.parametrize("gamma", [1, 3])
    def test_lookup_exact(self, target, gamma):
        from qasr_ijcnlp_tpu.decode import DecodingOptions, Draft, decode

        mel = self._mel(3, 31)
        base = decode(
            target, mel, DecodingOptions(fp16=False, language="en")
        )
        spec = decode(
            target, mel,
            DecodingOptions(
                fp16=False, language="en", draft=Draft(None, gamma=gamma)
            ),
        )
        for b, s in zip(base, spec):
            assert list(s.tokens) == list(b.tokens)
            np.testing.assert_allclose(s.avg_logprob, b.avg_logprob, atol=1e-4)

    def test_lookup_accelerates_repetitive_rows(self, target):
        """Random-weight greedy decodes loop on repeated n-grams — exactly
        the case lookup drafting must exploit: fewer verify rounds than
        emitted tokens."""
        from qasr_ijcnlp_tpu.decode import (
            DecodingOptions, Draft, _get_task, decode,
        )

        mel = self._mel(2, 33)
        opts = DecodingOptions(
            fp16=False, language="en", draft=Draft(None, gamma=4),
            sample_len=32,
        )
        res = decode(target, mel, opts)
        task = _get_task(target, opts)
        n_toks = max(len(r.tokens) for r in res) + 1
        assert task.last_spec_rounds is not None and task.last_spec_rounds > 0
        if n_toks >= 24:  # long, looping output: copying must pay off
            assert task.last_spec_rounds < n_toks, (
                task.last_spec_rounds, n_toks,
            )

    def test_lookup_propose_copies_after_bigram(self):
        from qasr_ijcnlp_tpu.decode.speculative import _lookup_propose

        # row 0: ... 5 6 7 8 ... anchor=5 prev=4 at f=8 with earlier
        # "4 5 6 7" at 1..4 -> proposals copy 6 7 8
        buf = jnp.asarray(
            [[9, 4, 5, 6, 7, 8, 3, 4, 5, 0, 0, 0]], jnp.int32
        )
        f = jnp.asarray([8], jnp.int32)
        anchor = jnp.asarray([5], jnp.int32)
        prev = jnp.asarray([4], jnp.int32)
        props = _lookup_propose(buf, f, anchor, prev, 3)
        got = [int(p[0]) for p in props]
        assert got == [6, 7, 8], got

    def test_lookup_propose_fallbacks(self):
        from qasr_ijcnlp_tpu.decode.speculative import _lookup_propose

        # no bigram match, unigram match at 2 -> copies from 3
        buf = jnp.asarray([[9, 1, 5, 6, 7, 8, 2, 3, 5, 0, 0, 0]], jnp.int32)
        props = _lookup_propose(
            buf, jnp.asarray([8]), jnp.asarray([5]), jnp.asarray([3]), 2
        )
        assert [int(p[0]) for p in props] == [6, 7]
        # no match at all -> repeats the anchor
        buf2 = jnp.asarray([[9, 1, 2, 3, 4, 0, 0, 0]], jnp.int32)
        props2 = _lookup_propose(
            buf2, jnp.asarray([4]), jnp.asarray([4]), jnp.asarray([3]), 2
        )
        assert [int(p[0]) for p in props2] == [4, 4]

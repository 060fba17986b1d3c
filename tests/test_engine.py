"""Continuous-batching decode engine (decode/engine.py).

Contract: every request's tokens equal the plain greedy decode of that
request alone, regardless of what else shares the slot pool or when it was
admitted.  Also exercises slot reuse (more requests than slots) and
mid-flight admission.
"""

import threading

import numpy as np
import pytest

import jax

from qasr_ijcnlp_tpu.models import ModelDimensions, WhisperModel
from qasr_ijcnlp_tpu.models.whisper import init_params

DIMS = ModelDimensions(
    n_mels=80, n_audio_ctx=50, n_audio_state=64, n_audio_head=2,
    n_audio_layer=2, n_vocab=51865, n_text_ctx=48, n_text_state=64,
    n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def model():
    return WhisperModel(
        init_params(jax.random.PRNGKey(7), DIMS), DIMS, name="engine-test"
    )


def _mel(seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((80, DIMS.n_audio_ctx * 2)).astype(np.float32)


def _reference_tokens(model, seeds, **opts):
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode

    mels = np.stack([_mel(s) for s in seeds])
    results = decode(
        model, mels,
        DecodingOptions(fp16=False, language="en", **opts),
    )
    return {s: list(r.tokens) for s, r in zip(seeds, results)}


def test_engine_matches_plain_greedy(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    seeds = [11, 12, 13, 14, 15]
    # per-request reference: decode each alone (batch of 1)
    expected = {}
    for s in seeds:
        expected.update(_reference_tokens(model, [s], sample_len=16))

    engine = DecodeEngine(
        model,
        DecodingOptions(fp16=False, language="en", sample_len=16),
        slots=3, unroll=2, admit_width=2,
    )
    try:
        results = {}
        errors = []

        def worker(s):
            try:
                results[s] = engine.submit(_mel(s), timeout=300)
            except Exception as e:  # noqa: BLE001
                errors.append((s, e))

        threads = [
            threading.Thread(target=worker, args=(s,)) for s in seeds
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        for s in seeds:
            assert results[s]["tokens"] == expected[s], s
            assert isinstance(results[s]["text"], str)
        # 5 requests through 3 slots with admit_width 2 cannot fit in one
        # admission: mid-flight admission must have happened
        assert engine.admit_calls >= 2
    finally:
        engine.close()


def test_engine_slot_reuse_sequential(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    engine = DecodeEngine(
        model,
        DecodingOptions(fp16=False, language="en", sample_len=10),
        slots=2, unroll=2, admit_width=1,
    )
    try:
        for s in (21, 22, 23, 24):
            expected = _reference_tokens(model, [s], sample_len=10)[s]
            out = engine.submit(_mel(s), timeout=300)
            assert out["tokens"] == expected, s
    finally:
        engine.close()


def test_engine_kv_int8_matches_batch_int8(model):
    """kv_int8 slot pool: admission quantizes each request's cross-KV with
    the same per-(head, position) scheme the batch decode path uses
    (ops/decode_attn.quantize_kv), so engine tokens equal the batch path's
    kv_int8 tokens per request (int8 vs FP tokens may differ — that is the
    documented kv_int8 trade)."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    seeds = [41, 42, 43]
    expected = {}
    for s in seeds:
        expected.update(
            _reference_tokens(model, [s], sample_len=12, kv_int8=True)
        )

    engine = DecodeEngine(
        model,
        DecodingOptions(
            fp16=False, language="en", sample_len=12, kv_int8=True
        ),
        slots=2, unroll=2, admit_width=2,
    )
    try:
        # int8 buffers actually back the pool
        assert engine.state.cross_sk and engine.state.cross_sv
        assert engine.state.cross_k[0].dtype == np.int8
        for s in seeds:
            out = engine.submit(_mel(s), timeout=300)
            assert out["tokens"] == expected[s], s
    finally:
        engine.close()


def test_engine_rejects_non_greedy(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    with pytest.raises(ValueError, match="temperature 0"):
        DecodeEngine(
            model, DecodingOptions(language="en", temperature=0.5)
        )


def test_engine_close_fails_queued(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", sample_len=8),
        slots=1,
    )
    engine.close()
    with pytest.raises(RuntimeError, match="closed"):
        engine.submit(_mel(30))


def test_engine_language_autodetect_parity(model):
    """language=None on a multilingual model: the engine runs the reference
    language-id protocol per request at admission; tokens AND the reported
    language must match decode(language=None) on the same mel."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    seeds = [31, 32, 33]
    expected = {}
    for s in seeds:
        (r,) = decode(
            model, np.stack([_mel(s)]),
            DecodingOptions(fp16=False, language=None, sample_len=8),
        )
        expected[s] = (list(r.tokens), r.language)

    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language=None, sample_len=8),
        slots=2, unroll=2, admit_width=2,
    )
    assert engine._detect
    try:
        for s in seeds:
            out = engine.submit(_mel(s), timeout=300)
            assert out["tokens"] == expected[s][0], s
            assert out["language"] == expected[s][1], s
    finally:
        engine.close()


def test_engine_lookup_speculative_parity(model):
    """lookup_gamma > 0: each step iteration is a prompt-lookup speculative
    round (up to gamma+1 commits per forward); tokens stay exact vs plain
    greedy through slot reuse and concurrent admission."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    seeds = [51, 52, 53, 54, 55]
    expected = {}
    for s in seeds:
        expected.update(_reference_tokens(model, [s], sample_len=16))

    engine = DecodeEngine(
        model,
        DecodingOptions(fp16=False, language="en", sample_len=16),
        slots=3, unroll=2, admit_width=2, lookup_gamma=3,
    )
    try:
        results = {}
        errors = []

        def worker(s):
            try:
                results[s] = engine.submit(_mel(s), timeout=300)
            except Exception as e:  # noqa: BLE001
                errors.append((s, e))

        threads = [
            threading.Thread(target=worker, args=(s,)) for s in seeds
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        for s in seeds:
            assert results[s]["tokens"] == expected[s], s
    finally:
        engine.close()


def test_engine_admit_failure_fails_request_not_hangs(model):
    """A bad payload (ragged mel) must fail THAT submit() promptly — the
    requests were already dequeued, so nobody else would ever wake them —
    and the pool must keep serving afterwards."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", sample_len=8),
        slots=2, admit_width=1,
    )
    try:
        with pytest.raises(RuntimeError):
            engine.submit(
                np.zeros((80, 7), np.float32), timeout=60
            )  # wrong mel width -> admission raises
        out = engine.submit(_mel(61), timeout=300)  # pool still serves
        assert isinstance(out["tokens"], list)
    finally:
        engine.close()


def test_engine_submit_after_close_race(model):
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", sample_len=4),
        slots=1,
    )
    engine.close()
    with pytest.raises(RuntimeError, match="closed"):
        engine.submit(_mel(62), timeout=30)


def test_engine_data_parallel_mesh_parity(model):
    """mesh= shards the slot pool along the data axis (8 virtual CPU
    devices); tokens stay exact vs plain greedy through mid-flight
    admission and slot reuse."""
    from qasr_ijcnlp_tpu import parallel
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
    seeds = [71, 72, 73, 74, 75, 76, 77, 78, 79, 80]
    expected = {}
    for s in seeds:
        expected.update(_reference_tokens(model, [s], sample_len=12))

    # engine.shard() mutates its model (params placement + pinned mesh);
    # give it its own instance (same init key as the fixture) so the
    # module-scoped fixture stays single-device for later tests.
    mesh_model = WhisperModel(
        init_params(jax.random.PRNGKey(7), DIMS), DIMS, name="engine-mesh"
    )
    engine = DecodeEngine(
        mesh_model,
        DecodingOptions(fp16=False, language="en", sample_len=12),
        slots=8, unroll=2, admit_width=4, mesh=mesh,
    )
    try:
        results = {}
        errors = []

        def worker(s):
            try:
                results[s] = engine.submit(_mel(s), timeout=600)
            except Exception as e:  # noqa: BLE001
                errors.append((s, e))

        threads = [
            threading.Thread(target=worker, args=(s,)) for s in seeds
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errors, errors
        for s in seeds:
            assert results[s]["tokens"] == expected[s], s
    finally:
        engine.close()

    with pytest.raises(ValueError, match="multiple of the mesh"):
        DecodeEngine(
            mesh_model, DecodingOptions(fp16=False, language="en"),
            slots=3, mesh=mesh,
        )


def test_engine_recovers_after_pool_loss(model):
    """A dispatch failure that already consumed the donated slot pool must
    not brick the engine: the worker detects the deleted buffers, rebuilds
    an empty pool, and later submits decode correctly."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions
    from qasr_ijcnlp_tpu.decode.engine import DecodeEngine

    expected = _reference_tokens(model, [33], sample_len=8)[33]
    engine = DecodeEngine(
        model, DecodingOptions(fp16=False, language="en", sample_len=8),
        slots=2,
    )
    try:
        assert engine.submit(_mel(33), timeout=300)["tokens"] == expected
        jax.tree.map(lambda x: x.delete(), engine.state)  # simulate loss
        with pytest.raises((RuntimeError, TimeoutError)):
            engine.submit(_mel(33), timeout=300)
        assert engine.submit(_mel(33), timeout=300)["tokens"] == expected
    finally:
        engine.close()

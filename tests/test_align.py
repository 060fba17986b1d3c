"""Alignment tests: DTW + median filter exactness vs the reference, and
end-to-end find_alignment parity on a shared random tiny model."""

import numpy as np
import pytest

from qasr_ijcnlp_tpu.align import dtw, median_filter
from tests.oracle import reference_whisper


@pytest.fixture(scope="module")
def ref():
    return reference_whisper()


def test_dtw_exact_vs_reference(ref, rng):
    from whisper.timing import dtw_cpu

    for N, M in [(3, 5), (10, 20), (25, 25), (45, 120), (1, 7), (7, 1)]:
        x = rng.standard_normal((N, M)).astype(np.float32)
        ours = dtw(x)
        theirs = dtw_cpu(x.astype(np.float64))
        np.testing.assert_array_equal(ours, theirs, err_msg=f"N={N} M={M}")


def test_dtw_monotone_path(rng):
    x = rng.standard_normal((12, 40)).astype(np.float32)
    ti, fi = dtw(x)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == 11 and fi[-1] == 39
    assert np.all(np.diff(ti) >= 0) and np.all(np.diff(fi) >= 0)
    assert np.all((np.diff(ti) + np.diff(fi)) >= 1)


@pytest.mark.parametrize("width", [3, 5, 7, 13])
@pytest.mark.parametrize("shape", [(10, 30), (2, 5, 50), (4, 1, 8)])
def test_median_filter_vs_reference(ref, rng, width, shape):
    import torch
    from whisper.timing import median_filter as ref_filter

    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(median_filter(x, width))
    theirs = ref_filter(torch.from_numpy(x), width).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_median_filter_short_input_passthrough(rng):
    x = rng.standard_normal((4, 2)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(median_filter(x, 7)), x)


@pytest.fixture(scope="module")
def tiny_pair(ref):
    """Random-weight tiny model in torch and its converted JAX twin."""
    import torch
    from whisper.model import ModelDimensions as RefDims, Whisper as RefWhisper

    from qasr_ijcnlp_tpu.models.convert import from_torch_state_dict
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    dims = tiny_dims()
    torch.manual_seed(0)
    tmodel = RefWhisper(RefDims(**dims.to_dict())).eval()
    with torch.no_grad():
        tmodel.decoder.positional_embedding.normal_(0, 0.02)

    heads = np.zeros((dims.n_text_layer, dims.n_text_head), bool)
    heads[dims.n_text_layer // 2 :] = True
    tmodel.register_buffer(
        "alignment_heads", torch.from_numpy(heads).to_sparse(), persistent=False
    )

    params = from_torch_state_dict(tmodel.state_dict(), dims)
    jmodel = WhisperModel(params, dims, alignment_heads=heads, name="tiny-test")
    return tmodel, jmodel


def test_find_alignment_parity(ref, tiny_pair, rng):
    import torch
    from whisper.timing import find_alignment as ref_find
    from whisper.tokenizer import get_tokenizer as ref_get_tokenizer

    from qasr_ijcnlp_tpu.align import find_alignment
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    tmodel, jmodel = tiny_pair
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    rtok = ref_get_tokenizer(True, num_languages=99, language="en", task="transcribe")

    text_tokens = tok.encode(" my fellow americans ask not what your country")
    mel = rng.standard_normal((80, 3000)).astype(np.float32)
    num_frames = 3000

    theirs = ref_find(tmodel, rtok, text_tokens, torch.from_numpy(mel), num_frames)
    ours = find_alignment(jmodel, tok, text_tokens, mel, num_frames)

    assert [w.word for w in ours] == [w.word for w in theirs]
    ours_probs = np.array([w.probability for w in ours])
    ref_probs = np.array([w.probability for w in theirs])
    np.testing.assert_allclose(ours_probs, ref_probs, atol=1e-3, rtol=1e-2)
    # With random weights the attention matrix is near-noise, so the DTW path
    # has many near-ties and fp-order differences (torch vs XLA matmul) can
    # legally flip a few boundaries.  Require most boundaries to agree; the
    # deterministic DTW core itself is tested exactly above.
    ours_t = np.array([[w.start, w.end] for w in ours])
    ref_t = np.array([[w.start, w.end] for w in theirs])
    diff = np.abs(ours_t - ref_t)
    assert np.median(diff) <= 0.02, diff
    assert np.mean(diff <= 0.04) >= 0.7, diff


def test_alignment_matrix_ignores_padded_token_rows():
    """The z-norm statistics must come from the REAL token rows only: the
    eot padding rows introduced by token-length bucketing used to shift
    every column's mean/std (and hence the DTW cost) whenever T_real was
    not a multiple of 32.  The pipeline must also reproduce the reference
    math (timing.py:207-215) step for step."""
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu import align

    rng = np.random.default_rng(5)
    t_real, nf = 20, 37
    w_real = rng.standard_normal((4, t_real, 64)).astype(np.float32)
    # padding rows filled with huge garbage: must not leak into the output
    w_pad = np.full((4, 32, 64), 1e6, np.float32)
    w_pad[:, :t_real] = w_real

    out = np.asarray(align._alignment_matrix(
        jnp.asarray(w_pad), jnp.float32(1.0), 7, nf, t_real
    ))
    assert out.shape == (t_real, nf)
    assert np.isfinite(out).all()

    # numpy re-derivation of the reference pipeline
    ww = w_real[:, :, :nf]
    e = np.exp(ww - ww.max(-1, keepdims=True))
    sm = e / e.sum(-1, keepdims=True)
    z = (sm - sm.mean(-2, keepdims=True)) / sm.std(-2, keepdims=True)
    filt = np.asarray(align.median_filter(jnp.asarray(z), 7))
    np.testing.assert_allclose(out, filt.mean(0), atol=1e-5, rtol=1e-5)


def test_alignment_matrix_short_window_skips_median_filter():
    """Windows no wider than half the filter pass through unfiltered, like
    the reference's guard (timing.py:22-24), instead of reflect-padding a
    sliver; nf == 0 windows return no timings at all (find_alignment)."""
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu import align

    rng = np.random.default_rng(6)
    w = rng.standard_normal((2, 8, 16)).astype(np.float32)
    out = np.asarray(align._alignment_matrix(
        jnp.asarray(w), jnp.float32(1.0), 7, 3, 8
    ))
    ww = w[:, :, :3]
    e = np.exp(ww - ww.max(-1, keepdims=True))
    sm = e / e.sum(-1, keepdims=True)
    z = (sm - sm.mean(-2, keepdims=True)) / sm.std(-2, keepdims=True)
    np.testing.assert_allclose(out, z.mean(0), atol=1e-5, rtol=1e-5)


def test_find_alignment_sliver_window_returns_empty(tiny_pair):
    """num_frames < 2 leaves zero output frames to align against: return no
    word timings (the reference raises on this edge) instead of crashing
    inside the jitted pipeline."""
    from qasr_ijcnlp_tpu.align import find_alignment
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    _, jmodel = tiny_pair
    tok = get_tokenizer(True, num_languages=99, language="en",
                        task="transcribe")
    out = find_alignment(
        jmodel, tok, tok.encode(" hi"),
        np.zeros((80, 3000), np.float32), num_frames=1,
    )
    assert out == []

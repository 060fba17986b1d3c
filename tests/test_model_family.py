"""Model-family scaling: dims table, forward smoke, and TP sharding for the
larger Whisper sizes (the reference supports tiny..large-v3/turbo via its
registry; our dims/spec rules must hold across the family)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qasr_ijcnlp_tpu.models.dims import dims_for


@pytest.mark.parametrize(
    "name,layers,width,heads,mels,vocab",
    [
        ("tiny", 4, 384, 6, 80, 51865),
        ("tiny.en", 4, 384, 6, 80, 51864),
        ("base", 6, 512, 8, 80, 51865),
        ("small", 12, 768, 12, 80, 51865),
        ("medium", 24, 1024, 16, 80, 51865),
        ("large-v1", 32, 1280, 20, 80, 51865),
        ("large-v2", 32, 1280, 20, 80, 51865),
        ("large-v3", 32, 1280, 20, 128, 51866),
        # the bare alias resolves to the large-v3 checkpoint (registry)
        ("large", 32, 1280, 20, 128, 51866),
        ("turbo", 32, 1280, 20, 128, 51866),
        ("large-v3-turbo", 32, 1280, 20, 128, 51866),
    ],
)
def test_dims_table(name, layers, width, heads, mels, vocab):
    d = dims_for(name)
    assert d.n_audio_layer == layers
    assert d.n_audio_state == width
    assert d.n_audio_head == heads
    assert d.n_mels == mels
    assert d.n_vocab == vocab
    if "turbo" in name:
        assert d.n_text_layer == 4  # distilled decoder
    else:
        assert d.n_text_layer == layers


def test_base_forward_and_tp_sharding():
    """base-size random-init forward, plus the TP specs applied on the mesh -
    the same rules must shard every family member without edits."""
    from qasr_ijcnlp_tpu import parallel
    from qasr_ijcnlp_tpu.models import whisper as jmodel

    dims = dims_for("base")
    # shrink the contexts to keep the smoke fast; widths/heads stay real
    dims = type(dims)(**{**dims.to_dict(), "n_audio_ctx": 32, "n_text_ctx": 16})
    params = jmodel.init_params(jax.random.PRNGKey(0), dims)

    mel = np.random.default_rng(0).standard_normal(
        (2, dims.n_mels, dims.n_audio_ctx * 2)
    ).astype(np.float32)
    tokens = np.random.default_rng(1).integers(0, dims.n_vocab, (2, 5))
    out = jmodel.forward(params, mel, tokens, dims)
    assert out.shape == (2, 5, dims.n_vocab)

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    sp = parallel.shard_params(params, mesh)
    # head dim 512 divides tp=2; vocab 51865 demotes to replicated
    specs = parallel.param_specs(params, mesh)
    assert specs["decoder"]["tok_emb"][0] is None
    assert specs["encoder"]["blocks"]["mlp"]["fc"]["w"][2] == "model"
    mel8 = np.repeat(mel, 4, axis=0)
    tok8 = np.repeat(tokens, 4, axis=0)
    sharded = jmodel.forward(
        sp,
        parallel.shard_batch(jnp.asarray(mel8), mesh),
        parallel.shard_batch(jnp.asarray(tok8), mesh),
        dims,
    )
    base = jmodel.forward(params, mel8, tok8, dims)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(base), atol=2e-4, rtol=1e-4
    )

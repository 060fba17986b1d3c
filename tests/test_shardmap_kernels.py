"""Pallas kernels under multi-device meshes (VERDICT r2 item 1).

Two mechanisms, both exercised on the 8-virtual-device CPU mesh with the
kernels forced ON (interpret mode off-TPU):

* **GSPMD batch partitioning** (ops/partition.py): the fused encoder block /
  conv stem / flash / fused mel are custom_partitioning ops, so a plain jit
  over data-sharded inputs runs each shard's kernel on its local batch — no
  global kernel disable, numerics identical to single-device.
* **Explicit tensor parallelism** (parallel/sharded.py): with a model axis
  > 1 the trunk runs head-sharded under shard_map — the attention kernel per
  shard plus two psums per block — matching the unfused single-device
  encoder to float tolerance, forward and backward.

Dims are chosen to satisfy the kernel gates at test scale: D=256 (dh=64,
4 heads), n_audio_ctx=512 (tile/finish-row aligned).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from qasr_ijcnlp_tpu import parallel
from qasr_ijcnlp_tpu.models import whisper as cmodel
from qasr_ijcnlp_tpu.models.dims import ModelDimensions

DIMS = ModelDimensions(
    n_mels=16, n_audio_ctx=512, n_audio_state=256, n_audio_head=4,
    n_audio_layer=2, n_vocab=128, n_text_ctx=16, n_text_state=256,
    n_text_head=4, n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    return cmodel.init_params(jax.random.PRNGKey(3), DIMS)


@pytest.fixture()
def kernels_on():
    from qasr_ijcnlp_tpu import audio

    old_flash, old_mel = cmodel._USE_FLASH, audio._USE_FUSED_MEL
    cmodel.set_flash_attention(True)
    audio.set_fused_mel(True)
    yield
    cmodel.set_flash_attention(old_flash)
    audio.set_fused_mel(old_mel)


def _mel(batch, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (batch, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)


def test_dims_satisfy_fused_gate():
    from qasr_ijcnlp_tpu.ops.encoder_block import fused_block_applicable

    assert fused_block_applicable(DIMS.n_audio_head, DIMS.n_audio_state, 512)


def test_fused_block_partitions_under_gspmd(params, kernels_on):
    """jit(encoder) over a data-sharded batch runs the fused block per shard
    (custom_partitioning) and matches the kernels-off single-device path."""
    mel = _mel(8)

    cmodel.set_flash_attention(False)
    base = np.asarray(
        jax.jit(
            lambda p, m: cmodel.encoder_apply(p, m, DIMS)
        )(params["encoder"], mel)
    )
    cmodel.set_flash_attention(True)

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
    sp = jax.tree.map(
        lambda x: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        ),
        params["encoder"],
    )
    smel = parallel.shard_batch(jnp.asarray(mel), mesh)
    fn = jax.jit(lambda p, m: cmodel.encoder_apply(p, m, DIMS))
    out = fn(sp, smel)
    # the batch sharding must survive through the kernels (no all-gather of
    # the activations back to replicated)
    assert len(out.sharding.spec) and out.sharding.spec[0] == "data"
    np.testing.assert_allclose(np.asarray(out), base, atol=2e-4, rtol=2e-4)


def test_fused_mel_partitions_under_gspmd(kernels_on):
    from qasr_ijcnlp_tpu import audio

    wav = np.random.default_rng(1).standard_normal((8, 16000)).astype(
        np.float32
    )
    audio.set_fused_mel(False)
    base = np.asarray(audio.log_mel_spectrogram(wav, 80))
    audio.set_fused_mel(True)

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
    swav = parallel.shard_batch(jnp.asarray(wav), mesh)
    out = jax.jit(lambda a: audio.log_mel_spectrogram(a, 80))(swav)
    np.testing.assert_allclose(np.asarray(out), base, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("use_kernel", [True, False])
def test_tp_trunk_matches_single_device(params, use_kernel):
    """The shard_map tensor-parallel trunk (head-sharded attention kernel +
    psum finish) matches the unfused single-device encoder."""
    if use_kernel:
        cmodel.set_flash_attention(True)
    else:
        cmodel.set_flash_attention(False)
    try:
        mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
        assert parallel.sharded.tp_trunk_applicable(DIMS, mesh, 8)
        mel = _mel(8, seed=4)

        base = np.asarray(
            cmodel.encoder_apply(params["encoder"], jnp.asarray(mel), DIMS)
        )

        sp = parallel.shard_params(params, mesh)
        smel = parallel.shard_batch(jnp.asarray(mel), mesh)
        fn = jax.jit(
            lambda p, m: cmodel.encoder_apply(p, m, DIMS, mesh=mesh)
        )
        out = np.asarray(fn(sp["encoder"], smel))
        np.testing.assert_allclose(out, base, atol=5e-4, rtol=5e-4)
    finally:
        cmodel.set_flash_attention(None)


def test_tp_trunk_gradients_match(params):
    """Backward through the shard_map TP trunk (kernel forward, XLA custom
    VJP, psum transposes) agrees with single-device gradients."""
    cmodel.set_flash_attention(True)
    try:
        mesh = parallel.make_mesh(jax.devices()[:4], model_parallel=2)
        mel = _mel(4, seed=5)

        def loss(p, m, mesh=None):
            out = cmodel.encoder_apply(p, m, DIMS, mesh=mesh)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        cmodel.set_flash_attention(False)
        g_base = jax.grad(loss)(params["encoder"], jnp.asarray(mel))
        cmodel.set_flash_attention(True)

        sp = parallel.shard_params(params, mesh)
        smel = parallel.shard_batch(jnp.asarray(mel), mesh)
        g_tp = jax.jit(jax.grad(lambda p, m: loss(p, m, mesh=mesh)))(
            sp["encoder"], smel
        )

        ref_leaves = jax.tree.leaves(g_base)
        tp_leaves = jax.tree.leaves(jax.tree.map(np.asarray, g_tp))
        for a, b in zip(tp_leaves, ref_leaves):
            scale = max(1.0, float(np.max(np.abs(b))))
            np.testing.assert_allclose(
                a / scale, np.asarray(b) / scale, atol=2e-3
            )
    finally:
        cmodel.set_flash_attention(None)


def test_sharded_train_step_with_kernels_on(params):
    """End-to-end sharded training step with kernels forced ON (DP via
    custom_partitioning in fwd, XLA custom-VJP bwd): loss parity with the
    kernels-off single-device step."""
    from qasr_ijcnlp_tpu import train

    cmodel.set_flash_attention(False)
    try:
        tx = train.make_optimizer(1e-3)
        loss_fn = train.whisper_loss_fn(DIMS)
        mel = _mel(8, seed=6)
        tokens = np.full((8, DIMS.n_text_ctx), -100, np.int32)
        tokens[:, :5] = np.random.default_rng(7).integers(
            1, DIMS.n_vocab, (8, 5)
        )

        ref_state = train.init_state(jax.tree.map(jnp.array, params), tx)
        ref_step = train.make_train_step(loss_fn, tx)
        _, ref_metrics = ref_step(ref_state, jnp.asarray(mel),
                                  jnp.asarray(tokens))

        cmodel.set_flash_attention(True)
        mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
        state = train.shard_state(
            train.init_state(jax.tree.map(jnp.array, params), tx), mesh
        )
        # mesh in the loss keys model.forward's jit cache per mesh, so this
        # trace can't reuse the kernels-off reference trace above.
        sharded_loss = train.whisper_loss_fn(DIMS, mesh=mesh)
        step = train.make_sharded_train_step(sharded_loss, tx, mesh)
        with mesh:
            _, metrics = step(state, jnp.asarray(mel), jnp.asarray(tokens))

        np.testing.assert_allclose(
            float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
        )
    finally:
        cmodel.set_flash_attention(None)


def test_dp_decode_with_kernels_on(params):
    """DP greedy decode with the fused encoder kernels on: token parity with
    the kernels-off single-device decode."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    cmodel.set_flash_attention(False)
    try:
        mel = _mel(8, seed=8)
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=6, fp16=False
        )
        m = WhisperModel(params, DIMS, name="kernels-off")
        base = decode(m, jnp.asarray(mel), opts)

        cmodel.set_flash_attention(True)
        mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
        m2 = WhisperModel(
            jax.tree.map(jnp.array, params), DIMS, name="kernels-on"
        ).shard(mesh)
        sharded = decode(m2, parallel.shard_batch(jnp.asarray(mel), mesh),
                         opts)
        for a, b in zip(base, sharded):
            assert list(a.tokens) == list(b.tokens)
    finally:
        cmodel.set_flash_attention(None)


def test_sp_trunk_matches_single_device(params):
    """Sequence-parallel trunk (time axis sharded, all-gathered K/V):
    parity with the single-device encoder, and the dispatcher selects it
    when the heads don't divide the model axis."""
    cmodel.set_flash_attention(False)
    try:
        mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
        mel = _mel(8, seed=14)
        base = np.asarray(
            cmodel.encoder_apply(params["encoder"], jnp.asarray(mel), DIMS)
        )
        sp = parallel.shard_params(params, mesh)
        smel = parallel.shard_batch(jnp.asarray(mel), mesh)
        out = np.asarray(
            jax.jit(lambda p, m: _sp_encode_raw(p, m, mesh))(
                sp["encoder"], smel
            )
        )
        np.testing.assert_allclose(out, base, atol=5e-4, rtol=5e-4)
    finally:
        cmodel.set_flash_attention(None)


def test_sp_dispatch_on_non_dividing_heads():
    """transformer_trunk(mesh=...) falls back to sequence parallelism when
    n_head % tp != 0 (tiny-like 6 heads on a 4-way model axis)."""
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions

    dims6 = ModelDimensions(
        n_mels=16, n_audio_ctx=512, n_audio_state=384, n_audio_head=6,
        n_audio_layer=2, n_vocab=128, n_text_ctx=16, n_text_state=384,
        n_text_head=6, n_text_layer=2,
    )
    p6 = cmodel.init_params(jax.random.PRNGKey(6), dims6)
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=4)
    assert not parallel.sharded.tp_trunk_applicable(dims6, mesh, 8)
    assert parallel.sharded.sp_trunk_applicable(dims6, mesh, 8, 512)

    mel = np.random.default_rng(15).standard_normal(
        (8, dims6.n_mels, dims6.n_audio_ctx * 2)
    ).astype(np.float32)
    base = np.asarray(
        cmodel.encoder_apply(p6["encoder"], jnp.asarray(mel), dims6)
    )
    sp = parallel.shard_params(p6, mesh)
    smel = parallel.shard_batch(jnp.asarray(mel), mesh)
    out = np.asarray(
        jax.jit(
            lambda p, m: cmodel.encoder_apply(p, m, dims6, mesh=mesh)
        )(sp["encoder"], smel)
    )
    np.testing.assert_allclose(out, base, atol=5e-4, rtol=5e-4)


def test_sp_trunk_gradients_match(params):
    cmodel.set_flash_attention(False)
    try:
        mesh = parallel.make_mesh(jax.devices()[:4], model_parallel=2)
        mel = _mel(4, seed=16)

        def loss_single(p, m):
            out = cmodel.encoder_apply(p, m, DIMS)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_base = jax.grad(loss_single)(params["encoder"], jnp.asarray(mel))

        def loss_sp(p, m):
            return jnp.sum(
                _sp_encode_raw(p, m, mesh).astype(jnp.float32) ** 2
            )

        sp = parallel.shard_params(params, mesh)
        smel = parallel.shard_batch(jnp.asarray(mel), mesh)
        g_sp = jax.jit(jax.grad(loss_sp))(sp["encoder"], smel)

        for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, g_sp)),
                        jax.tree.leaves(g_base)):
            scale = max(1.0, float(np.max(np.abs(b))))
            np.testing.assert_allclose(
                a / scale, np.asarray(b) / scale, atol=2e-3
            )
    finally:
        cmodel.set_flash_attention(None)


def _sp_encode_raw(p, m, mesh):
    x = m.astype(jnp.float32)
    x = jax.nn.gelu(cmodel._conv1d(x, p["conv1"], 1), approximate=False)
    x = jax.nn.gelu(cmodel._conv1d(x, p["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1) + p["pos"].astype(x.dtype)
    return parallel.sharded.sp_trunk(p, x, DIMS, DIMS.n_audio_ctx, mesh)


# ---------------------------------------------------------------------------
# Pipeline parallelism (parallel/sharded.py::pp_trunk)
# ---------------------------------------------------------------------------


def _pp_encode_raw(p, m, mesh, n_micro=2):
    x = m.astype(jnp.float32)
    x = jax.nn.gelu(cmodel._conv1d(x, p["conv1"], 1), approximate=False)
    x = jax.nn.gelu(cmodel._conv1d(x, p["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1) + p["pos"].astype(x.dtype)
    return parallel.sharded.pp_trunk(
        p, x, DIMS, DIMS.n_audio_ctx, mesh, n_micro=n_micro
    )


def test_pp_trunk_applicable_gate():
    mesh2 = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    # 2 layers over 2 stages, local batch 4 -> 2 microbatches: ok
    assert parallel.sharded.pp_trunk_applicable(DIMS, mesh2, 16, n_micro=2)
    # 2 layers do not split over 4 stages
    mesh4 = parallel.make_mesh(jax.devices()[:8], model_parallel=4)
    assert not parallel.sharded.pp_trunk_applicable(DIMS, mesh4, 16)
    # local batch must split into microbatches
    assert not parallel.sharded.pp_trunk_applicable(DIMS, mesh2, 4, n_micro=3)


def test_pp_trunk_matches_single_device(params):
    """GPipe trunk (layers sharded over stages, microbatched ppermute
    schedule): parity with the single-device encoder."""
    cmodel.set_flash_attention(False)
    try:
        mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
        mel = _mel(8, seed=17)
        base = np.asarray(
            cmodel.encoder_apply(params["encoder"], jnp.asarray(mel), DIMS)
        )
        out = np.asarray(
            jax.jit(lambda p, m: _pp_encode_raw(p, m, mesh))(
                params["encoder"], jnp.asarray(mel)
            )
        )
        np.testing.assert_allclose(out, base, atol=5e-4, rtol=5e-4)
    finally:
        cmodel.set_flash_attention(None)


def test_pp_trunk_gradients_match(params):
    cmodel.set_flash_attention(False)
    try:
        mesh = parallel.make_mesh(jax.devices()[:4], model_parallel=2)
        mel = _mel(4, seed=18)

        def loss_single(p, m):
            out = cmodel.encoder_apply(p, m, DIMS)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_base = jax.grad(loss_single)(params["encoder"], jnp.asarray(mel))

        def loss_pp(p, m):
            return jnp.sum(
                _pp_encode_raw(p, m, mesh).astype(jnp.float32) ** 2
            )

        g_pp = jax.jit(jax.grad(loss_pp))(params["encoder"], jnp.asarray(mel))

        for a, b in zip(jax.tree.leaves(jax.tree.map(np.asarray, g_pp)),
                        jax.tree.leaves(g_base)):
            scale = max(1.0, float(np.max(np.abs(b))))
            np.testing.assert_allclose(
                a / scale, np.asarray(b) / scale, atol=2e-3
            )
    finally:
        cmodel.set_flash_attention(None)


def test_pp_dispatch_when_neither_heads_nor_time_divide():
    """transformer_trunk(mesh=...) falls back to the pipeline trunk when
    the model axis divides neither the heads nor the padded time (only
    possible on non-power-of-2 axes, e.g. medium's 24 layers over 3
    stages) — and the padded rows are sliced off (t_pad 128 vs ctx 96)."""
    dims3 = ModelDimensions(
        n_mels=16, n_audio_ctx=96, n_audio_state=256, n_audio_head=4,
        n_audio_layer=3, n_vocab=128, n_text_ctx=16, n_text_state=256,
        n_text_head=4, n_text_layer=2,
    )
    mesh = parallel.make_mesh(jax.devices()[:6], model_parallel=3)
    assert not parallel.sharded.tp_trunk_applicable(dims3, mesh, 8)
    assert not parallel.sharded.sp_trunk_applicable(dims3, mesh, 8, 96)
    assert parallel.sharded.pp_trunk_applicable(dims3, mesh, 8)

    p3 = cmodel.init_params(jax.random.PRNGKey(9), dims3)
    mel = np.random.default_rng(19).standard_normal(
        (8, dims3.n_mels, dims3.n_audio_ctx * 2)
    ).astype(np.float32)
    base = np.asarray(
        cmodel.encoder_apply(p3["encoder"], jnp.asarray(mel), dims3)
    )
    out = np.asarray(
        jax.jit(
            lambda p, m: cmodel.encoder_apply(p, m, dims3, mesh=mesh)
        )(p3["encoder"], jnp.asarray(mel))
    )
    assert out.shape == base.shape
    np.testing.assert_allclose(out, base, atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("use_kernel", [True, False])
def test_tp_trunk_padded_input_masks_padding(params, use_kernel):
    """x arriving tile-padded (the fused conv stem emits Tp >= t_real rows
    of which the tail is zeros): the padding rows must be masked as
    attention KEYS on both the kernel and the XLA-fallback paths.
    Regression: the fallback used to take t_mask from xx.shape[1], so
    pre-padded input attended the padding rows' LN(0) keys."""
    from qasr_ijcnlp_tpu.parallel import sharded

    try:
        mesh = parallel.make_mesh(jax.devices()[:4], model_parallel=2)
        T, Tp = 500, 512
        rng = np.random.default_rng(11)
        x = 0.3 * rng.standard_normal(
            (4, T, DIMS.n_audio_state)
        ).astype(np.float32)
        xp = np.zeros((4, Tp, DIMS.n_audio_state), np.float32)
        xp[:, :T] = x

        cmodel.set_flash_attention(False)
        base = np.asarray(
            cmodel.transformer_trunk(params["encoder"], jnp.asarray(x), DIMS)
        )

        cmodel.set_flash_attention(use_kernel)
        sp = parallel.shard_params(params, mesh)
        spad = parallel.shard_batch(jnp.asarray(xp), mesh)
        out = np.asarray(
            sharded.tp_trunk(sp["encoder"], spad, DIMS, T, mesh)
        )[:, :T]
        np.testing.assert_allclose(out, base, atol=5e-4, rtol=5e-4)
    finally:
        cmodel.set_flash_attention(None)

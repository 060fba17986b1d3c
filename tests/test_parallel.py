"""SPMD sharding tests on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): placement specs, numeric parity of
sharded vs single-device execution, and the full sharded train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from qasr_ijcnlp_tpu import parallel, train
from qasr_ijcnlp_tpu.models import whisper as cmodel
from qasr_ijcnlp_tpu.models.dims import ModelDimensions

DIMS = ModelDimensions(
    n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
    n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_state=16,
    n_text_head=2, n_text_layer=2,
)


@pytest.fixture(scope="module")
def params():
    return cmodel.init_params(jax.random.PRNGKey(0), DIMS)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_param_specs_cover_tree(params):
    specs = parallel.param_specs(params)
    assert jax.tree.structure(specs) == jax.tree.structure(params)
    # column-parallel QKV shard the output dim; row-parallel out shards input
    enc = specs["encoder"]["blocks"]
    assert enc["attn"]["query"]["w"] == P(None, None, "model")
    assert enc["attn"]["out"]["w"] == P(None, "model", None)
    assert enc["mlp"]["fc"]["w"] == P(None, None, "model")
    assert enc["mlp"]["proj"]["w"] == P(None, "model", None)
    assert specs["decoder"]["tok_emb"] == P("model", None)
    assert specs["encoder"]["conv1"]["w"] == P()


@pytest.mark.parametrize("tp", [1, 2])
def test_sharded_forward_matches_single_device(params, tp):
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=tp)
    mel = np.random.default_rng(0).standard_normal(
        (8, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    tokens = np.random.default_rng(1).integers(0, DIMS.n_vocab, (8, 5))

    base = np.asarray(cmodel.forward(params, mel, tokens, DIMS))

    sp = parallel.shard_params(params, mesh)
    smel = parallel.shard_batch(jnp.asarray(mel), mesh)
    stok = parallel.shard_batch(jnp.asarray(tokens), mesh)
    sharded = np.asarray(cmodel.forward(sp, smel, stok, DIMS))
    np.testing.assert_allclose(sharded, base, atol=1e-5, rtol=1e-5)


def test_sharded_train_step_runs_and_matches(params):
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    tx = train.make_optimizer(1e-3)
    loss_fn = train.whisper_loss_fn(DIMS)

    mel = np.random.default_rng(2).standard_normal(
        (8, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    tokens = np.full((8, DIMS.n_text_ctx), -100, np.int32)
    tokens[:, :4] = np.random.default_rng(3).integers(1, DIMS.n_vocab, (8, 4))

    # single-device reference step
    ref_state = train.init_state(params, tx)
    ref_step = train.make_train_step(loss_fn, tx)
    ref_state, ref_metrics = ref_step(ref_state, jnp.asarray(mel),
                                      jnp.asarray(tokens))

    # sharded step - deep-copy the fixture params first: the step donates its
    # state, and replicated device_put may alias the original buffers.
    own_params = jax.tree.map(lambda x: jnp.array(x), params)
    state = train.shard_state(train.init_state(own_params, tx), mesh)
    step = train.make_sharded_train_step(loss_fn, tx, mesh)
    with mesh:
        state, metrics = step(state, jnp.asarray(mel), jnp.asarray(tokens))

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    # parameters after one step agree across the two execution paths
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        ref_state.params,
    )
    assert max(jax.tree.leaves(diff)) < 1e-5


def test_sharded_grad_accum_matches_plain_step(params):
    """accum=2 under a dp x tp mesh equals the unsharded single step."""
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    tx = train.make_optimizer(1e-3)

    mel = np.random.default_rng(4).standard_normal(
        (8, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    tokens = np.full((8, DIMS.n_text_ctx), -100, np.int32)
    tokens[:, :4] = np.random.default_rng(5).integers(1, DIMS.n_vocab, (8, 4))
    tokens[5, 2:] = -100  # uneven valid counts across microbatches

    ref_state = train.init_state(params, tx)
    ref_step = train.make_train_step(train.whisper_loss_fn(DIMS), tx)
    ref_state, ref_metrics = ref_step(ref_state, jnp.asarray(mel),
                                      jnp.asarray(tokens))

    own_params = jax.tree.map(lambda x: jnp.array(x), params)
    state = train.shard_state(train.init_state(own_params, tx), mesh)
    accum = train.make_accum_train_step(train.whisper_sum_loss_fn(DIMS), tx, 2)
    step = train.make_sharded_train_step(None, tx, mesh, step_fn=accum)
    with mesh:
        state, metrics = step(state, jnp.asarray(mel), jnp.asarray(tokens))

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        ref_state.params,
    )
    assert max(jax.tree.leaves(diff)) < 1e-5


def test_batch_sharding_layout():
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    x = jnp.zeros((8, 4, 4))
    sx = parallel.shard_batch(x, mesh)
    assert sx.sharding == NamedSharding(mesh, P("data", None, None))


def test_make_mesh_degrades_to_divisor():
    # Sharding must degrade, never refuse: a non-dividing model_parallel
    # request is demoted to the largest divisor (here 6 devices, tp 4 -> 3),
    # and a single device always yields a 1x1 mesh whatever was requested
    # (the driver's dryrun entry hits exactly this on a 1-chip host).
    mesh = parallel.make_mesh(jax.devices()[:6], model_parallel=4)
    assert mesh.shape == {"data": 2, "model": 3}
    mesh1 = parallel.make_mesh(jax.devices()[:1], model_parallel=2)
    assert mesh1.shape == {"data": 1, "model": 1}
    # model_parallel <= 0 degrades to pure DP instead of ValueError
    mesh0 = parallel.make_mesh(jax.devices()[:4], model_parallel=0)
    assert mesh0.shape == {"data": 4, "model": 1}
    meshn = parallel.make_mesh(jax.devices()[:4], model_parallel=-1)
    assert meshn.shape == {"data": 4, "model": 1}


def test_initialize_distributed_refuses_explicit_failure():
    # An explicitly requested multi-host cluster that cannot initialize must
    # raise, not silently fall back to N independent single-host runs.
    with pytest.raises(RuntimeError):
        parallel.initialize_distributed(
            coordinator_address="127.0.0.1:1", num_processes=2, process_id=7
        )


def test_data_parallel_decode_matches_single_device(params):
    """The jitted greedy decode runs with a data-sharded batch and produces
    the same tokens as single-device execution (DP eval, SURVEY.md §5)."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    m = WhisperModel(params, DIMS, name="dp-test")
    mel = np.random.default_rng(7).standard_normal(
        (8, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, fp16=False
    )
    base = decode(m, jnp.asarray(mel), opts)

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
    m_sharded = WhisperModel(
        parallel.shard_params(params, mesh), DIMS, name="dp-test-sharded"
    )
    sharded = decode(m_sharded, parallel.shard_batch(jnp.asarray(mel), mesh), opts)
    for a, b in zip(base, sharded):
        assert list(a.tokens) == list(b.tokens)


def test_data_parallel_beam_decode_matches_single_device(params):
    """Beam search under a data-sharded batch: per-group gathers stay
    shard-local (beams never cross audio rows), so tokens must match the
    single-device run exactly."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    m = WhisperModel(params, DIMS, name="dp-beam-test")
    mel = np.random.default_rng(9).standard_normal(
        (8, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, fp16=False,
        beam_size=3,
    )
    base = decode(m, jnp.asarray(mel), opts)

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
    m_sharded = WhisperModel(
        parallel.shard_params(params, mesh), DIMS, name="dp-beam-sharded"
    )
    sharded = decode(m_sharded, parallel.shard_batch(jnp.asarray(mel), mesh), opts)
    for a, b in zip(base, sharded):
        assert list(a.tokens) == list(b.tokens)
        assert abs(a.avg_logprob - b.avg_logprob) < 1e-5


REAL_DIMS = ModelDimensions(
    # Real tiny widths (384-d, 6 heads, 4 layers, full vocab); time axes
    # shortened so the virtual CPU mesh stays under XLA:CPU's 40 s
    # collective-rendezvous timeout (NOTES_ROUND1.md item 4).
    n_mels=80, n_audio_ctx=96, n_audio_state=384, n_audio_head=6,
    n_audio_layer=4, n_vocab=51865, n_text_ctx=48, n_text_state=384,
    n_text_head=6, n_text_layer=4,
)


def test_sharded_training_at_real_widths():
    """Two sharded train steps at real tiny widths (384-d, 51865 vocab) on a
    4-device (2 dp x 2 tp) mesh, loss- and param-parity vs single device."""
    params = cmodel.init_params(jax.random.PRNGKey(1), REAL_DIMS)
    tx = train.make_optimizer(1e-3)
    loss_fn = train.whisper_loss_fn(REAL_DIMS)

    mel = np.random.default_rng(4).standard_normal(
        (4, REAL_DIMS.n_mels, REAL_DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    tokens = np.full((4, REAL_DIMS.n_text_ctx), -100, np.int32)
    tokens[:, :8] = np.random.default_rng(5).integers(
        1, REAL_DIMS.n_vocab, (4, 8)
    )

    ref_state = train.init_state(jax.tree.map(jnp.array, params), tx)
    ref_step = train.make_train_step(loss_fn, tx)
    ref_losses = []
    for _ in range(2):
        ref_state, m = ref_step(ref_state, jnp.asarray(mel), jnp.asarray(tokens))
        ref_losses.append(float(m["loss"]))

    mesh = parallel.make_mesh(jax.devices()[:4], model_parallel=2)
    state = train.shard_state(
        train.init_state(jax.tree.map(jnp.array, params), tx), mesh
    )
    step = train.make_sharded_train_step(loss_fn, tx, mesh)
    losses = []
    with mesh:
        for _ in range(2):
            state, m = step(state, jnp.asarray(mel), jnp.asarray(tokens))
            losses.append(float(m["loss"]))

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4)
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params,
        ref_state.params,
    )
    assert max(jax.tree.leaves(diff)) < 5e-4


def test_initialize_distributed_two_process_cpu():
    """initialize_distributed forms a real 2-process jax.distributed cluster
    (local CPU coordinator): each process sees the global device count and a
    psum across the cluster returns the correct total (VERDICT r1 item 10 -
    this was the only §2.5 path with zero coverage)."""
    import subprocess
    import sys

    child = r"""
import os, sys
sys.path.insert(0, {repo!r})
pid = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from qasr_ijcnlp_tpu import parallel
parallel.initialize_distributed(
    coordinator_address="127.0.0.1:{port}", num_processes=2, process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 procs x 2 local
import jax.numpy as jnp
from jax.experimental.multihost_utils import process_allgather
got = process_allgather(jnp.asarray([pid + 1.0]))
assert float(got.sum()) == 3.0, got  # 1 + 2 across the cluster
# Success marker goes to a FILE: Gloo's C++ logging writes to the same
# stdout fd concurrently and has been observed splitting the marker line
# mid-write (flaky "proc 0 ok" match).
with open({marker!r} + str(pid), "w") as f:
    f.write("ok")
"""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    import os

    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with tempfile.TemporaryDirectory() as tmp:
        marker = os.path.join(tmp, "proc_ok_")
        code = child.format(repo=repo, port=port, marker=marker)
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", code, str(i)],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                cwd=repo,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=240) for p in procs]
        for i, (p, (out, err)) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {i} failed:\n{out}\n{err}"
            assert os.path.exists(marker + str(i)), (
                f"proc {i} exited 0 without writing its success marker:"
                f"\n{out}\n{err}"
            )


def test_make_mesh_has_no_global_side_effects():
    """r2 pinned the Pallas kernels off process-wide the moment any
    multi-device mesh existed (VERDICT r2 "what's weak" #1).  r3 partitions
    the kernels along the batch dim via custom_partitioning
    (ops/partition.py), so building a mesh must leave the kernel policy
    untouched — single-chip work in the same process keeps its kernels."""
    from qasr_ijcnlp_tpu import audio, parallel
    from qasr_ijcnlp_tpu.models import whisper

    old_flash, old_mel = whisper._USE_FLASH, audio._USE_FUSED_MEL
    whisper.set_flash_attention(None)
    audio.set_fused_mel(None)
    try:
        parallel.make_mesh()  # 8 virtual CPU devices in the test env
        assert whisper._USE_FLASH is None
        assert audio._USE_FUSED_MEL is None
    finally:
        whisper.set_flash_attention(old_flash)
        audio.set_fused_mel(old_mel)


def test_pad_batch_to_mesh_degrades_non_dividing_batches():
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=1)
    x = jnp.arange(10 * 3, dtype=jnp.float32).reshape(10, 3)
    padded, real = parallel.pad_batch_to_mesh(x, mesh)
    assert real == 10 and padded.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(padded[:10]), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(padded[10:]), np.tile(np.asarray(x[-1:]), (6, 1))
    )


def test_tensor_parallel_decode_matches_single_device(params):
    """Greedy decode with the DECODER weights head-sharded over the model
    axis (dp=4 x tp=2): GSPMD partitions the incremental decoder step
    (column-parallel QKV, row-parallel out/proj with compiler-inserted
    collectives) and the tokens must match single-device execution —
    tensor-parallel inference for family members too big for one chip."""
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    m = WhisperModel(params, DIMS, name="tp-dec")
    mel = np.random.default_rng(17).standard_normal(
        (8, DIMS.n_mels, DIMS.n_audio_ctx * 2)
    ).astype(np.float32)
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=6, fp16=False
    )
    base = decode(m, jnp.asarray(mel), opts)

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    m_tp = WhisperModel(params, DIMS, name="tp-dec-sharded").shard(mesh)
    sharded = decode(
        m_tp, parallel.shard_batch(jnp.asarray(mel), mesh), opts
    )
    for a, b in zip(base, sharded):
        assert list(a.tokens) == list(b.tokens)
    # avg_logprob parity guards the logits path (vocab-replicated matmul
    # over the psum-completed hidden state)
    for a, b in zip(base, sharded):
        np.testing.assert_allclose(a.avg_logprob, b.avg_logprob, rtol=1e-4)


def test_sharded_model_forward_matches_unsharded(params):
    """WhisperModel.forward must thread the pinned mesh (regression: it
    dropped mesh, so a TP-sharded model GSPMD-gathered its head-sharded
    weights instead of using the explicit trunk)."""
    import copy

    from qasr_ijcnlp_tpu.models.registry import WhisperModel

    rng = np.random.default_rng(23)
    mel = jnp.asarray(
        rng.standard_normal((4, DIMS.n_mels, DIMS.n_audio_ctx * 2)),
        jnp.float32,
    )
    tokens = jnp.asarray(rng.integers(0, DIMS.n_vocab, (4, 6)), jnp.int32)

    m = WhisperModel(params, DIMS, name="fw-base")
    base = np.asarray(m(mel, tokens))

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    m_tp = WhisperModel(
        copy.deepcopy(params), DIMS, name="fw-sharded"
    ).shard(mesh)
    assert m_tp.mesh is not None
    out = np.asarray(m_tp(parallel.shard_batch(mel, mesh), tokens))
    np.testing.assert_allclose(out, base, rtol=2e-4, atol=2e-4)

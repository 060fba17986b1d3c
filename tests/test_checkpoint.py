"""Checkpoint interop: orbax round trip with metadata, best-k tracking, and
the official .pt export being loadable by the REFERENCE loader."""

import numpy as np
import pytest


def test_pytree_round_trip_with_metadata(tmp_path):
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu.train.checkpoint import (
        load_metadata,
        load_pytree,
        save_pytree,
    )

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4, jnp.int32)}}
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree, metadata={"epoch": 3, "note": "hello"})
    restored = load_pytree(path, target=tree)
    np.testing.assert_allclose(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]),
                                  np.asarray(tree["b"]["c"]))
    meta = load_metadata(path)
    assert meta["epoch"] == 3


def test_best_tracker_modes(tmp_path):
    from qasr_ijcnlp_tpu.train.checkpoint import BestTracker

    tracker = BestTracker(str(tmp_path), {"cer": "min", "acc": "max"})
    t1 = tracker.update({"cer": 0.5, "acc": 0.6}, {"w": np.ones(2)})
    assert t1 == {"cer": True, "acc": True}
    t2 = tracker.update({"cer": 0.7, "acc": 0.9}, {"w": np.zeros(2)})
    assert t2 == {"cer": False, "acc": True}
    assert tracker.best == {"cer": 0.5, "acc": 0.9}
    # best_acc file holds the LATEST acc improvement
    from qasr_ijcnlp_tpu.train.checkpoint import load_pytree

    best_acc = load_pytree(str(tmp_path / "best_acc"), target={"w": np.ones(2)})
    np.testing.assert_array_equal(np.asarray(best_acc["w"]), np.zeros(2))


def test_reference_loads_our_pt_export(tmp_path):
    """Full interop loop: our params -> official .pt -> the reference's
    torch Whisper constructor -> forward agrees with our forward."""
    from tests.oracle import reference_whisper

    whisper = reference_whisper()
    import torch

    import jax

    from qasr_ijcnlp_tpu.models import whisper as jmodel
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions
    from qasr_ijcnlp_tpu.models.registry import WhisperModel, save_model

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=40, n_audio_state=64, n_audio_head=4,
        n_audio_layer=2, n_vocab=200, n_text_ctx=16, n_text_state=64,
        n_text_head=4, n_text_layer=2,
    )
    params = jmodel.init_params(jax.random.PRNGKey(3), dims)
    m = WhisperModel(params, dims, name="interop")
    pt_path = str(tmp_path / "interop.pt")
    save_model(m, pt_path)

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    ref_dims = whisper.model.ModelDimensions(**ckpt["dims"])
    ref = whisper.model.Whisper(ref_dims).eval()
    missing, unexpected = ref.load_state_dict(ckpt["model_state_dict"],
                                              strict=False)
    assert not unexpected, unexpected

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 80)).astype(np.float32)
    tokens = rng.integers(0, 200, (1, 6))
    with torch.no_grad():
        theirs = ref(torch.from_numpy(mel), torch.from_numpy(tokens)).numpy()
    ours = np.asarray(jmodel.forward(params, mel, tokens, dims))
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_sharded_train_state_resume_parity(tmp_path):
    """Full-state checkpoint mid-run on a (data, model) mesh, restore into a
    fresh process state, and resume: the continued run must match an
    uninterrupted one exactly (params + Adam moments + step counter all
    round-trip; leaves gather on save and re-shard on restore)."""
    import copy

    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu import parallel, train
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import ModelDimensions

    dims = ModelDimensions(
        n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
        n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_state=16,
        n_text_head=2, n_text_layer=2,
    )
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    params = model.init_params(jax.random.PRNGKey(0), dims)
    tx = train.make_optimizer(train.warmup_cosine(1e-3, 2, 10))
    loss_fn = train.whisper_loss_fn(dims, mesh=mesh)
    step = train.make_sharded_train_step(loss_fn, tx, mesh)

    B = 4
    def batch(i):
        mel = jax.random.normal(jax.random.PRNGKey(100 + i),
                                (B, dims.n_mels, 2 * dims.n_audio_ctx)) * 0.1
        tokens = np.full((B, dims.n_text_ctx), -100, np.int32)
        tokens[:, :4] = [[1, 5 + i, 6, 2]] * B
        return mel, jnp.asarray(tokens)

    # Uninterrupted 4-step run.
    state = train.shard_state(
        train.init_state(copy.deepcopy(params), tx), mesh)
    with mesh:
        for i in range(4):
            state, metrics_ref = step(state, *batch(i))

    # Interrupted: 2 steps, full-state save, fresh restore, 2 more steps.
    state2 = train.shard_state(
        train.init_state(copy.deepcopy(params), tx), mesh)
    with mesh:
        for i in range(2):
            state2, _ = step(state2, *batch(i))
    path = str(tmp_path / "state")
    train.save_train_state(path, state2, metadata={"step": 2})
    template = train.init_state(copy.deepcopy(params), tx)
    resumed = train.restore_train_state(path, template, mesh=mesh)
    assert int(resumed.step) == 2
    with mesh:
        for i in range(2, 4):
            resumed, metrics = step(resumed, *batch(i))

    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_ref["loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        resumed.params, state.params,
    )


def test_best_tracker_seed_from_disk(tmp_path):
    """A resumed run must compete against the pre-interrupt best instead of
    overwriting best_<metric> with its first (possibly worse) validation."""
    from qasr_ijcnlp_tpu.train.checkpoint import BestTracker, load_pytree

    first = BestTracker(str(tmp_path), {"wer": "min"})
    first.update({"wer": 0.20}, {"w": np.full(2, 5.0)}, {"epoch": 5})

    resumed = BestTracker(str(tmp_path), {"wer": "min"})
    seeded = resumed.seed_from_disk()
    assert seeded == {"wer": 0.20}
    # Worse value after resume: no overwrite.
    t = resumed.update({"wer": 0.35}, {"w": np.zeros(2)}, {"epoch": 7})
    assert t == {"wer": False}
    best = load_pytree(str(tmp_path / "best_wer"), target={"w": np.ones(2)})
    np.testing.assert_array_equal(np.asarray(best["w"]), np.full(2, 5.0))
    # Better value: normal save resumes.
    t = resumed.update({"wer": 0.10}, {"w": np.full(2, 7.0)}, {"epoch": 8})
    assert t == {"wer": True}


def test_load_pytree_prefers_newer_pickle(tmp_path):
    """If a later save fell back to pickle, load must not silently restore
    the stale orbax directory from an earlier epoch."""
    import os
    import pickle
    import time

    from qasr_ijcnlp_tpu.train.checkpoint import load_pytree, save_pytree

    path = str(tmp_path / "best")
    save_pytree(path, {"w": np.zeros(3)})  # orbax dir (epoch 3)
    time.sleep(0.05)
    with open(path + ".pkl", "wb") as f:  # newer fallback (epoch 7)
        pickle.dump({"w": np.full(3, 7.0)}, f)
    os.utime(path + ".pkl")
    restored = load_pytree(path, target={"w": np.ones(3)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(3, 7.0))


def test_warmup_cosine_zero_warmup_starts_at_peak():
    from qasr_ijcnlp_tpu.train.schedule import warmup_cosine

    sched = warmup_cosine(1e-3, 0, 100)
    assert float(sched(0)) == pytest.approx(1e-3)
    sched_w = warmup_cosine(1e-3, 10, 100)
    assert float(sched_w(0)) == pytest.approx(0.0)
    assert float(sched_w(10)) == pytest.approx(1e-3)

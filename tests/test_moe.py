"""MoE encoder variant + expert parallelism (models/moe.py, ep_trunk).

Beyond-reference capability (the reference has no MoE; SURVEY.md §2.5 lists
EP as N/A) — these tests pin the switch-routing algebra, the dense trunk,
and dense-vs-expert-parallel parity on the 8-virtual-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qasr_ijcnlp_tpu import parallel, train
from qasr_ijcnlp_tpu.models import moe as moe_mod
from qasr_ijcnlp_tpu.models import whisper as model
from qasr_ijcnlp_tpu.models.dims import ModelDimensions
from qasr_ijcnlp_tpu.parallel import sharded


def toy_dims(n_head=2, d=16, layers=2):
    return ModelDimensions(
        n_mels=8, n_audio_ctx=64, n_audio_state=d, n_audio_head=n_head,
        n_audio_layer=layers, n_vocab=64, n_text_ctx=8, n_text_state=d,
        n_text_head=2, n_text_layer=2,
    )


@pytest.fixture(scope="module")
def setup():
    dims = toy_dims()
    moe = moe_mod.MoEConfig(n_experts=4, capacity_factor=4.0)
    params = moe_mod.init_moe_whisper_params(jax.random.PRNGKey(0), dims, moe)
    return dims, moe, params


def test_route_no_drop_is_permutation():
    """With ample capacity every token lands in exactly one (expert, slot)."""
    moe = moe_mod.MoEConfig(n_experts=4, capacity_factor=8.0)
    t = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    rw = jax.random.normal(jax.random.PRNGKey(2), (16, 4))
    C = moe.capacity(32)
    dispatch, combine, aux = moe_mod.route(t, rw, moe, C)
    # one slot per token; each (e, c) slot holds at most one token
    np.testing.assert_array_equal(np.sum(np.asarray(dispatch), (1, 2)),
                                  np.ones(32))
    assert np.max(np.sum(np.asarray(dispatch), 0)) <= 1.0 + 1e-6
    assert np.isfinite(float(aux)) and float(aux) >= 1.0 - 1e-5


def test_route_capacity_drops_overflow():
    """Tokens beyond an expert's capacity get all-zero dispatch rows."""
    moe = moe_mod.MoEConfig(n_experts=2, capacity_factor=1.0)
    t = jnp.ones((64, 8))  # identical tokens -> all route to one expert
    rw = jnp.zeros((8, 2)).at[0, 0].set(1.0)
    C = moe.capacity(64)  # 40 slots for 64 tokens on expert 0
    dispatch, combine, _ = moe_mod.route(t, rw, moe, C)
    routed = float(jnp.sum(dispatch))
    assert routed == C  # first C tokens kept, rest dropped
    np.testing.assert_allclose(np.sum(np.asarray(dispatch), 0).max(), 1.0)


def test_route_valid_mask_excludes_padding():
    moe = moe_mod.MoEConfig(n_experts=2, capacity_factor=8.0)
    t = jax.random.normal(jax.random.PRNGKey(3), (16, 8))
    rw = jax.random.normal(jax.random.PRNGKey(4), (8, 2))
    valid = jnp.arange(16) < 10
    dispatch, combine, _ = moe_mod.route(t, rw, moe, moe.capacity(16),
                                         valid=valid)
    assert float(jnp.sum(dispatch[10:])) == 0.0
    np.testing.assert_array_equal(
        np.sum(np.asarray(dispatch[:10]), (1, 2)), np.ones(10))


def test_single_expert_moe_matches_dense_mlp():
    """E=1 with ample capacity = the dense MLP scaled by its router gate
    (softmax over one logit = 1.0), pinning the expert FFN algebra against
    models/whisper.py's _mlp."""
    d = 16
    key = jax.random.PRNGKey(5)
    mp = moe_mod._init_moe_mlp(key, d, moe_mod.MoEConfig(1, 8.0))
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, d))
    out, aux = moe_mod.moe_mlp(mp, x, moe_mod.MoEConfig(1, 8.0))
    dense_p = {
        "fc": {"w": mp["experts"]["fc"]["w"][0],
               "b": mp["experts"]["fc"]["b"][0]},
        "proj": {"w": mp["experts"]["proj"]["w"][0],
                 "b": mp["experts"]["proj"]["b"][0]},
    }
    ref = model._mlp(dense_p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_trunk_router_gradient_flows(setup):
    dims, moe, params = setup
    enc = params["encoder"]
    x = jax.random.normal(jax.random.PRNGKey(7), (2, dims.n_audio_ctx,
                                                  dims.n_audio_state))

    def loss(blocks_router_w):
        blocks = dict(enc["blocks"])
        mlp = dict(blocks["mlp"], router={"w": blocks_router_w})
        blocks["mlp"] = mlp
        out, aux = moe_mod.moe_trunk(dict(enc, blocks=blocks), x, dims, moe)
        return jnp.sum(out ** 2) + aux

    g = jax.grad(loss)(enc["blocks"]["mlp"]["router"]["w"])
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_ep_trunk_matches_dense(setup):
    """Expert-parallel trunk (all_to_all dispatch, 8-device mesh) must match
    the single-device dense trunk in the no-drop regime."""
    dims, moe, params = setup
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    assert sharded.ep_trunk_applicable(dims, moe, mesh, 4, dims.n_audio_ctx)
    enc = params["encoder"]
    x = jax.random.normal(
        jax.random.PRNGKey(8), (4, dims.n_audio_ctx, dims.n_audio_state)
    )
    ref, aux_ref = moe_mod.moe_trunk(enc, x, dims, moe)
    with mesh:
        out, aux = sharded.ep_trunk(enc, x, dims, moe, dims.n_audio_ctx,
                                    mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    assert np.isfinite(float(aux))


def test_ep_trunk_four_way_expert_shard(setup):
    """ep=4 (one expert per shard) still matches the dense trunk."""
    dims, moe, params = setup
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=4)
    enc = params["encoder"]
    x = jax.random.normal(
        jax.random.PRNGKey(9), (2, dims.n_audio_ctx, dims.n_audio_state)
    )
    ref, _ = moe_mod.moe_trunk(enc, x, dims, moe)
    with mesh:
        out, _ = sharded.ep_trunk(enc, x, dims, moe, dims.n_audio_ctx, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_ep_train_step_runs_and_matches_single_device(setup):
    """One full sharded MoE train step on the mesh: finite loss, and the
    loss value matches the identical step run without any mesh.

    aux_weight=0 for the comparison: the load-balance loss is averaged
    per-shard under EP (nonlinear in the routing fractions), so only the CE
    part is bitwise comparable across layouts."""
    dims, moe, params = setup
    moe = moe_mod.MoEConfig(moe.n_experts, moe.capacity_factor,
                            aux_weight=0.0)
    import copy

    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    B = 4
    mel = jax.random.normal(
        jax.random.PRNGKey(10), (B, dims.n_mels, 2 * dims.n_audio_ctx)
    ) * 0.1
    tokens = np.full((B, dims.n_text_ctx), -100, np.int32)
    tokens[:, :4] = [[1, 5, 6, 2]] * B
    tokens = jnp.asarray(tokens)

    tx = train.make_optimizer(1e-3)

    # Single-device reference step.
    loss_fn = moe_mod.moe_whisper_loss_fn(dims, moe)
    state0 = train.init_state(copy.deepcopy(params), tx)
    step = jax.jit(train.make_train_step(loss_fn, tx))
    _, metrics_ref = step(state0, mel, tokens)

    # Expert-parallel step over the mesh.
    loss_fn_ep = moe_mod.moe_whisper_loss_fn(dims, moe, mesh=mesh)
    state = train.init_state(copy.deepcopy(params), tx)
    state = train.shard_state(state, mesh)
    step_ep = train.make_sharded_train_step(loss_fn_ep, tx, mesh)
    with mesh:
        state, metrics = step_ep(state, mel, tokens)
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_ref["loss"]), rtol=1e-4)


def test_param_specs_shard_experts(setup):
    dims, moe, params = setup
    mesh = parallel.make_mesh(jax.devices()[:8], model_parallel=2)
    specs = parallel.param_specs(params, mesh)
    fc = specs["encoder"]["blocks"]["mlp"]["experts"]["fc"]["w"]
    assert fc == parallel.P(None, parallel.MODEL_AXIS, None, None)
    assert specs["encoder"]["blocks"]["mlp"]["router"]["w"] == parallel.P()


def test_moe_trunk_padded_input_matches_unpadded(setup):
    """Tile-padded input (t_real < x.shape[1]): padding rows must not
    consume expert capacity or skew aux — the real region's output and the
    load-balance loss must match the unpadded run exactly (masked rows
    contribute zeros to the routing cumsum, so real tokens keep their
    slots)."""
    dims, moe, params = setup
    rng = np.random.default_rng(9)
    T, Tp = 24, 32
    x = 0.3 * rng.standard_normal((2, T, dims.n_audio_state)).astype(
        np.float32
    )
    xp = np.zeros((2, Tp, dims.n_audio_state), np.float32)
    xp[:, :T] = x

    out, aux = moe_mod.moe_trunk(params["encoder"], jnp.asarray(x), dims,
                                 moe)
    out_p, aux_p = moe_mod.moe_trunk(params["encoder"], jnp.asarray(xp),
                                     dims, moe, t_real=T)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(float(aux_p), float(aux), rtol=1e-5)

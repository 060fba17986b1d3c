"""HLO-level collective regression tests for the sharded trunks.

The tp/sp/pp/ep/fsdp paths are numerically parity-tested elsewhere
(tests/test_parallel.py, test_fsdp.py) — but numerics cannot catch a GSPMD
regression that silently inserts per-use resharding collectives (the
program stays correct, just slow).  These tests pin the COMMUNICATION
structure at two levels:

* StableHLO (``.lower().as_text()``): the collectives our shard_map bodies
  emit, counted exactly — this is the designed algorithm (2 psums per TP
  block; K/V all-gathers only for SP; M+S-2 ppermutes + 1 masked-broadcast
  psum for PP; 2 all_to_alls + K/V gathers + 1 aux psum for EP).
* optimized HLO (``.compile().as_text()``): what the partitioner/backend
  actually schedules — exact counts for the closed-form trunks, presence
  inequalities for the FSDP step (whose gather/reduce fusion count is
  backend-dependent).

Counts are per compiled module: the layer loop is a ``lax.scan``, so each
psum/gather SITE appears once regardless of depth.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from qasr_ijcnlp_tpu import parallel, train
from qasr_ijcnlp_tpu.models import moe as moe_mod
from qasr_ijcnlp_tpu.models import whisper as cmodel
from qasr_ijcnlp_tpu.models.dims import ModelDimensions
from qasr_ijcnlp_tpu.parallel import sharded

DIMS = ModelDimensions(
    n_mels=8, n_audio_ctx=16, n_audio_state=16, n_audio_head=2,
    n_audio_layer=2, n_vocab=64, n_text_ctx=8, n_text_state=16,
    n_text_head=2, n_text_layer=2,
)

HLO_OPS = ("all-reduce", "all-gather", "reduce-scatter",
           "collective-permute", "all-to-all")
SHLO_OPS = ("all_reduce", "all_gather", "reduce_scatter",
            "collective_permute", "all_to_all")


def hlo_counts(text):
    """Optimized-HLO collective instruction counts (incl. async -start
    forms, excluding their -done halves)."""
    return {op: len(re.findall(rf"= \S+ {op}(?:-start)?\(", text))
            for op in HLO_OPS}


def shlo_counts(text):
    return {op: len(re.findall(rf"stablehlo\.{op}", text))
            for op in SHLO_OPS}


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return parallel.make_mesh(jax.devices()[:8], model_parallel=2)


@pytest.fixture(scope="module")
def params():
    return cmodel.init_params(jax.random.PRNGKey(0), DIMS)


def test_tp_trunk_two_psums_only(params, mesh):
    x = jnp.zeros((8, 16, 16), jnp.float32)
    f = jax.jit(lambda p, xx: sharded.tp_trunk(p, xx, DIMS, 16, mesh))
    lowered = f.lower(params["encoder"], x)
    assert shlo_counts(lowered.as_text()) == {
        "all_reduce": 2, "all_gather": 0, "reduce_scatter": 0,
        "collective_permute": 0, "all_to_all": 0,
    }
    # the partitioner must add NOTHING: two all-reduces (attention out-proj
    # + MLP proj partial sums), zero resharding gathers
    assert hlo_counts(lowered.compile().as_text()) == {
        "all-reduce": 2, "all-gather": 0, "reduce-scatter": 0,
        "collective-permute": 0, "all-to-all": 0,
    }


def test_sp_trunk_kv_gathers_only(params, mesh):
    x = jnp.zeros((8, 16, 16), jnp.float32)
    f = jax.jit(lambda p, xx: sharded.sp_trunk(p, xx, DIMS, 16, mesh))
    lowered = f.lower(params["encoder"], x)
    assert shlo_counts(lowered.as_text()) == {
        "all_reduce": 0, "all_gather": 2, "reduce_scatter": 0,
        "collective_permute": 0, "all_to_all": 0,
    }
    c = hlo_counts(lowered.compile().as_text())
    # K and V each gathered once per layer body; the 2 collective-permutes
    # are this backend's lowering of the tiled gathers' rotation, not extra
    # resharding (pinned so growth is caught)
    assert c["all-gather"] == 2 and c["all-reduce"] == 0
    assert c["reduce-scatter"] == 0 and c["all-to-all"] == 0
    assert c["collective-permute"] <= 2


def test_pp_trunk_ppermute_schedule(params, mesh):
    x = jnp.zeros((16, 16, 16), jnp.float32)  # B_local=4, n_micro=4
    f = jax.jit(lambda p, xx: sharded.pp_trunk(p, xx, DIMS, 16, mesh))
    lowered = f.lower(params["encoder"], x)
    S, M = 2, 4  # model-axis stages, microbatches (pp_trunk default)
    assert shlo_counts(lowered.as_text()) == {
        "all_reduce": 1,  # masked broadcast of finished microbatches
        "all_gather": 0, "reduce_scatter": 0,
        "collective_permute": M + S - 2,  # unrolled GPipe hops
        "all_to_all": 0,
    }
    assert hlo_counts(lowered.compile().as_text()) == {
        "all-reduce": 1, "all-gather": 0, "reduce-scatter": 0,
        "collective-permute": M + S - 2, "all-to-all": 0,
    }


def test_ep_trunk_all_to_all_dispatch(mesh):
    moe_cfg = moe_mod.MoEConfig(n_experts=4, capacity_factor=2.0)
    p = moe_mod.init_moe_whisper_params(jax.random.PRNGKey(1), DIMS, moe_cfg)
    x = jnp.zeros((16, 16, 16), jnp.float32)
    f = jax.jit(
        lambda p, xx: sharded.ep_trunk(p, xx, DIMS, moe_cfg, 16, mesh)
    )
    lowered = f.lower(p["encoder"], x)
    assert shlo_counts(lowered.as_text()) == {
        "all_reduce": 1,        # load-balancing aux loss psum
        "all_gather": 2,        # SP-style K/V gathers
        "reduce_scatter": 0,
        "collective_permute": 0,
        "all_to_all": 2,        # expert dispatch + return
    }
    c = hlo_counts(lowered.compile().as_text())
    # 2-shard all_to_alls lower to pairwise permutes on this backend; the
    # invariant is that no extra reduction/gather traffic appears
    assert c["all-gather"] == 2 and c["all-reduce"] == 1
    assert c["reduce-scatter"] == 0
    assert c["all-to-all"] + c["collective-permute"] == 2


def test_fsdp_step_gathers_params_and_reduces_grads(params, mesh):
    tx = train.make_optimizer(1e-3)
    loss_fn = train.whisper_loss_fn(DIMS)
    step = train.make_sharded_train_step(loss_fn, tx, mesh)
    mel = jnp.zeros((8, 8, 32), jnp.float32)
    toks = jnp.zeros((8, 8), jnp.int32)

    def compile_counts(fsdp):
        own = jax.tree.map(jnp.array, params)
        st = train.shard_state(train.init_state(own, tx), mesh, fsdp=fsdp,
                               fsdp_min_size=256)
        with mesh:
            return hlo_counts(jax.jit(step).lower(st, mel, toks)
                              .compile().as_text())

    plain = compile_counts(False)
    fsdp = compile_counts(True)
    # ZeRO-3: sliced params must be gathered for use (the plain TP/DP step
    # gathers nothing), and the gradient reduction count grows with the
    # per-leaf data-axis reductions.  This backend emits the grad
    # reduce+slice as all-reduce (+dynamic-slice) rather than
    # reduce-scatter; presence of the gather and the reduction GROWTH are
    # the structural FSDP invariants.
    assert plain["all-gather"] == 0
    assert fsdp["all-gather"] >= 1
    assert fsdp["all-reduce"] > plain["all-reduce"]
    assert fsdp["all-to-all"] == plain["all-to-all"] == 0

"""SPMD parallelism: device meshes and named shardings for Whisper pytrees.

The reference is strictly single-process / single-device (SURVEY.md §2.5; no
torch.distributed anywhere, e.g. /root/reference/train_quantum_whisper_asr.py:299-322
selects one `torch.device`).  This module is the TPU-native capability the
reference lacks: a (data, model) `jax.sharding.Mesh` with

* **data parallelism** — batch dims sharded along ``data``; gradients are
  all-reduced by XLA's sharding propagation (no NCCL analog needed);
* **tensor parallelism** — attention-head and MLP-hidden dims of every
  transformer block sharded along ``model`` (column-parallel QKV/fc,
  row-parallel out/proj), and the vocab embedding sharded along ``model``;
  collectives ride ICI, inserted by GSPMD.

Whisper Tiny (39 M params) does not *need* TP, but the same rules shard
base/small/medium/large unchanged (dims table in models/dims.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (one process per host on a pod/multi-slice).

    Thin wrapper over ``jax.distributed.initialize``; with no arguments, TPU
    pod environments auto-discover the topology.  After this, ``jax.devices()``
    spans every host and :func:`make_mesh` builds global meshes whose
    collectives ride ICI within a slice and DCN across slices.  No-op when
    already initialized or single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if coordinator_address is None and num_processes is None:
            return  # auto-discovery in a single-process environment: no-op
        if "already" in str(e).lower():
            return  # idempotent re-init
        # The caller explicitly asked for a multi-host cluster; a silent
        # fallback would train N independent single-host jobs on duplicated
        # data with no error.  Refuse instead.
        raise RuntimeError(
            f"jax.distributed.initialize failed for "
            f"coordinator={coordinator_address!r} num_processes={num_processes} "
            f"process_id={process_id}: {e}"
        ) from e


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    axis_names=(DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """A (data, model) mesh over ``devices`` (default: all local devices).

    ``model_parallel`` is a *request*: if it does not divide the device count
    it is demoted to the largest divisor that does (worst case 1 = pure DP),
    mirroring the shape-aware spec demotion in :func:`param_specs` — sharding
    must degrade, never refuse.  With ``model_parallel=1`` every ``model``
    collective is a no-op.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel < 1:
        model_parallel = 1  # degrade to pure DP (docstring contract)
    if n % model_parallel != 0:
        model_parallel = max(
            d for d in range(1, min(model_parallel, n) + 1) if n % d == 0
        )
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


# ---------------------------------------------------------------------------
# PartitionSpec rules for the model parameter pytree (models/whisper.py layout)
# ---------------------------------------------------------------------------

# Block-local rules: path suffix -> spec for the stacked (L, ...) block params.
# Linear weights are stored (in, out): column-parallel layers shard the output
# dim, row-parallel layers shard the input dim, so each block needs exactly
# one all-reduce per attention and one per MLP (the GSPMD-inserted psum after
# the row-parallel matmul).
_BLOCK_RULES = {
    ("attn", "query", "w"): P(None, None, MODEL_AXIS),
    ("attn", "query", "b"): P(None, MODEL_AXIS),
    ("attn", "key", "w"): P(None, None, MODEL_AXIS),
    ("attn", "value", "w"): P(None, None, MODEL_AXIS),
    ("attn", "value", "b"): P(None, MODEL_AXIS),
    ("attn", "out", "w"): P(None, MODEL_AXIS, None),
    ("cross_attn", "query", "w"): P(None, None, MODEL_AXIS),
    ("cross_attn", "query", "b"): P(None, MODEL_AXIS),
    ("cross_attn", "key", "w"): P(None, None, MODEL_AXIS),
    ("cross_attn", "value", "w"): P(None, None, MODEL_AXIS),
    ("cross_attn", "value", "b"): P(None, MODEL_AXIS),
    ("cross_attn", "out", "w"): P(None, MODEL_AXIS, None),
    ("mlp", "fc", "w"): P(None, None, MODEL_AXIS),
    ("mlp", "fc", "b"): P(None, MODEL_AXIS),
    ("mlp", "proj", "w"): P(None, MODEL_AXIS, None),
    # MoE encoder variant (models/moe.py): experts shard on their E axis
    # (leaves are stacked (L, E, ...)); the router replicates.
    ("mlp", "experts", "fc", "w"): P(None, MODEL_AXIS, None, None),
    ("mlp", "experts", "fc", "b"): P(None, MODEL_AXIS, None),
    ("mlp", "experts", "proj", "w"): P(None, MODEL_AXIS, None, None),
    ("mlp", "experts", "proj", "b"): P(None, MODEL_AXIS, None),
}


def _path_keys(path) -> tuple:
    keys = []
    for p in path:
        k = getattr(p, "key", None)
        if k is None:
            k = getattr(p, "name", None)
        if k is None:
            k = str(getattr(p, "idx", p))
        keys.append(k)
    return tuple(keys)


def _fsdp_augment(spec: P, shape, mesh: Mesh, min_size: int) -> P:
    """Add a ``data``-axis shard to the largest still-replicated dim of a
    weight leaf (ZeRO-3 / fully-sharded data parallel).

    Small leaves (LN scales, biases — below ``min_size`` elements) stay
    replicated: gathering them individually costs latency without saving
    meaningful HBM.  A dim is only sharded when its size divides the data
    extent — sharding degrades, never refuses (same contract as the TP
    demotion in :func:`param_specs`)."""
    n_data = mesh.shape[DATA_AXIS]
    if n_data <= 1 or not shape:
        return spec
    if int(np.prod(shape)) < min_size:
        return spec
    full = list(spec) + [None] * (len(shape) - len(spec))
    for dim in sorted(range(len(shape)), key=lambda d: -shape[d]):
        if full[dim] is None and shape[dim] % n_data == 0:
            full[dim] = DATA_AXIS
            return P(*full)
    return spec


def param_specs(
    params: Dict[str, Any],
    mesh: Optional[Mesh] = None,
    fsdp: bool = False,
    fsdp_min_size: int = 65536,
) -> Dict[str, Any]:
    """PartitionSpec pytree for a Whisper (or quantum-Whisper) param tree.

    With ``mesh`` given, any sharded dim whose size is not divisible by its
    mesh-axis extent is demoted to replicated (e.g. the 51865-token vocab
    embedding under model-parallel 2) - sharding must never change results
    or refuse a model.

    ``fsdp=True`` additionally shards every large weight leaf along the
    ``data`` axis (ZeRO-3: parameters and, via ``train.shard_state``, the
    Adam moments live sliced across the data-parallel group; XLA inserts the
    per-use all-gathers and the reduce-scatter on the gradients).  Composes
    with TP: a leaf already sharded along ``model`` gets its largest
    remaining dim sharded along ``data``.  There is no torch-style wrapper
    class to port — on TPU, FSDP *is* a sharding annotation (the reference
    is single-device throughout, SURVEY.md §2.5).
    """
    if fsdp and mesh is None:
        raise ValueError("fsdp=True requires a mesh (the data extent "
                         "determines the shard layout)")

    def fit(spec: P, shape) -> P:
        if mesh is None:
            return spec
        fixed = []
        for dim, axis in enumerate(spec):
            if axis is not None and shape[dim] % mesh.shape[axis] != 0:
                axis = None
            fixed.append(axis)
        return P(*fixed)

    def spec(path, leaf):
        keys = _path_keys(path)
        s = P()
        if "blocks" in keys:
            i = keys.index("blocks")
            rule = _BLOCK_RULES.get(keys[i + 1 :])
            if rule is not None:
                s = fit(rule, leaf.shape)
        elif keys[-2:] == ("decoder", "tok_emb") or keys[-1] == "tok_emb":
            s = fit(P(MODEL_AXIS, None), leaf.shape)
        if fsdp:
            s = _fsdp_augment(s, leaf.shape, mesh, fsdp_min_size)
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def batch_spec(ndim: int) -> P:
    """Shard the leading (batch) dim along data, replicate the rest."""
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def shard_params(params, mesh: Mesh):
    """Device_put the param tree with its TP/replicated shardings."""
    specs = param_specs(params, mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch, mesh: Mesh):
    """Shard array(s) with the leading dim along data.

    Single-process: a plain ``device_put`` (the host array IS the global
    batch).  Multi-process: each host holds a DISTINCT local shard (the
    DataLoader strides by ``process_index``), so the global array must be
    assembled with ``make_array_from_process_local_data`` — ``device_put``
    would treat every host's different batch as the same global array and
    silently keep only 1/P of each host's rows."""

    def put(x):
        sharding = NamedSharding(mesh, batch_spec(x.ndim))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def named_sharding_tree(params, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), param_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P),
    )


def encoder_block_specs(blocks) -> Any:
    """PartitionSpecs for a stacked encoder block pytree alone (paths are
    relative: ('attn', 'query', 'w'), ...) — the in_specs for the
    shard_map-wrapped tensor-parallel trunk (parallel/sharded.py)."""

    def spec(path, leaf):
        rule = _BLOCK_RULES.get(_path_keys(path))
        return rule if rule is not None else P()

    return jax.tree_util.tree_map_with_path(spec, blocks)


from . import sharded  # noqa: E402  (shard_map tensor-parallel trunk)


def round_up_to_mesh(n: int, mesh: Mesh) -> int:
    """Round a batch size up to a multiple of the mesh's data-axis extent —
    the one rounding rule every DP surface (serving, eval CLI,
    :func:`pad_batch_to_mesh`) shares: sharding degrades by padding, never
    refuses."""
    n_data = mesh.shape[DATA_AXIS]
    return -(-n // n_data) * n_data


def pad_batch_to_mesh(batch, mesh: Mesh):
    """Pad the leading dim of ``batch`` array(s) up to a multiple of the
    mesh's data-axis extent by repeating the last row; returns (padded,
    real_count).  Sharding must degrade, never refuse: callers slice their
    per-row results back to ``real_count`` (e.g. a batch of 10 on 8 devices
    evaluates as 16 rows and discards 6)."""

    def pad(x):
        b = x.shape[0]
        target = round_up_to_mesh(b, mesh)
        if target == b:
            return x
        reps = jnp.repeat(x[-1:], target - b, axis=0)
        return jnp.concatenate([x, reps], axis=0)

    real = jax.tree.leaves(batch)[0].shape[0]
    return jax.tree.map(pad, batch), real

"""Quantum Whisper: hybrid quantum-classical conv stem on the audio encoder.

TPU-native redesign of the reference quantum layer
(/root/reference/quantum_whisper.py:45-165).  The hybrid layer is

    unfold windows -> pre Linear -> quantum circuit <Z_i> -> post Linear

where the circuit expectations come from the closed-form batched simulator
(ops/qsim.py) instead of per-sample PennyLane qnode calls: the whole conv is
four matmuls over (batch x positions), vmapped/jitted/shardable like any
other layer.  Trainable params per layer: pre_conv, post_conv, and the
(n_qubits, 3) rotation angles - ~9.4k total for the tiny stem, matching the
reference's trainable-parameter budget (PROJECT_SUMMARY.md:88).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qsim import quantum_expvals
from .dims import ModelDimensions
from . import whisper as cmodel
from .registry import WhisperModel


def quantum_conv_spec(in_channels: int, kernel_size: int, n_qubits: int) -> int:
    """Effective qubit count (reference quantum_whisper.py:55)."""
    return min(n_qubits, in_channels * kernel_size)


def init_quantum_conv(
    key,
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    n_qubits: int = 4,
) -> Dict[str, Any]:
    """Parameter pytree for one QuantumConv1d layer.

    Linear layouts are (in, out).  Stride/padding are NOT part of the
    params: they are architectural constants of the two Whisper stem convs
    (conv1: stride 1, pad 1; conv2: stride 2, pad 1 - reference
    quantum_whisper.py:130-144) and are passed to :func:`quantum_conv1d`
    at apply time.
    """
    nq = quantum_conv_spec(in_channels, kernel_size, n_qubits)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d_in = in_channels * kernel_size
    b1 = 1.0 / math.sqrt(d_in)
    b2 = 1.0 / math.sqrt(nq)
    return {
        "pre_w": jax.random.uniform(k1, (d_in, nq), jnp.float32, -b1, b1),
        "pre_b": jax.random.uniform(k2, (nq,), jnp.float32, -b1, b1),
        "post_w": jax.random.uniform(k3, (nq, out_channels), jnp.float32, -b2, b2),
        "post_b": jax.random.uniform(k4, (out_channels,), jnp.float32, -b2, b2),
        "qweights": jax.random.normal(k5, (nq, 3), jnp.float32),
    }


def quantum_conv1d(
    params: Dict[str, Any],
    x: jnp.ndarray,
    kernel_size: int,
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """Hybrid quantum conv forward: (B, C_in, L) -> (B, C_out, L_out).

    Batches ALL output positions and batch elements through the closed-form
    circuit in one shot (vs the reference's per-position per-sample Python
    loops, quantum_whisper.py:107-122).
    """
    B, C, L = x.shape
    nq = params["pre_w"].shape[1]
    if padding > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
    L_out = (L + 2 * padding - kernel_size) // stride + 1

    # Unfold into (B, L_out, C*k) windows: gather with a static index map;
    # channels vary fastest within a window like the reference's reshape of
    # (B, C, k) slices.
    starts = np.arange(L_out) * stride
    idx = starts[:, None] + np.arange(kernel_size)[None, :]  # (L_out, k)
    windows = x[:, :, idx]  # (B, C, L_out, k)
    windows = windows.transpose(0, 2, 1, 3).reshape(B, L_out, C * kernel_size)

    pre = windows @ params["pre_w"] + params["pre_b"]  # (B, L_out, nq)
    q = quantum_expvals(pre, params["qweights"], nq)  # (B, L_out, nq)
    out = q @ params["post_w"] + params["post_b"]  # (B, L_out, C_out)
    return out.transpose(0, 2, 1)


def quantum_encoder_apply(
    params: Dict[str, Any],
    mel: jnp.ndarray,
    dims: ModelDimensions,
    compute_dtype=jnp.float32,
    mesh=None,
) -> jnp.ndarray:
    """Audio encoder with QuantumConv1d stem (reference QuantumAudioEncoder,
    quantum_whisper.py:130-144): conv1 (k3,p1) and conv2 (k3,s2,p1) replaced;
    transformer trunk unchanged."""
    x = mel.astype(jnp.float32)
    x = jax.nn.gelu(
        quantum_conv1d(params["qconv1"], x, 3, 1, 1), approximate=False
    )
    x = jax.nn.gelu(
        quantum_conv1d(params["qconv2"], x, 3, 2, 1), approximate=False
    )
    x = x.astype(compute_dtype).transpose(0, 2, 1)
    x = x + params["pos"].astype(x.dtype)
    # Shared transformer trunk (models/whisper.py): the quantum encoder gets
    # the same tile-aligned fused-block/flash kernel paths on TPU (and the
    # tensor-parallel shard_map trunk when a mesh is passed).
    return cmodel.transformer_trunk(params, x, dims, mesh=mesh)


import functools


@functools.lru_cache(maxsize=None)
def _jitted_quantum_encoder(dims: ModelDimensions, dtype: str, mesh=None):
    return jax.jit(
        lambda enc, mel: quantum_encoder_apply(
            enc, mel, dims, jnp.dtype(dtype), mesh=mesh
        )
    )


@dataclass
class QuantumWhisperModel(WhisperModel):
    """WhisperModel whose encoder stem is quantum (drop-in for decode/eval)."""

    n_qubits: int = 4

    def embed_audio(self, mel):
        # self.mesh keys the cache like the base class (registry.py:126-129):
        # a sharded model must route the trunk through the explicit TP/SP
        # shard_map path instead of GSPMD-gathering the sharded weights
        # around each opaque kernel.
        return _jitted_quantum_encoder(
            self.dims, str(self.compute_dtype), self.mesh
        )(self.params["encoder"], mel)

    def forward(self, mel, tokens):
        # jitted quantum encoder + the base class's cached jitted decoder
        # (an eager decoder_apply here would dispatch the whole scan
        # op-by-op on every call)
        return self.logits(tokens, self.embed_audio(mel))

    __call__ = forward


def init_quantum_params(key, dims: ModelDimensions, n_qubits: int = 4) -> Dict:
    """Random-init params with a quantum stem (classical trunk included)."""
    base = cmodel.init_params(key, dims)
    kq1, kq2 = jax.random.split(jax.random.fold_in(key, 1234))
    enc = dict(base["encoder"])
    del enc["conv1"], enc["conv2"]
    enc["qconv1"] = init_quantum_conv(
        kq1, dims.n_mels, dims.n_audio_state, 3, n_qubits=n_qubits
    )
    enc["qconv2"] = init_quantum_conv(
        kq2, dims.n_audio_state, dims.n_audio_state, 3, n_qubits=n_qubits
    )
    return {"encoder": enc, "decoder": base["decoder"]}


def create_quantum_whisper_from_model(
    official: WhisperModel, n_qubits: int = 4, key=None
) -> QuantumWhisperModel:
    """Quantum model from a pretrained classical one: copy every matching
    weight, leave only the quantum conv layers random (reference
    create_quantum_whisper_from_official / create_quantum_whisper_tiny,
    quantum_whisper.py:260-318)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    params = init_quantum_params(key, official.dims, n_qubits)
    enc = dict(params["encoder"])
    for name in ("pos", "blocks", "ln_post"):
        enc[name] = official.params["encoder"][name]
    params = {"encoder": enc, "decoder": official.params["decoder"]}
    return QuantumWhisperModel(
        params=params,
        dims=official.dims,
        alignment_heads=official.alignment_heads,
        name=f"quantum-{official.name}",
        compute_dtype=official.compute_dtype,
        n_qubits=n_qubits,
    )


# Reference API alias (quantum_whisper.py:260-287): "from_official" copies
# every matching pretrained weight; the conv stems have no quantum-shaped
# match, so the effective behavior equals create_quantum_whisper_from_model.
create_quantum_whisper_from_official = create_quantum_whisper_from_model


def create_quantum_whisper_tiny(
    n_qubits: int = 4, compute_dtype: str = "float32"
) -> QuantumWhisperModel:
    """Reference factory (quantum_whisper.py:289-318): official tiny weights
    where available, random elsewhere, quantum conv stem."""
    from .registry import load_model

    official = load_model("tiny", compute_dtype=compute_dtype, init_if_missing=True)
    return create_quantum_whisper_from_model(official, n_qubits)


def trainable_mask(params: Dict, extra_names=("asr_head",)) -> Dict:
    """optax-style boolean mask: True only for quantum conv layers (and any
    task heads) - the functional equivalent of freeze_non_quantum_layers
    (reference quantum_whisper.py:320-341)."""

    def mark(path, leaf):
        names = {getattr(p, "key", getattr(p, "name", "")) for p in path}
        trainable = bool(
            names & ({"qconv1", "qconv2"} | set(extra_names))
        )
        return trainable

    return jax.tree_util.tree_map_with_path(mark, params)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

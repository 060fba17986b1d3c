"""Weight-only int8 quantization for deployment artifacts.

Per-output-channel symmetric int8 over the weight matrices of a Whisper
param pytree: each eligible leaf becomes ``{"q": int8, "s": f32 scales}``
(scales broadcast over the last dim), small leaves (LN scales, biases —
anything under ``min_size`` elements) stay untouched in f32.  The TPU
compute path is unchanged — dequantization happens once per use and XLA
fuses the ``convert * scale`` into the consumer — so this is a *storage*
format: `export.py` uses it to bake 1-byte weight constants into StableHLO
artifacts (~4x smaller files), and the decode numerics shift by at most the
per-channel rounding error (|w|_max/127 per channel).

Beyond-reference capability: the reference deploys f32 ``.pt`` checkpoints
only (/root/reference/whisper/__init__.py:103-161 downloads the full-size
file; no compression story).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

#: Leaves smaller than this stay f32 (biases, LN params, conv stems are a
#: rounding error of the total size; quantizing them risks accuracy for no
#: meaningful storage win).
DEFAULT_MIN_SIZE = 4096


def _is_qleaf(node) -> bool:
    return (
        isinstance(node, dict)
        and set(node.keys()) == {"q", "s"}
        and getattr(node.get("q"), "dtype", None) == jnp.int8
    )


def quantize_params(
    params: Dict[str, Any], min_size: int = DEFAULT_MIN_SIZE
) -> Dict[str, Any]:
    """Per-channel symmetric int8 quantization of every large weight leaf.

    Channels are the LAST dim (the output dim of the (in, out)-layout linear
    weights in models/whisper.py, and the feature dim of the token/positional
    embeddings), so each output channel keeps its own dynamic range.  Returns
    a pytree with eligible leaves replaced by ``{"q", "s"}`` dicts; use
    :func:`dequantize_params` to materialize f32 again.
    """

    def q(leaf):
        x = np.asarray(leaf)
        if x.ndim < 2 or x.size < min_size or not np.issubdtype(
            x.dtype, np.floating
        ):
            return leaf
        absmax = np.max(np.abs(x), axis=tuple(range(x.ndim - 1)))
        scale = (absmax / 127.0).astype(np.float32)
        scale = np.where(scale == 0.0, 1.0, scale)
        qv = np.clip(np.rint(x / scale), -127, 127).astype(np.int8)
        return {"q": jnp.asarray(qv), "s": jnp.asarray(scale)}

    return jax.tree.map(q, params)


def dequantize_params(qparams: Dict[str, Any], dtype=jnp.float32):
    """Inverse of :func:`quantize_params` (modulo rounding): every
    ``{"q", "s"}`` leaf becomes ``q * s`` in ``dtype``; other leaves pass
    through.  Traceable — called inside the export closure so the program
    carries int8 constants and does the dequant on device."""

    def dq(node):
        if _is_qleaf(node):
            return (node["q"].astype(dtype) * node["s"]).astype(dtype)
        return node

    return jax.tree.map(dq, qparams, is_leaf=_is_qleaf)


def quantization_error(params, qparams) -> Tuple[float, float]:
    """(max elementwise abs error, max per-channel relative error) between a
    param tree and its quantized form — the bound tests pin."""
    deq = dequantize_params(qparams)
    max_abs = 0.0
    max_rel = 0.0
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(deq)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if a.shape != b.shape:
            raise ValueError("tree mismatch")
        err = np.max(np.abs(a - b)) if a.size else 0.0
        max_abs = max(max_abs, float(err))
        denom = np.max(np.abs(a)) if a.size else 1.0
        if denom > 0:
            max_rel = max(max_rel, float(err / denom))
    return max_abs, max_rel

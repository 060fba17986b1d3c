"""Checkpoint interop: OpenAI/PyTorch ``.pt`` <-> JAX parameter pytrees.

The official distribution format is a torch pickle
``{"dims": {...}, "model_state_dict": {...}}``
(reference whisper/__init__.py:147-156).  This module maps that layout onto
our pytree (see models/whisper.py docstring for the conventions: Linear
weights transposed to (in, out), blocks stacked on a leading layer axis) and
back, so checkpoints flow both ways between the frameworks.
"""

from __future__ import annotations

import io
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .dims import ModelDimensions
from .whisper import _stack_blocks as _stack, sinusoids


def _t2np(t) -> np.ndarray:
    """torch tensor -> float32/int numpy without importing torch at top."""
    arr = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
    if arr.dtype == np.float16:
        arr = arr.astype(np.float32)
    return arr


def _linear_in(sd, prefix) -> Dict[str, jnp.ndarray]:
    p = {"w": jnp.asarray(_t2np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(_t2np(sd[f"{prefix}.bias"]))
    return p


def _ln_in(sd, prefix) -> Dict[str, jnp.ndarray]:
    return {
        "g": jnp.asarray(_t2np(sd[f"{prefix}.weight"])),
        "b": jnp.asarray(_t2np(sd[f"{prefix}.bias"])),
    }


def _attn_in(sd, prefix) -> Dict[str, Any]:
    return {
        "query": _linear_in(sd, f"{prefix}.query"),
        "key": _linear_in(sd, f"{prefix}.key"),
        "value": _linear_in(sd, f"{prefix}.value"),
        "out": _linear_in(sd, f"{prefix}.out"),
    }


def _block_in(sd, prefix, cross: bool) -> Dict[str, Any]:
    block = {
        "attn": _attn_in(sd, f"{prefix}.attn"),
        "attn_ln": _ln_in(sd, f"{prefix}.attn_ln"),
        "mlp": {
            "fc": _linear_in(sd, f"{prefix}.mlp.0"),
            "proj": _linear_in(sd, f"{prefix}.mlp.2"),
        },
        "mlp_ln": _ln_in(sd, f"{prefix}.mlp_ln"),
    }
    if cross:
        block["cross_attn"] = _attn_in(sd, f"{prefix}.cross_attn")
        block["cross_attn_ln"] = _ln_in(sd, f"{prefix}.cross_attn_ln")
    return block


def from_torch_state_dict(
    sd: Dict[str, Any], dims: ModelDimensions
) -> Dict[str, Any]:
    """Convert a reference ``model_state_dict`` to our parameter pytree."""
    enc_blocks = [
        _block_in(sd, f"encoder.blocks.{i}", cross=False)
        for i in range(dims.n_audio_layer)
    ]
    dec_blocks = [
        _block_in(sd, f"decoder.blocks.{i}", cross=True)
        for i in range(dims.n_text_layer)
    ]
    if "encoder.positional_embedding" in sd:
        enc_pos = jnp.asarray(_t2np(sd["encoder.positional_embedding"]))
    else:
        enc_pos = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    return {
        "encoder": {
            "conv1": {
                "w": jnp.asarray(_t2np(sd["encoder.conv1.weight"])),
                "b": jnp.asarray(_t2np(sd["encoder.conv1.bias"])),
            },
            "conv2": {
                "w": jnp.asarray(_t2np(sd["encoder.conv2.weight"])),
                "b": jnp.asarray(_t2np(sd["encoder.conv2.bias"])),
            },
            "pos": enc_pos,
            "blocks": _stack(enc_blocks),
            "ln_post": _ln_in(sd, "encoder.ln_post"),
        },
        "decoder": {
            "tok_emb": jnp.asarray(_t2np(sd["decoder.token_embedding.weight"])),
            "pos_emb": jnp.asarray(_t2np(sd["decoder.positional_embedding"])),
            "blocks": _stack(dec_blocks),
            "ln": _ln_in(sd, "decoder.ln"),
        },
    }


def load_torch_checkpoint(path_or_bytes) -> Tuple[Dict[str, Any], ModelDimensions]:
    """Load an official-format .pt checkpoint -> (params, dims)."""
    import torch

    if isinstance(path_or_bytes, (bytes, bytearray)):
        fp = io.BytesIO(path_or_bytes)
        ckpt = torch.load(fp, map_location="cpu", weights_only=True)
    else:
        ckpt = torch.load(path_or_bytes, map_location="cpu", weights_only=True)
    dims = ModelDimensions.from_dict(ckpt["dims"])
    params = from_torch_state_dict(ckpt["model_state_dict"], dims)
    return params, dims


# ---------------------------------------------------------------------------
# Export (our pytree -> reference-loadable state dict)
# ---------------------------------------------------------------------------


def _unstack(blocks_stacked, n_layers):
    import jax

    return [
        jax.tree.map(lambda x: np.asarray(x[i]), blocks_stacked)
        for i in range(n_layers)
    ]


def _linear_out(out, prefix, p):
    out[f"{prefix}.weight"] = np.asarray(p["w"]).T
    if "b" in p:
        out[f"{prefix}.bias"] = np.asarray(p["b"])


def _ln_out(out, prefix, p):
    out[f"{prefix}.weight"] = np.asarray(p["g"])
    out[f"{prefix}.bias"] = np.asarray(p["b"])


def _attn_out(out, prefix, p):
    for name in ("query", "key", "value", "out"):
        _linear_out(out, f"{prefix}.{name}", p[name])


def _block_out(out, prefix, bp):
    _attn_out(out, f"{prefix}.attn", bp["attn"])
    _ln_out(out, f"{prefix}.attn_ln", bp["attn_ln"])
    if "cross_attn" in bp:
        _attn_out(out, f"{prefix}.cross_attn", bp["cross_attn"])
        _ln_out(out, f"{prefix}.cross_attn_ln", bp["cross_attn_ln"])
    _linear_out(out, f"{prefix}.mlp.0", bp["mlp"]["fc"])
    _linear_out(out, f"{prefix}.mlp.2", bp["mlp"]["proj"])
    _ln_out(out, f"{prefix}.mlp_ln", bp["mlp_ln"])


def to_torch_state_dict(params: Dict[str, Any], dims: ModelDimensions) -> Dict:
    """Export our pytree as a reference-compatible numpy state dict."""
    out: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    out["encoder.conv1.weight"] = np.asarray(enc["conv1"]["w"])
    out["encoder.conv1.bias"] = np.asarray(enc["conv1"]["b"])
    out["encoder.conv2.weight"] = np.asarray(enc["conv2"]["w"])
    out["encoder.conv2.bias"] = np.asarray(enc["conv2"]["b"])
    out["encoder.positional_embedding"] = np.asarray(enc["pos"])
    for i, bp in enumerate(_unstack(enc["blocks"], dims.n_audio_layer)):
        _block_out(out, f"encoder.blocks.{i}", bp)
    _ln_out(out, "encoder.ln_post", enc["ln_post"])

    dec = params["decoder"]
    out["decoder.token_embedding.weight"] = np.asarray(dec["tok_emb"])
    out["decoder.positional_embedding"] = np.asarray(dec["pos_emb"])
    for i, bp in enumerate(_unstack(dec["blocks"], dims.n_text_layer)):
        _block_out(out, f"decoder.blocks.{i}", bp)
    _ln_out(out, "decoder.ln", dec["ln"])
    return out


def save_torch_checkpoint(path: str, params: Dict[str, Any], dims: ModelDimensions):
    """Write an official-format .pt checkpoint loadable by the reference."""
    import torch

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in to_torch_state_dict(params, dims).items()
    }
    torch.save({"dims": dims.to_dict(), "model_state_dict": sd}, path)

"""AOT deployment artifacts: serialize the fused greedy-decode program.

``export_greedy_decode`` lowers the whole serving hot path — raw audio (or
mel) → log-mel frontend → encoder → jitted greedy token loop — to ONE
StableHLO program with the model weights baked in as constants, and
``save_artifact``/``load_artifact`` wrap it in a single self-describing
file (JSON metadata header + serialized payload).  A deployment host then
needs jax (any platform the artifact was lowered for) but NOT this
package's model code, checkpoints, or tokenizer assets to produce token
ids; ``decode_artifact_tokens`` shows the 6-line post-processing (slice at
``sample_begin``, cut at ``eot``).

Cross-platform: pass ``platforms=("tpu", "cpu")`` to lower for TPU from a
CPU-only build host (jax.export multi-platform lowering).  Pallas custom
kernels are intentionally NOT stable across compiler versions, so the
export path runs with the XLA-native ops (the kernels are runtime
specializations, not semantics); this also keeps artifacts loadable on any
platform.

The reference has no deployment story at all (its decode requires the full
PyTorch package + checkpoint download, /root/reference/whisper/__init__.py:
103-161); this is a beyond-reference capability.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_MAGIC = b"QASRX001"


def export_greedy_decode(
    model_obj,
    options=None,
    batch: int = 8,
    from_audio: bool = True,
    platforms: Optional[Sequence[str]] = None,
    quantize: Optional[str] = None,
    with_kernels: bool = False,
):
    """Lower the fused greedy decode to a ``jax.export.Exported`` + metadata.

    ``from_audio``: the exported function takes (batch, 480000) float32 raw
    16 kHz audio and runs the mel frontend inside the program; otherwise it
    takes a (batch, n_mels, 3000) mel.  Returns ``(exported, meta)`` where
    ``meta`` has everything the deployment side needs to slice tokens out
    of the returned buffer.

    ``quantize="int8"`` bakes the large weight matrices as per-channel int8
    constants with f32 scales (models/quantize.py) and dequantizes on device
    per use — ~4x smaller artifact files; decode numerics shift by the
    per-channel rounding error, so the result is NOT token-exact vs the f32
    model (the fp artifact is; tests pin the quantized artifact token-exact
    vs the *dequantized* params run in-process instead).

    ``with_kernels=True`` keeps the Pallas kernels in the artifact
    (``jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call")``).
    Trade-off, measured on-chip (scripts/bench_export_gap.py, B=128,
    subprocess-isolated legs, 2026-08-21): the portable kernel-free
    artifact decodes 10.2% slower than the live path (14,676 vs 16,352
    RTF) and cannot run batches ≥256 at all (the XLA-native encoder
    materializes (B, H, 1500, 1500) attention logits — 13.2 GB at B=512),
    while a kernels-included artifact decodes 9% FASTER than live decode()
    (17,824 RTF — same device program; the artifact call skips the host
    planner's per-row result assembly/text decode, deferred to the
    deployment side via decode_artifact_tokens) but is only valid on the
    same TPU generation + compiler version it was lowered with (Mosaic
    custom calls carry no cross-version stability guarantee — the metadata
    records the jax/jaxlib versions for a load-time check).
    """
    from .audio import N_SAMPLES, log_mel_spectrogram
    from .decode import DecodingOptions, DecodingTask
    from .decode.loop import _greedy_decode_jit

    options = options or DecodingOptions(
        language="en", without_timestamps=True
    )
    if options.language is None:
        raise ValueError(
            "export needs a fixed language (the prompt is baked into the "
            "program); pass DecodingOptions(language=...)"
        )
    if options.temperature != 0 or options.beam_size or options.best_of:
        raise ValueError("export_greedy_decode is greedy-only")
    if getattr(options, "kv_int8", False):
        raise ValueError(
            "export does not support kv_int8 (its Pallas kernel is not a "
            "stable custom call)"
        )

    task = DecodingTask(model_obj, options)
    cfg = task.loop_cfg
    dims = model_obj.dims
    init = jnp.asarray(
        np.tile(np.asarray(task.initial_tokens, np.int32), (batch, 1))
    )
    if quantize not in (None, "int8"):
        raise ValueError(f"unsupported quantize mode {quantize!r}")
    if quantize == "int8":
        from .models.quantize import dequantize_params, quantize_params

        qparams = quantize_params(model_obj.params)
    else:
        qparams = model_obj.params
    rng = jax.random.PRNGKey(0)  # unused at temperature 0

    def run(x):
        # Under quantize, the closure captures int8 constants and the
        # program dequantizes them on device (XLA fuses convert*scale into
        # the consumers); without it this is a no-op passthrough.
        params = (
            dequantize_params(qparams) if quantize == "int8" else qparams
        )
        mel = log_mel_spectrogram(x, dims.n_mels) if from_audio else x
        buf, cur_len, sum_lp, no_speech, _xa = _greedy_decode_jit(
            params, cfg, mel, init, rng, jnp.float32(0.0),
            sample=False, encode=True,
        )
        return buf, cur_len, sum_lp, no_speech

    if from_audio:
        spec = jax.ShapeDtypeStruct((batch, N_SAMPLES), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch, dims.n_mels, 3000), jnp.float32)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if with_kernels:
        if platforms is not None and tuple(platforms) != ("tpu",):
            raise ValueError(
                "with_kernels=True artifacts are TPU-only (Mosaic custom "
                "calls); drop platforms= or pass ('tpu',)"
            )
        kwargs["disabled_checks"] = [
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
        exported = jax.export.export(jax.jit(run), **kwargs)(spec)
    else:
        # Pallas kernels lower to tpu_custom_call, which jax.export rejects
        # by default (no stability guarantee across compiler versions);
        # trace the XLA-native formulation — same semantics — and restore
        # the ambient policy after.
        from . import audio as _audio_mod
        from .models import whisper as _whisper_mod

        prev_flash = _whisper_mod._USE_FLASH
        prev_mel = _audio_mod._USE_FUSED_MEL
        _whisper_mod.set_flash_attention(False)
        _audio_mod.set_fused_mel(False)
        try:
            exported = jax.export.export(jax.jit(run), **kwargs)(spec)
        finally:
            _whisper_mod.set_flash_attention(prev_flash)
            _audio_mod.set_fused_mel(prev_mel)

    meta = {
        "model": getattr(model_obj, "name", "?"),
        "batch": batch,
        "from_audio": from_audio,
        "input_shape": list(spec.shape),
        "sample_begin": task.sample_begin,
        "eot": int(task.tokenizer.eot),
        "language": options.language,
        "task": options.task,
        "platforms": list(exported.platforms),
        "quantize": quantize,
        "outputs": ["buf", "cur_len", "sum_logprobs", "no_speech_probs"],
        "with_kernels": with_kernels,
    }
    if with_kernels:
        # Mosaic custom calls are only valid on the compiler version that
        # lowered them; load_artifact warns on mismatch.
        meta["jax_version"] = jax.__version__
        meta["jaxlib_version"] = getattr(
            __import__("jaxlib"), "__version__", "?"
        )
    return exported, meta


def save_artifact(path: str, exported, meta: dict) -> None:
    """One self-describing file: magic, u32 header length, JSON metadata,
    serialized StableHLO payload (weights included as constants)."""
    payload = exported.serialize()
    head = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(np.uint32(len(head)).tobytes())
        f.write(head)
        f.write(payload)


def load_artifact(path: str):
    """Returns ``(call, meta)``; ``call`` runs on any platform the artifact
    was lowered for."""
    import warnings

    # Stream the sections (the payload embeds all model weights and can be
    # GBs; slicing a whole-file read would hold several transient copies).
    with open(path, "rb") as f:
        if f.read(len(_MAGIC)) != _MAGIC:
            raise ValueError(f"{path} is not a qasr export artifact")
        n = int(np.frombuffer(f.read(4), np.uint32)[0])
        meta = json.loads(f.read(n).decode())
        exported = jax.export.deserialize(bytearray(f.read()))
    if meta.get("with_kernels") and meta.get("jax_version") != jax.__version__:
        warnings.warn(
            f"artifact {path} embeds Mosaic kernel custom calls lowered "
            f"with jax {meta.get('jax_version')}, but this host runs "
            f"{jax.__version__}; kernel custom calls carry no "
            "cross-version stability guarantee — re-export here or use a "
            "kernel-free artifact for portability",
            stacklevel=2,
        )
    return exported.call, meta


def decode_artifact_tokens(
    buf: np.ndarray, cur_len: np.ndarray, meta: dict
) -> Tuple[list, ...]:
    """Slice per-row token ids out of an artifact's ``buf`` output (the
    deployment-side post-processing; pair with any tiktoken-rank decoder
    for text)."""
    sb, eot = meta["sample_begin"], meta["eot"]
    cur = np.asarray(cur_len)
    if cur.ndim == 0:  # the greedy loop's position counter is lockstep
        cur = np.full(np.asarray(buf).shape[0], int(cur))
    out = []
    for row, n in zip(np.asarray(buf), cur):
        s = row[sb: int(n)]
        hits = np.nonzero(s == eot)[0]
        out.append((s[: hits[0]] if hits.size else s).tolist())
    return tuple(out)

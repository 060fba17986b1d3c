"""Model registry: official names, SHA256-verified download, cached loading.

Mirrors the reference loader semantics (whisper/__init__.py:17-161): the same
model names, download URLs (public OpenAI artifacts), cache directory, and
checkpoint format - returning a (params, dims, alignment_heads) bundle
instead of an nn.Module.
"""

from __future__ import annotations

import base64
import functools
import gzip
import hashlib
import os
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

from .convert import load_torch_checkpoint
from .dims import ModelDimensions
from . import whisper as _model

# Public OpenAI checkpoint URLs (data table; reference whisper/__init__.py:17-32).
_MODELS = {
    "tiny.en": "https://openaipublic.azureedge.net/main/whisper/models/d3dd57d32accea0b295c96e26691aa14d8822fac7d9d27d5dc00b4ca2826dd03/tiny.en.pt",
    "tiny": "https://openaipublic.azureedge.net/main/whisper/models/65147644a518d12f04e32d6f3b26facc3f8dd46e5390956a9424a650c0ce22b9/tiny.pt",
    "base.en": "https://openaipublic.azureedge.net/main/whisper/models/25a8566e1d0c1e2231d1c762132cd20e0f96a85d16145c3a00adf5d1ac670ead/base.en.pt",
    "base": "https://openaipublic.azureedge.net/main/whisper/models/ed3a0b6b1c0edf879ad9b11b1af5a0e6ab5db9205f891f668f8b0e6c6326e34e/base.pt",
    "small.en": "https://openaipublic.azureedge.net/main/whisper/models/f953ad0fd29cacd07d5a9eda5624af0f6bcf2258be67c92b79389873d91e0872/small.en.pt",
    "small": "https://openaipublic.azureedge.net/main/whisper/models/9ecf779972d90ba49c06d968637d720dd632c55bbf19d441fb42bf17a411e794/small.pt",
    "medium.en": "https://openaipublic.azureedge.net/main/whisper/models/d7440d1dc186f76616474e0ff0b3b6b879abc9d1a4926b7adfa41db2d497ab4f/medium.en.pt",
    "medium": "https://openaipublic.azureedge.net/main/whisper/models/345ae4da62f9b3d59415adc60127b97c714f32e89e936602e85993674d08dcb1/medium.pt",
    "large-v1": "https://openaipublic.azureedge.net/main/whisper/models/e4b87e7e0bf463eb8e6956e646f1e277e901512310def2c24bf0e11bd3c28e9a/large-v1.pt",
    "large-v2": "https://openaipublic.azureedge.net/main/whisper/models/81f7c96c852ee8fc832187b0132e569d6c3065a3252ed18e56effd0b6a73e524/large-v2.pt",
    "large-v3": "https://openaipublic.azureedge.net/main/whisper/models/e5b1a55b89c1367dacf97e3e19bfd829a01529dbfdeefa8caeb59b3f1b81dadb/large-v3.pt",
    "large": "https://openaipublic.azureedge.net/main/whisper/models/e5b1a55b89c1367dacf97e3e19bfd829a01529dbfdeefa8caeb59b3f1b81dadb/large-v3.pt",
    "large-v3-turbo": "https://openaipublic.azureedge.net/main/whisper/models/aff26ae408abcba5fbf8813c21e62b0941638c5f6eebfb145be0c9839262a19a/large-v3-turbo.pt",
    "turbo": "https://openaipublic.azureedge.net/main/whisper/models/aff26ae408abcba5fbf8813c21e62b0941638c5f6eebfb145be0c9839262a19a/large-v3-turbo.pt",
}

# base85+gzip (n_text_layer, n_text_head) boolean masks of the cross-attention
# heads used for word-level timing (data table; reference __init__.py:36-51).
_ALIGNMENT_HEADS = {
    "tiny.en": b"ABzY8J1N>@0{>%R00Bk>$p{7v037`oCl~+#00",
    "tiny": b"ABzY8bu8Lr0{>%RKn9Fp%m@SkK7Kt=7ytkO",
    "base.en": b"ABzY8;40c<0{>%RzzG;p*o+Vo09|#PsxSZm00",
    "base": b"ABzY8KQ!870{>%RzyTQH3`Q^yNP!>##QT-<FaQ7m",
    "small.en": b"ABzY8>?_)10{>%RpeA61k&I|OI3I$65C{;;pbCHh0B{qLQ;+}v00",
    "small": b"ABzY8DmU6=0{>%Rpa?J`kvJ6qF(V^F86#Xh7JUGMK}P<N0000",
    "medium.en": b"ABzY8usPae0{>%R7<zz_OvQ{)4kMa0BMw6u5rT}kRKX;$NfYBv00*Hl@qhsU00",
    "medium": b"ABzY8B0Jh+0{>%R7}kK1fFL7w6%<-Pf*t^=N)Qr&0RR9",
    "large-v1": b"ABzY8r9j$a0{>%R7#4sLmoOs{s)o3~84-RPdcFk!JR<kSfC2yj",
    "large-v2": b"ABzY8zd+h!0{>%R7=D0pU<_bnWW*tkYAhobTNnu$jnkEkXqp)j;w1Tzk)UH3X%SZd&fFZ2fC2yj",
    "large-v3": b"ABzY8gWO1E0{>%R7(9S+Kn!D~%ngiGaR?*L!iJG9p-nab0JQ=-{D1-g00",
    "large": b"ABzY8gWO1E0{>%R7(9S+Kn!D~%ngiGaR?*L!iJG9p-nab0JQ=-{D1-g00",
    "large-v3-turbo": b"ABzY8j^C+e0{>%RARaKHP%t(lGR*)0g!tONPyhe`",
    "turbo": b"ABzY8j^C+e0{>%RARaKHP%t(lGR*)0g!tONPyhe`",
}


@functools.lru_cache(maxsize=None)
def _jitted_encoder(dims: ModelDimensions, dtype: str, mesh=None):
    import jax
    import jax.numpy as jnp

    return jax.jit(
        lambda enc, mel: _model.encoder_apply(
            enc, mel, dims, jnp.dtype(dtype), mesh=mesh
        )
    )


@functools.lru_cache(maxsize=None)
def _jitted_decoder(dims: ModelDimensions, dtype: str):
    import jax
    import jax.numpy as jnp

    return jax.jit(
        lambda dec, tokens, xa: _model.decoder_apply(
            dec, tokens, xa, dims, jnp.dtype(dtype)
        )
    )


@dataclass
class WhisperModel:
    """A loaded model: parameter pytree + dims + metadata.

    This is the object our decode/transcribe layers consume; it carries no
    framework state (pure data), so it is trivially shardable and jittable.
    """

    params: Dict[str, Any]
    dims: ModelDimensions
    alignment_heads: Optional[np.ndarray] = None  # (n_text_layer, n_text_head) bool
    name: str = "custom"
    compute_dtype: Any = field(default="float32")
    # Device mesh this model is sharded over (set by .shard()); threaded
    # into decode/encode jit keys so mesh-aware programs (the explicit
    # tensor-parallel trunk) compile per mesh.
    mesh: Optional[Any] = None

    @property
    def is_multilingual(self) -> bool:
        return _model.is_multilingual(self.dims)

    @property
    def num_languages(self) -> int:
        return _model.num_languages(self.dims)

    def shard(self, mesh) -> "WhisperModel":
        """Place the params on ``mesh`` (TP/replicated specs from
        parallel.param_specs) and pin the mesh on the model so subsequent
        decode/transcribe calls build mesh-aware programs.  Returns self."""
        from .. import parallel

        self.params = parallel.shard_params(self.params, mesh)
        self.mesh = mesh if mesh is not None and mesh.devices.size > 1 else None
        # Cached DecodingTasks embed the old mesh in their LoopConfigs.
        self.__dict__.pop("_qasr_task_cache", None)
        return self

    def embed_audio(self, mel):
        return _jitted_encoder(self.dims, str(self.compute_dtype), self.mesh)(
            self.params["encoder"], mel
        )

    def logits(self, tokens, audio_features):
        return _jitted_decoder(self.dims, str(self.compute_dtype))(
            self.params["decoder"], tokens, audio_features
        )

    def forward(self, mel, tokens):
        # Thread the pinned mesh so a sharded model routes its encoder
        # through the explicit TP/SP trunk (embed_audio already does).
        return _model.forward(
            self.params, mel, tokens, self.dims, self._dtype, mesh=self.mesh
        )

    __call__ = forward

    @property
    def _dtype(self):
        import jax.numpy as jnp

        return jnp.dtype(self.compute_dtype)

    def set_alignment_heads(self, dump: bytes):
        array = np.frombuffer(
            gzip.decompress(base64.b85decode(dump)), dtype=bool
        ).copy()
        self.alignment_heads = array.reshape(
            self.dims.n_text_layer, self.dims.n_text_head
        )

    def default_alignment_heads(self) -> np.ndarray:
        # Last half of the decoder layers (reference model.py:270-276).
        heads = np.zeros((self.dims.n_text_layer, self.dims.n_text_head), bool)
        heads[self.dims.n_text_layer // 2 :] = True
        return heads

    # Reference API parity (model.py:343-345): bound below to avoid cycles.
    def decode(self, mel, options=None, **kwargs):
        from .. import decode as _decode

        options = options or _decode.DecodingOptions()
        return _decode.decode(self, mel, options, **kwargs)

    def detect_language(self, mel, tokenizer=None):
        from ..decode import detect_language as _dl

        return _dl(self, mel, tokenizer)

    def transcribe(self, audio, **kwargs):
        from ..transcribe import transcribe as _tr

        return _tr(self, audio, **kwargs)


def available_models() -> List[str]:
    return list(_MODELS.keys())


def _file_sha256(path: str) -> str:
    # stream in 1 MB chunks: a large-v3 checkpoint is ~3 GB and must not be
    # slurped into one bytes object just to hash it
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            buf = f.read(1 << 20)
            if not buf:
                break
            h.update(buf)
    return h.hexdigest()


def _download(url: str, root: str) -> str:
    os.makedirs(root, exist_ok=True)
    expected_sha256 = url.split("/")[-2]
    target = os.path.join(root, os.path.basename(url))
    if os.path.isfile(target):
        if _file_sha256(target) == expected_sha256:
            return target
    with urllib.request.urlopen(url) as src, open(target, "wb") as out:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            out.write(buf)
    if _file_sha256(target) != expected_sha256:
        raise RuntimeError(
            "Model downloaded but the SHA256 checksum does not match."
        )
    return target


def load_model(
    name: str,
    download_root: Optional[str] = None,
    compute_dtype: str = "float32",
    init_if_missing: bool = False,
) -> WhisperModel:
    """Load a Whisper model by official name or checkpoint path.

    ``init_if_missing=True`` falls back to random initialization with the
    official dims when the checkpoint can't be fetched (the reference's
    3-tier fallback, quantum_whisper.py:182-204) - clearly flagged in
    ``model.name``.
    """
    if download_root is None:
        default = os.path.join(os.path.expanduser("~"), ".cache")
        download_root = os.path.join(os.getenv("XDG_CACHE_HOME", default), "whisper")

    alignment_heads = None
    try:
        if name in _MODELS:
            path = _download(_MODELS[name], download_root)
            alignment_dump = _ALIGNMENT_HEADS[name]
        elif os.path.isfile(name):
            path = name
            alignment_dump = None
        else:
            raise RuntimeError(
                f"Model {name} not found; available models = {available_models()}"
            )
        params, dims = load_torch_checkpoint(path)
    except Exception:
        if not init_if_missing:
            raise
        import jax

        from .dims import dims_for

        dims = dims_for(name) if name in _MODELS else dims_for("tiny")
        params = _model.init_params(jax.random.PRNGKey(0), dims)
        model = WhisperModel(
            params, dims, name=f"{name} (random-init)", compute_dtype=compute_dtype
        )
        model.alignment_heads = model.default_alignment_heads()
        return model

    model = WhisperModel(params, dims, name=name, compute_dtype=compute_dtype)
    if alignment_dump is not None:
        model.set_alignment_heads(alignment_dump)
    else:
        model.alignment_heads = model.default_alignment_heads()
    return model


def save_model(model: WhisperModel, path: str) -> None:
    """Save in the official .pt format (loadable by the reference).

    Only classical-stem models map onto the official layout; a quantum-stem
    model (qconv1/qconv2 instead of conv1/conv2) has no official format —
    use ``train.checkpoint.save_pytree`` for those."""
    if "conv1" not in model.params.get("encoder", {}):
        raise ValueError(
            "save_model exports the official .pt layout, which has no "
            "quantum stem; save quantum models with "
            "train.checkpoint.save_pytree instead"
        )
    from .convert import save_torch_checkpoint

    save_torch_checkpoint(path, model.params, model.dims)

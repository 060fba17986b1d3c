"""qasr_ijcnlp_tpu: TPU-native quantum-enhanced Whisper ASR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Debjit-Dhar/QASR_IJCNLP (classical + quantum Whisper Tiny: LibriSpeech ASR
eval/training, Speech Commands classification, long-form transcription), with
first-class SPMD sharding over TPU meshes.

Top-level API mirrors the reference's vendored `whisper` package surface:
``load_model``, ``log_mel_spectrogram``, ``pad_or_trim``, ``decode``,
``transcribe``, ``DecodingOptions``.
"""

__version__ = "0.1.0"

from .audio import (  # noqa: F401
    CHUNK_LENGTH,
    HOP_LENGTH,
    N_FFT,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    load_audio,
    log_mel_spectrogram,
    mel_filters,
    pad_or_trim,
)


def __getattr__(name):
    # Lazy imports keep `import qasr_ijcnlp_tpu` light for audio-only users.
    if name in ("load_model", "available_models", "save_model"):
        from .models import registry

        return getattr(registry, name)
    if name in (
        "decode", "DecodingOptions", "DecodingResult", "detect_language",
        "Draft",
    ):
        from . import decode as _decode

        return getattr(_decode, name)
    if name == "transcribe":
        from .transcribe import transcribe as _transcribe

        return _transcribe
    if name == "DecodeEngine":
        from .decode.engine import DecodeEngine

        return DecodeEngine
    if name == "StreamingTranscriber":
        from .streaming import StreamingTranscriber

        return StreamingTranscriber
    if name in ("export_greedy_decode", "save_artifact", "load_artifact"):
        from . import export as _export

        return getattr(_export, name)
    raise AttributeError(f"module 'qasr_ijcnlp_tpu' has no attribute {name!r}")

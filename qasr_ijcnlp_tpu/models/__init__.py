"""Model families: classical Whisper, quantum Whisper, classifiers, char-ASR."""

from .dims import ModelDimensions, dims_for, tiny_dims  # noqa: F401
from .registry import (  # noqa: F401
    WhisperModel,
    available_models,
    load_model,
    save_model,
)
from . import whisper  # noqa: F401

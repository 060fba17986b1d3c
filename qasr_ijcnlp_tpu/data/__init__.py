"""Datasets and host-side loading: LibriSpeech, Speech Commands, char vocab.

Host-side layer (audio decode + mel live on CPU; arrays stream to the TPU
through the prefetching loader in .loader).  Mirrors the reference's data
surface:

* char-level LibriSpeech ASR items — mel (n_mels, 3000) + <START>…<END>
  char indices padded to ``max_text_len``
  (/root/reference/librispeech_asr.py:41-130);
* whole-utterance token-level items for classical training
  (/root/reference/train_classical_whisper_asr.py:83-142);
* Speech Commands classification items
  (/root/reference/train_quantum_whisper.py:30-129);
* the graceful dataset fallback chain (torchaudio → HF → synthetic) the
  reference uses throughout (SURVEY.md §5) — in this container HF needs
  network, so the terminal fallback is a deterministic synthetic dataset,
  clearly flagged via ``.is_synthetic``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..audio import N_FRAMES, SAMPLE_RATE, log_mel_spectrogram, pad_or_trim

SPEECH_COMMANDS_LABELS = [
    "backward", "bed", "bird", "cat", "dog", "down", "eight", "five",
    "follow", "forward", "four", "go", "happy", "house", "learn", "left",
    "marvin", "nine", "no", "off", "on", "one", "right", "seven", "sheila",
    "six", "stop", "three", "tree", "two", "up", "visual", "wow", "yes",
    "zero",
]


# ---------------------------------------------------------------------------
# Character vocabulary
# ---------------------------------------------------------------------------

PAD, UNK, START, END = 0, 1, 2, 3
_SPECIALS = ["<PAD>", "<UNK>", "<START>", "<END>"]


@dataclass
class CharVocabulary:
    """Char↔index mapping with the reference's special-token layout
    (librispeech_asr.py:186-217; the 'UNK' vs '<UNK>' quirk is fixed —
    SURVEY.md §2.4)."""

    char_to_idx: Dict[str, int]

    @classmethod
    def build(cls, texts: Sequence[str]) -> "CharVocabulary":
        chars = set()
        for text in texts:
            chars.update(text.lower())
        ordered = sorted(c for c in chars if c not in _SPECIALS)
        mapping = {tok: i for i, tok in enumerate(_SPECIALS)}
        mapping.update({c: i + 4 for i, c in enumerate(ordered)})
        return cls(mapping)

    @property
    def num_chars(self) -> int:
        return len(self.char_to_idx)

    @property
    def idx_to_char(self) -> Dict[int, str]:
        return {i: c for c, i in self.char_to_idx.items()}

    def encode(self, text: str, max_len: int = 100) -> np.ndarray:
        """<START> text <END>, padded/truncated to ``max_len``
        (librispeech_asr.py:102-127)."""
        ids = [START]
        for ch in text.lower():
            ids.append(self.char_to_idx.get(ch, UNK))
        ids = ids[: max_len - 1]
        ids.append(END)
        out = np.full(max_len, PAD, np.int32)
        out[: len(ids)] = ids
        return out

    def decode(self, ids: Sequence[int]) -> str:
        inv = self.idx_to_char
        chars = []
        for i in ids:
            i = int(i)
            if i == END:
                break
            if i in (PAD, START):
                continue
            chars.append(inv.get(i, ""))
        return "".join(chars)

    def to_json(self) -> str:
        return json.dumps(self.char_to_idx)

    @classmethod
    def from_json(cls, s: str) -> "CharVocabulary":
        return cls({k: int(v) for k, v in json.loads(s).items()})


def build_character_vocabulary(texts: Sequence[str]) -> Tuple[Dict[str, int], int]:
    """Reference-signature wrapper returning (char_to_idx, num_chars)."""
    vocab = CharVocabulary.build(texts)
    return vocab.char_to_idx, vocab.num_chars


# ---------------------------------------------------------------------------
# Synthetic fallback corpus (deterministic, offline)
# ---------------------------------------------------------------------------

_SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "speech recognition converts audio into text",
    "quantum circuits process amplitudes in superposition",
    "a transformer encoder attends over mel spectrogram frames",
    "the weather today is sunny with a gentle breeze",
    "please remember to validate the dataset before training",
    "character level decoders predict one symbol at a time",
    "tensor processing units multiply large matrices quickly",
    "she sells sea shells by the sea shore",
    "open the pod bay doors please",
]


def _synthetic_utterance(index: int, seconds: float = 3.0) -> Tuple[np.ndarray, str]:
    """Deterministic pseudo-speech: per-sentence formant-ish sine mixture."""
    text = _SENTENCES[index % len(_SENTENCES)]
    seed = int(hashlib.sha1(f"{index}:{text}".encode()).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    n = int(seconds * SAMPLE_RATE)
    t = np.arange(n) / SAMPLE_RATE
    f0 = 100 + 50 * rng.random()
    audio = sum(
        a * np.sin(2 * np.pi * (f0 * k + 5 * np.sin(2 * np.pi * 1.3 * t)) * t)
        for k, a in [(1, 0.1), (2, 0.05), (3, 0.02)]
    )
    audio += 0.01 * rng.standard_normal(n)
    return audio.astype(np.float32), text


class SyntheticLibriSpeech:
    """Offline stand-in with the LibriSpeech item contract (audio, text)."""

    is_synthetic = True

    def __init__(self, split: str = "train", size: int = 64):
        self.split = split
        self.size = size
        self._offset = {"train": 0, "validation": 10_000, "test": 20_000}.get(
            split.split(".")[0], 30_000
        )

    def __len__(self):
        return self.size

    def __getitem__(self, i: int) -> Tuple[np.ndarray, str]:
        return _synthetic_utterance(self._offset + i)


class SyntheticSpeechCommands:
    """Offline stand-in with the Speech Commands contract (audio, label_id)."""

    is_synthetic = True

    def __init__(self, split: str = "train", size: int = 64):
        self.split = split
        self.size = size
        self._offset = {"train": 0, "validation": 50_000, "test": 90_000}.get(
            split, 0
        )

    def __len__(self):
        return self.size

    def __getitem__(self, i: int) -> Tuple[np.ndarray, int]:
        label = (self._offset + i) % len(SPEECH_COMMANDS_LABELS)
        audio, _ = _synthetic_utterance(self._offset + i, seconds=1.0)
        return audio, label


# ---------------------------------------------------------------------------
# Real datasets (HF hub, network permitting) with fallback
# ---------------------------------------------------------------------------


def load_librispeech(
    split: str = "train.100", max_samples: Optional[int] = None, verbose: bool = True
):
    """(audio float32 16 kHz, transcript) pairs.

    Tries HF ``openslr/librispeech_asr`` (the reference's fallback source,
    train_quantum_whisper_asr.py:80); falls back to the synthetic corpus.
    """
    try:
        import datasets

        ds = datasets.load_dataset(
            "openslr/librispeech_asr", "clean", split=split, streaming=False
        )
        if max_samples:
            ds = ds.select(range(min(max_samples, len(ds))))

        class _HFLibriSpeech:
            is_synthetic = False
            _texts = None

            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                item = ds[i]
                return (
                    np.asarray(item["audio"]["array"], np.float32),
                    item["text"],
                )

            def text(self, i):
                # Text-only access: a plain ds[i] decodes the FLAC audio
                # feature just to throw it away — vocab building touches
                # ~1000 rows, so read the text column once instead.
                if _HFLibriSpeech._texts is None:
                    _HFLibriSpeech._texts = ds["text"]
                return _HFLibriSpeech._texts[i]

        return _HFLibriSpeech()
    except Exception as e:  # no network / no cache
        if verbose:
            print(f"LibriSpeech unavailable ({type(e).__name__}); "
                  "using the synthetic offline corpus")
        return SyntheticLibriSpeech(split, size=max_samples or 64)


def load_speech_commands(
    split: str = "train", max_samples: Optional[int] = None, verbose: bool = True
):
    """(audio float32 16 kHz, label_id in [0, 35)) pairs."""
    try:
        import datasets

        ds = datasets.load_dataset(
            "google/speech_commands", "v0.02", split=split, streaming=False
        )
        # HF's ClassLabel ids are in dataset order ('yes','no','up',...,
        # '_silence_' = 36 classes); the reference builds its label map from
        # sorted(all_labels) (train_quantum_whisper.py:565) — the 35-class
        # alphabetical space SPEECH_COMMANDS_LABELS / the synthetic dataset
        # use.  Remap by NAME and drop classes outside the 35 (e.g.
        # '_silence_'), so HF-trained and synthetic-trained models share one
        # label semantics.
        target = {name: i for i, name in enumerate(SPEECH_COMMANDS_LABELS)}
        names = ds.features["label"].names
        remap = {i: target[n] for i, n in enumerate(names) if n in target}
        raw_labels = ds["label"]  # column read: no audio decode
        keep = [i for i, lab in enumerate(raw_labels) if int(lab) in remap]
        if len(keep) != len(ds):
            ds = ds.select(keep)
        if max_samples:
            ds = ds.select(range(min(max_samples, len(ds))))

        class _HFSpeechCommands:
            is_synthetic = False

            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                item = ds[i]
                return (
                    np.asarray(item["audio"]["array"], np.float32),
                    remap[int(item["label"])],
                )

        return _HFSpeechCommands()
    except Exception as e:
        if verbose:
            print(f"Speech Commands unavailable ({type(e).__name__}); "
                  "using the synthetic offline corpus")
        return SyntheticSpeechCommands(split, size=max_samples or 64)


# ---------------------------------------------------------------------------
# Feature extraction views
# ---------------------------------------------------------------------------


def dataset_texts(base, n: Optional[int] = None) -> List[str]:
    """Transcripts of the first ``n`` items, via the dataset's text-only
    accessor when it has one (skips decoding the audio feature — vocab
    building over 1000 HF rows would otherwise decode 1000 FLAC files)."""
    n = len(base) if n is None else min(n, len(base))
    if hasattr(base, "text"):
        return [base.text(i) for i in range(n)]
    return [base[i][1] for i in range(n)]


def create_dataloader(dataset, batch_size: int = 8, shuffle: bool = True,
                      num_workers: int = 0):
    """Reference-signature loader factory (librispeech_asr.py:225-233);
    ``num_workers`` is accepted for compatibility (prefetching is handled by
    loader.prefetch_to_device)."""
    from .loader import DataLoader

    return DataLoader(dataset, batch_size=batch_size, shuffle=shuffle)


def validate_dataset(dataset, num_samples: int = 5, log=print) -> None:
    """Print a sample inspection (reference librispeech_asr.py:235-254)."""
    log(f"Dataset validation - showing {num_samples} samples:")
    log("-" * 60)
    for i in range(min(num_samples, len(dataset))):
        item = dataset[i]
        parts = []
        for field in item:
            arr = np.asarray(field)
            parts.append(f"shape={arr.shape} dtype={arr.dtype}"
                         if arr.ndim else f"value={arr}")
        log(f"Sample {i + 1}: " + "  ".join(parts))
    log(f"Total samples: {len(dataset)}")
    log("-" * 60)


class CharASRView:
    """Dataset view yielding (mel (n_mels, 3000), char_ids (max_text_len,))
    like the reference LibriSpeechASRDataset (librispeech_asr.py:41-130)."""

    def __init__(self, base, vocab: CharVocabulary, max_text_len: int = 100,
                 n_mels: int = 80):
        self.base = base
        self.vocab = vocab
        self.max_text_len = max_text_len
        self.n_mels = n_mels

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        audio, text = self.base[i]
        mel = np.asarray(
            log_mel_spectrogram(pad_or_trim(audio), self.n_mels)
        )
        return mel, self.vocab.encode(text, self.max_text_len)

    def texts(self, n: Optional[int] = None) -> List[str]:
        return dataset_texts(self.base, n)


class TokenASRView:
    """Dataset view yielding (mel, token_ids padded with -100) like the
    classical trainer (train_classical_whisper_asr.py:100-176)."""

    def __init__(self, base, tokenizer, max_tokens: int = 448, n_mels: int = 80,
                 uppercase: bool = True):
        self.base = base
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        self.n_mels = n_mels
        self.uppercase = uppercase

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        audio, text = self.base[i]
        mel = np.asarray(log_mel_spectrogram(pad_or_trim(audio), self.n_mels))
        if self.uppercase:
            text = text.upper()
        tok = self.tokenizer
        ids = [tok.sot, tok.no_timestamps, *tok.encode(" " + text.strip()),
               tok.eot][: self.max_tokens]
        out = np.full(self.max_tokens, -100, np.int32)
        out[: len(ids)] = ids
        return mel, out


class ClassificationView:
    """Dataset view yielding (mel (n_mels, 3000), label) like the Speech
    Commands classifier path (train_quantum_whisper.py:52-77: pad/trim to 30 s
    then re-pad the mel to exactly 3000 frames)."""

    def __init__(self, base, n_mels: int = 80):
        self.base = base
        self.n_mels = n_mels

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        audio, label = self.base[i]
        mel = np.asarray(log_mel_spectrogram(pad_or_trim(audio), self.n_mels))
        if mel.shape[-1] != N_FRAMES:
            mel = np.asarray(pad_or_trim(mel, N_FRAMES))
        return mel, np.int32(label)

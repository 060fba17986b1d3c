"""Online (incremental) transcription: audio in as it arrives, stable
partial transcripts out.

The reference can only transcribe COMPLETE files (its long-form loop seeks
through a finished mel, /root/reference/whisper/whisper/transcribe.py:272);
this module adds true streaming — a capability the reference lacks
entirely:

* ``StreamingTranscriber.feed(chunk)`` appends 16 kHz PCM and, once enough
  new audio accumulated, re-decodes the current (≤30 s) window.
* **LocalAgreement-2 commit policy**: a token is committed (emitted, never
  retracted) only once two CONSECUTIVE window decodes agree on it — the
  standard streaming-Whisper stabilizer for the flickering tail of partial
  hypotheses.
* **Timestamp-based window slide**: when the window approaches 30 s, all
  text up to the last complete timestamp segment is force-committed and
  the audio before that boundary is dropped, so memory and per-decode cost
  stay bounded on unbounded streams.
* ``end()`` decodes the remaining audio once more and commits everything.

Every decode is the package's plain temperature-0 decode — greedy, or
beam search when ``options.beam_size`` is set (one jitted program per
shape — the window is always padded to 30 s, so ONE compiled program
serves the whole stream).  Serving exposes this as the session API
``POST /v1/stream/sessions`` (serving.py).
"""

from __future__ import annotations

import threading
from typing import List, Optional

import numpy as np

from .audio import N_SAMPLES as _WINDOW_SAMPLES
from .audio import SAMPLE_RATE, log_mel_spectrogram, pad_or_trim
from .decode import DecodingOptions, DecodingResult, decode


def _common_prefix(a: List[int], b: List[int]) -> List[int]:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return a[:n]


class StreamingTranscriber:
    """Incremental transcription session over one audio stream.

    Thread-safe per session (one lock); concurrent sessions each hold
    their own.  ``options`` must be greedy (temperature 0) and keep
    timestamps ON (the slide policy needs segment boundaries); language
    may be None (detected on the first decoded window, then pinned).
    """

    def __init__(
        self,
        model,
        options: Optional[DecodingOptions] = None,
        step_seconds: float = 1.0,
        window_seconds: float = 29.0,
        agreement: int = 2,
        decode_fn=None,
        vad_rms: float = 0.0,
        word_timestamps: bool = False,
    ):
        """``decode_fn``: optional replacement for the window decode —
        called with the padded 30 s raw audio, must return a mapping with
        ``tokens`` (timestamps included) and ``language``.  Serving passes
        a DecodeEngine submit here so concurrent sessions share the
        continuous-batching slot pool instead of serializing; the engine's
        tokens are exact vs the plain decode, so session output is
        identical either way.

        ``vad_rms``: energy gate — while the buffered window's RMS stays
        below this, feed() skips the decode entirely (a microphone stream
        is mostly silence; the saved decodes are the dominant cost).  When
        a silent window slides, its audio is dropped without transcribing.
        0.0 (default) disables the gate.

        ``word_timestamps``: attach per-word timings (cross-attention DTW,
        align/) to the COMMITTED text whenever a window finalizes (slide or
        end) — results accumulate in the ``words`` output field with
        stream-absolute times."""
        options = options or DecodingOptions()
        if options.temperature != 0 or options.best_of:
            raise ValueError(
                "streaming decodes at temperature 0 (greedy or beam); "
                "best_of requires sampling"
            )
        if options.without_timestamps:
            raise ValueError(
                "streaming needs timestamp tokens (the window-slide policy "
                "cuts at segment boundaries); leave without_timestamps False"
            )
        self.model = model
        self.options = options
        self.decode_fn = decode_fn
        self.vad_rms = float(vad_rms)
        self.word_timestamps = bool(word_timestamps)
        self._words: List[dict] = []
        self.step = int(step_seconds * SAMPLE_RATE)
        self.window = int(window_seconds * SAMPLE_RATE)
        self.agreement = max(2, agreement)
        self._ts_begin = None  # resolved from the first result's tokenizer

        self._audio = np.zeros(0, np.float32)
        self._decoded_at = 0  # samples already seen by the last decode
        self._offset = 0.0  # stream seconds dropped by window slides
        self._committed_text = ""  # never retracted
        self._win_committed: List[int] = []  # committed tokens, this window
        self._prev_hyp: Optional[List[int]] = None
        self._language: Optional[str] = options.language
        self._closed = False
        self._lock = threading.Lock()

    # -- internals -----------------------------------------------------------

    def _decode_window(self) -> DecodingResult:
        if self.decode_fn is not None:
            from types import SimpleNamespace

            out = self.decode_fn(pad_or_trim(self._audio))
            result = SimpleNamespace(
                tokens=list(out["tokens"]),
                language=out.get("language") or self._language or "en",
            )
        else:
            opts = self.options
            if self._language is not None and opts.language is None:
                from dataclasses import replace

                opts = replace(opts, language=self._language)
            mel = log_mel_spectrogram(
                pad_or_trim(self._audio), self.model.dims.n_mels
            )
            (result,) = decode(self.model, mel[None], opts)
        self._language = result.language
        return result

    def _tokenizer(self):
        from .tokenizer import get_tokenizer

        return get_tokenizer(
            self.model.is_multilingual,
            num_languages=self.model.num_languages,
            language=self._language or "en",
            task=self.options.task,
        )

    def _commit(self, tokens: List[int]) -> str:
        """Emit ``tokens`` beyond the already-committed window prefix.

        The agreement path only calls this with hypotheses whose committed
        prefix is intact; final/slide commits emit the blind suffix — if
        the last decode diverged inside the committed region, the junction
        may garble (the standard never-retract streaming trade-off: the
        alternative is retracting text a client already consumed)."""
        new = tokens[len(self._win_committed):]
        if not new:
            return ""
        tok = self._tokenizer()
        delta = tok.decode(new)  # decode() drops timestamp specials
        self._win_committed = list(tokens)
        self._committed_text += delta
        return delta

    def _maybe_slide(self, hyp: List[int]) -> None:
        """Near the 30 s ceiling: force-commit up to the last timestamp
        token AT OR AFTER the committed point and drop the audio before it
        (a boundary inside the committed region would re-decode — and
        re-commit — audio whose text was already emitted)."""
        if len(self._audio) < self.window:
            return
        ts_begin = self._ts_begin
        k = len(self._win_committed)
        pos, ts = -1, None
        for i, t in enumerate(hyp):
            if t >= ts_begin and i >= max(k, 1):
                pos, ts = i, t
        if pos > 0:
            seconds = (ts - ts_begin) * 0.02
            # clamp: the decoder can emit timestamps past the real audio
            # (the window is silence-padded to 30 s)
            cut_samples = min(int(seconds * SAMPLE_RATE), len(self._audio))
            if cut_samples > 0:
                self._commit(hyp[:pos])
                self._drop(cut_samples)
                return
        # no usable boundary at/after the committed point: commit the whole
        # hypothesis and drop exactly the DECODED extent (30 s) — never
        # audio the decoder hasn't seen
        self._commit(hyp)
        self._drop(min(len(self._audio), _WINDOW_SAMPLES))

    def _drop(self, cut_samples: int) -> None:
        self._align_committed()  # the window's committed text is now final
        self._audio = self._audio[cut_samples:]
        self._offset += cut_samples / SAMPLE_RATE
        self._decoded_at = 0
        self._win_committed = []
        self._prev_hyp = None

    def _align_committed(self) -> None:
        """Word-time the committed tokens of the finalizing window against
        its audio (cross-attention DTW); times are shifted to
        stream-absolute seconds."""
        if not self.word_timestamps or not self._win_committed:
            return
        from .align import add_word_timestamps
        from .audio import HOP_LENGTH

        num_frames = min(len(self._audio), _WINDOW_SAMPLES) // HOP_LENGTH
        if num_frames < 2:
            return
        mel = log_mel_spectrogram(
            pad_or_trim(self._audio), self.model.dims.n_mels
        )
        seg = {
            "tokens": list(self._win_committed),
            "start": 0.0,
            "end": num_frames / 100.0,
            "seek": 0,
        }
        add_word_timestamps(
            segments=[seg], model_obj=self.model,
            tokenizer=self._tokenizer(), mel=mel, num_frames=num_frames,
            last_speech_timestamp=0.0,
        )
        for w in seg.get("words", []):
            self._words.append(
                {
                    **w,
                    "start": round(w["start"] + self._offset, 3),
                    "end": round(w["end"] + self._offset, 3),
                }
            )

    def _partial_text(self) -> str:
        """Uncommitted tail of the newest hypothesis (may still change)."""
        if self._prev_hyp is None:
            return ""
        tok = self._tokenizer()
        return tok.decode(self._prev_hyp[len(self._win_committed):])

    def _step(self, final: bool) -> dict:
        result = self._decode_window()
        if self._ts_begin is None:
            self._ts_begin = self._tokenizer().timestamp_begin
        hyp = list(result.tokens)
        delta = ""
        if final:
            delta = self._commit(hyp)
            self._prev_hyp = hyp
        else:
            if self._prev_hyp is not None:
                agree = _common_prefix(hyp, self._prev_hyp)
                # never retract: only extend an intact committed prefix
                if (
                    len(agree) > len(self._win_committed)
                    and agree[: len(self._win_committed)]
                    == self._win_committed
                ):
                    delta = self._commit(agree)
            self._prev_hyp = hyp
            self._maybe_slide(hyp)
        out = {
            "committed_delta": delta,
            "text": self._committed_text,
            "partial": self._partial_text(),
            "language": self._language,
            "stream_seconds": self._offset + len(self._audio) / SAMPLE_RATE,
        }
        if self.word_timestamps:
            out["words"] = list(self._words)
        return out

    # -- public API ----------------------------------------------------------

    def feed(self, chunk: np.ndarray) -> dict:
        """Append PCM (float32 in [-1, 1] or int16) and, when at least
        ``step_seconds`` of new audio accumulated, advance the decode.
        Returns committed/partial state either way."""
        with self._lock:
            if self._closed:
                raise RuntimeError("stream ended")
            chunk = np.asarray(chunk)
            if chunk.dtype == np.int16:
                chunk = chunk.astype(np.float32) / 32768.0
            self._audio = np.concatenate(
                [self._audio, chunk.astype(np.float32)]
            )
            if len(self._audio) - self._decoded_at < self.step:
                return self._idle_state()
            if self.vad_rms and self._silent():
                # energy gate: don't decode silence; slide it out unseen
                self._decoded_at = len(self._audio)
                if len(self._audio) >= self.window:
                    self._drop(min(len(self._audio), _WINDOW_SAMPLES))
                return self._idle_state()
            self._decoded_at = len(self._audio)
            return self._step(final=False)

    def _silent(self) -> bool:
        return float(
            np.sqrt(np.mean(np.square(self._audio)))
        ) < self.vad_rms

    def _idle_state(self) -> dict:
        out = {
            "committed_delta": "",
            "text": self._committed_text,
            "partial": self._partial_text(),
            "language": self._language,
            "stream_seconds": self._offset + len(self._audio) / SAMPLE_RATE,
        }
        if self.word_timestamps:
            out["words"] = list(self._words)
        return out

    def end(self) -> dict:
        """Final decode of the remaining audio; commits everything."""
        with self._lock:
            if self._closed:
                raise RuntimeError("stream ended")
            self._closed = True
            if len(self._audio) == 0 or (self.vad_rms and self._silent()):
                out = self._idle_state()
                out["partial"] = ""
                return out
            # more than one window still buffered (e.g. a big final chunk):
            # drain 30 s blocks — each decode covers exactly the audio it
            # drops — before the final partial-window commit
            deltas = []
            while len(self._audio) > _WINDOW_SAMPLES:
                result = self._decode_window()
                if self._ts_begin is None:
                    self._ts_begin = self._tokenizer().timestamp_begin
                deltas.append(self._commit(list(result.tokens)))
                self._drop(_WINDOW_SAMPLES)
            out = self._step(final=True)
            self._align_committed()  # the final window's text is now final
            out["committed_delta"] = "".join(deltas) + out["committed_delta"]
            out["partial"] = ""
            if self.word_timestamps:
                out["words"] = list(self._words)
            return out

"""Audio frontend: loading, padding, and the log-mel spectrogram.

TPU-native rebuild of the reference Whisper audio frontend
(/root/reference/whisper/whisper/audio.py:13-157).  Design differences from the
reference (torch.stft + npz filterbank):

* The STFT is expressed as a single strided convolution with windowed
  DFT basis filters, so the whole frontend is two MXU matmuls
  (audio -> power spectrum -> mel) instead of an FFT library call.
* The mel filterbank is generated at runtime from the Slaney-scale formula
  (numerically identical to the `librosa.filters.mel(sr=16000, n_fft=400)`
  matrices shipped in the reference's ``mel_filters.npz``) - no data file.
* A fused Pallas kernel (``qasr_ijcnlp_tpu.ops.mel``) covers the hot path on
  TPU; this module provides the portable XLA formulation and the public API.

Constants mirror /root/reference/whisper/whisper/audio.py:13-22.
"""

from __future__ import annotations

import functools
import subprocess
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

# Hard-coded audio hyperparameters (reference audio.py:13-22).
SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000 samples in a 30-second chunk
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 frames in a mel spectrogram input

N_SAMPLES_PER_TOKEN = HOP_LENGTH * 2  # the initial convolutions have stride 2
FRAMES_PER_SECOND = SAMPLE_RATE // HOP_LENGTH  # 10ms per audio frame
TOKENS_PER_SECOND = SAMPLE_RATE // N_SAMPLES_PER_TOKEN  # 20ms per audio token


# ---------------------------------------------------------------------------
# Host-side audio IO
# ---------------------------------------------------------------------------


def resample_audio(data: np.ndarray, rate: int, sr: int) -> np.ndarray:
    """Mono waveform ``rate`` -> ``sr`` Hz with anti-aliasing.

    Downsampling low-passes BEFORE interpolating (bare np.interp folds all
    content above the target Nyquist back into the band); scipy's polyphase
    resampler when available, windowed-sinc FIR + linear interp otherwise.
    The native decoders apply the same filter in C++ (native/resample.cpp).
    """
    if rate == sr:
        return np.asarray(data, np.float32)
    if sr < rate:
        try:
            from math import gcd

            from scipy.signal import resample_poly

            g = gcd(int(rate), int(sr))
            return resample_poly(data, sr // g, rate // g).astype(np.float32)
        except Exception:
            cutoff = 0.45 * sr / rate  # cycles/sample at the input rate
            taps = 65
            n = np.arange(taps) - (taps - 1) / 2
            h = np.sinc(2 * cutoff * n) * np.hamming(taps)
            h /= h.sum()
            data = np.convolve(data, h, mode="same")
    n_out = int(round(len(data) * sr / rate))
    x_old = np.arange(len(data), dtype=np.float64) / rate
    x_new = np.arange(n_out, dtype=np.float64) / sr
    return np.interp(x_new, x_old, data).astype(np.float32)


def _load_wav(file: str, sr: int) -> np.ndarray:
    """Decode a PCM WAV file, mono-mixing and resampling.

    Prefers the native C++ decoder (native/wavio.cpp); stdlib fallback
    (unsupported-but-valid variants like WAVE_FORMAT_EXTENSIBLE return None
    from the native decoder and fall through here)."""
    try:
        from ._native import native_wav_decode

        with open(file, "rb") as f:
            data = f.read()
        audio = native_wav_decode(data, sr)
        if audio is not None:
            return audio
    except ValueError:
        raise
    except Exception:
        pass  # native lib unavailable; stdlib path below
    import wave

    with wave.open(file, "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {width}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return resample_audio(data, rate, sr)


def load_audio(file: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Open an audio file as a mono float32 waveform at ``sr`` Hz.

    Mirrors the reference CLI surface (audio.py:25-62): prefers the ``ffmpeg``
    binary when present; falls back to a stdlib WAV decoder and, if installed,
    ``soundfile`` for other formats.
    """
    audio = _load_audio_any(file, sr)
    if audio.dtype == np.int16:
        return audio.astype(np.float32) / 32768.0
    return audio


def _load_audio_any(file: str, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Like :func:`load_audio`, but keeps the waveform **int16** whenever the
    decode chain is losslessly 16-bit (ffmpeg's s16le output; a 16-bit mono
    WAV already at ``sr``) and returns float32 otherwise.

    int16 halves the host->device bytes for long audio — the dominant
    single-stream cost of batched long-form transcription — and
    :func:`log_mel_spectrogram` rescales on device with an exact
    power-of-two divide, so the mel is bit-identical to the float path.
    """
    cmd = [
        "ffmpeg", "-nostdin", "-threads", "0", "-i", file,
        "-f", "s16le", "-ac", "1", "-acodec", "pcm_s16le", "-ar", str(sr), "-",
    ]
    try:
        out = subprocess.run(cmd, capture_output=True, check=True).stdout
        return np.frombuffer(out, np.int16).flatten()
    except FileNotFoundError:
        pass  # no ffmpeg binary on this host
    except subprocess.CalledProcessError as e:
        raise RuntimeError(f"Failed to load audio: {e.stderr.decode()}") from e

    if file.lower().endswith(".wav"):
        pcm = _read_wav_pcm16(file, sr)
        if pcm is not None:
            return pcm
        return _load_wav(file, sr)
    with open(file, "rb") as f:
        head = f.read(4)
    if head == b"fLaC":
        from ._native import native_flac_decode

        with open(file, "rb") as f:
            data = f.read()
        decoded = native_flac_decode(data, sr)
        if decoded is not None:
            return decoded
    try:
        import soundfile  # type: ignore

        data, rate = soundfile.read(file, dtype="float32", always_2d=True)
        return resample_audio(data.mean(axis=1), rate, sr)
    except ImportError:
        raise RuntimeError(
            f"Cannot decode {file!r}: no ffmpeg binary and no soundfile package; "
            "only PCM WAV is supported natively."
        )


def _read_wav_pcm16(file: str, sr: int) -> Optional[np.ndarray]:
    """int16 samples of a mono 16-bit PCM WAV already at ``sr`` Hz, or None
    when the file needs mixing/resampling/format conversion (those paths go
    through the float decoders)."""
    import wave

    try:
        with wave.open(file, "rb") as w:
            if (
                w.getnchannels() != 1
                or w.getsampwidth() != 2
                or w.getframerate() != sr
            ):
                return None
            raw = w.readframes(w.getnframes())
    except Exception:
        return None  # compressed/extensible variants: full decoders below
    return np.frombuffer(raw, np.int16)


def pad_or_trim(array, length: int = N_SAMPLES, *, axis: int = -1):
    """Pad with zeros or trim ``array`` to ``length`` along ``axis``.

    Works on numpy and JAX arrays (reference audio.py:65-88).
    """
    xp = jnp if isinstance(array, jax.Array) else np
    if array.shape[axis] > length:
        index = [slice(None)] * array.ndim
        index[axis] = slice(0, length)
        array = array[tuple(index)]
    if array.shape[axis] < length:
        pad_widths = [(0, 0)] * array.ndim
        pad_widths[axis] = (0, length - array.shape[axis])
        array = xp.pad(array, pad_widths)
    return array


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale, matching librosa.filters.mel defaults)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filters(n_mels: int, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, 1 + n_fft//2).

    Numerically reproduces ``librosa.filters.mel(sr=16000, n_fft=400,
    n_mels={80,128})``, i.e. the matrices the reference loads from
    ``assets/mel_filters.npz`` (audio.py:91-107), without shipping the file.
    """
    assert n_mels in {80, 128}, f"Unsupported n_mels: {n_mels}"
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_min = _hz_to_mel_slaney(np.array(0.0))
    mel_max = _hz_to_mel_slaney(np.array(sr / 2.0))
    mel_f = _mel_to_hz_slaney(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney-style area normalization.
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_mel_basis(n_mels: int):
    """Windowed DFT basis folded with the mel filterbank.

    Returns (basis, mel) where ``basis`` has shape (2*(1+n_fft//2), n_fft):
    rows are [cos_k * hann; -sin_k * hann], so that for a frame x,
    ``y = basis @ x`` gives stacked (real, imag) parts and
    ``power = y_real**2 + y_imag**2`` is the STFT power spectrum.
    """
    n_bins = 1 + N_FFT // 2
    t = np.arange(N_FFT)
    k = np.arange(n_bins)[:, None]
    # Periodic Hann window, matching torch.hann_window(N_FFT).
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * t / N_FFT)
    angle = 2 * np.pi * k * t[None, :] / N_FFT
    cos_b = np.cos(angle) * hann[None, :]
    sin_b = -np.sin(angle) * hann[None, :]
    basis = np.concatenate([cos_b, sin_b], axis=0).astype(np.float32)
    # numpy (not jnp) so the lru_cache never captures jit tracers; jit folds
    # these constants at trace time.
    return basis, mel_filters(n_mels)


def _stft_power(audio: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """Framed power spectrum via one strided conv on the MXU.

    ``audio``: (..., n_samples), already reflect-padded by n_fft//2 on both
    sides.  Returns (..., n_frames, 1 + n_fft//2).
    """
    basis = jnp.asarray(_dft_mel_basis(n_mels)[0])
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    lead = audio.shape[:-1]
    x = audio.reshape((-1, 1, audio.shape[-1]))  # (B, C=1, L)
    y = jax.lax.conv_general_dilated(
        x,
        basis[:, None, :],  # (out=2*bins, in=1, width=n_fft)
        window_strides=(HOP_LENGTH,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, 2*bins, n_frames)
    n_bins = 1 + N_FFT // 2
    power = y[:, :n_bins, :] ** 2 + y[:, n_bins:, :] ** 2  # (B, bins, frames)
    power = jnp.moveaxis(power, -1, -2)  # (B, frames, bins)
    power = power.reshape(lead + power.shape[1:])
    if squeeze:
        power = power[0]
    return power


@functools.partial(jax.jit, static_argnames=("n_mels", "padding"))
def _log_mel_jit(audio: jnp.ndarray, n_mels: int, padding: int) -> jnp.ndarray:
    if padding > 0:
        pad = [(0, 0)] * (audio.ndim - 1) + [(0, padding)]
        audio = jnp.pad(audio, pad)
    # torch.stft(center=True) reflect-pads n_fft//2 on both sides.
    pad = [(0, 0)] * (audio.ndim - 1) + [(N_FFT // 2, N_FFT // 2)]
    audio = jnp.pad(audio, pad, mode="reflect")
    power = _stft_power(audio.astype(jnp.float32), n_mels)
    # Reference drops the final frame (audio.py:149).
    power = power[..., :-1, :]
    mel_fb = jnp.asarray(_dft_mel_basis(n_mels)[1])
    mel_spec = jnp.einsum(
        "mf,...tf->...mt",
        mel_fb,
        power,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    # Per-item dynamic-range clamp: the reference computes the mel one clip
    # at a time (audio.py:154), so a batched call must clamp each item by its
    # OWN max to stay numerically identical.
    item_max = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, item_max - 8.0)
    return (log_spec + 4.0) / 4.0


@jax.jit
def _dequant_i16(x: jnp.ndarray) -> jnp.ndarray:
    # Exact: every int16/32768 value is a float32; matches the host-side
    # ``astype(np.float32) / 32768.0`` of load_audio bit-for-bit.
    return x.astype(jnp.float32) / 32768.0


def preprocess_audio_for_whisper(audio, n_mels: int = 80):
    """Raw waveform -> model-ready (n_mels, 3000) mel (reference
    utils.py:121-139: pad/trim to 30 s then log-mel)."""
    return log_mel_spectrogram(pad_or_trim(np.asarray(audio, np.float32)), n_mels)


def log_mel_spectrogram(
    audio: Union[str, np.ndarray, jnp.ndarray],
    n_mels: int = 80,
    padding: int = 0,
    device: Optional[object] = None,
) -> jnp.ndarray:
    """Log-mel spectrogram of 16 kHz audio, shape (..., n_mels, n_frames).

    Matches the reference pipeline (audio.py:110-157): periodic-Hann STFT
    (n_fft=400, hop=160, centered/reflect), power spectrum, Slaney mel
    projection, log10, clamp to (max - 8), then ``(x + 4) / 4``.

    Batched calls clamp each item's dynamic range by its own max, matching
    the reference's per-clip computation exactly.

    int16 input (arrays, or files whose decode chain is losslessly 16-bit)
    crosses to the device as int16 — half the transfer bytes, the dominant
    single-stream cost for long audio — and is rescaled on device by an
    exact power-of-two divide, bit-identical to pre-scaled float32 input.
    """
    if isinstance(audio, str):
        audio = _load_audio_any(audio)
    if getattr(audio, "dtype", None) == np.int16 or (
        isinstance(audio, jax.Array) and audio.dtype == jnp.int16
    ):
        audio = jnp.asarray(audio)
        if device is not None:
            audio = jax.device_put(audio, device)
        audio = _dequant_i16(audio)
    else:
        audio = jnp.asarray(audio, dtype=jnp.float32)
        if device is not None:
            audio = jax.device_put(audio, device)
    if _fused_mel_enabled():
        from .ops.melfront import (
            fused_log_mel_batched,
            fused_log_mel_spectrogram,
        )

        if audio.ndim == 1:
            return fused_log_mel_spectrogram(audio, n_mels, padding)
        if audio.ndim == 2:
            # Batch-partitionable under GSPMD (ops/partition.py), so
            # data-parallel eval keeps the kernel.
            return fused_log_mel_batched(audio, n_mels, padding)
        fused = lambda a: fused_log_mel_spectrogram(a, n_mels, padding)
        for _ in range(audio.ndim - 1):
            fused = jax.vmap(fused)
        return fused(audio)
    return _log_mel_jit(audio, n_mels, padding)


# None = auto: the fused Pallas STFT+mel kernel on a TPU backend (measured
# 1.3-1.4x over the matmul-DFT XLA path on-chip, scripts/bench_kernels_ab.py),
# plain XLA elsewhere.  set_fused_mel() overrides.
_USE_FUSED_MEL: Optional[bool] = None


def set_fused_mel(enabled: Optional[bool]) -> None:
    global _USE_FUSED_MEL
    _USE_FUSED_MEL = enabled


def _fused_mel_enabled() -> bool:
    if _USE_FUSED_MEL is None:
        return jax.default_backend() == "tpu"
    return _USE_FUSED_MEL

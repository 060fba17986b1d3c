"""Fused STFT+mel frontend Pallas kernel (the BASELINE.json north-star op).

Replaces torch.stft + mel matmul (/root/reference/whisper/whisper/audio.py:
110-157).  A 400-point DFT is small enough that the FFT factorization loses
to one MXU pass, so the frontend becomes, per tile of 256 frames:

    windowed = frames * hann          (VPU)
    re, im   = windowed @ C, windowed @ S     (MXU, 400 -> 201 bins)
    power    = re^2 + im^2            (VPU)
    mel      = power @ M^T            (MXU, 201 -> n_mels)
    out      = log10(max(mel, 1e-10)) (VPU)

all in one kernel - the (frames, 201) power spectrum never reaches HBM.
The global dynamic-range clamp (max-8) and (x+4)/4 scaling depend on the
whole spectrogram's max, so they stay outside (two cheap fused elementwise
passes).  Framing is a gather feeding the kernel (XLA handles it well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio import HOP_LENGTH, N_FFT, mel_filters

BF = 256  # frames per tile


@functools.lru_cache(maxsize=None)
def _tables(n_mels: int):
    """Hann window, DFT cos/sin (400 x 201), mel filterbank^T (201 x n_mels)."""
    n_bins = N_FFT // 2 + 1
    # torch.hann_window(400): periodic Hann.
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(N_FFT) / N_FFT))
    t = np.arange(N_FFT)[:, None] * np.arange(n_bins)[None, :]
    ang = 2 * np.pi * t / N_FFT
    cos = np.cos(ang).astype(np.float32)
    sin = -np.sin(ang).astype(np.float32)
    mel_t = mel_filters(n_mels).T.astype(np.float32)  # (201, n_mels)
    return window.astype(np.float32), cos, sin, mel_t


def _mel_kernel(frames_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref):
    # precision=HIGHEST: the DFT/mel matmuls must run in full f32 on the MXU
    # (the default precision would round operands toward bf16 and break the
    # <=1e-4 golden parity with torch.stft).
    hi = jax.lax.Precision.HIGHEST
    frames = frames_ref[:] * win_ref[:]  # (BF, N_FFT) * (1, N_FFT)
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    power = re * re + im * im  # (BF, n_bins)
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


from . import round_up as _round_up  # noqa: E402


@functools.partial(jax.jit, static_argnames=("n_mels", "interpret"))
def _fused_log_mel(audio: jnp.ndarray, n_mels: int, interpret: bool):
    """audio: reflect-padded 1-D waveform -> (n_mels, n_frames) log10-mel."""
    window, cos, sin, mel_t = _tables(n_mels)
    n_frames = (audio.shape[-1] - N_FFT) // HOP_LENGTH + 1
    starts = np.arange(n_frames) * HOP_LENGTH
    idx = starts[:, None] + np.arange(N_FFT)[None, :]
    frames = audio[idx].astype(jnp.float32)  # (F, N_FFT)

    Fp = _round_up(n_frames, BF)
    if Fp != n_frames:
        frames = jnp.pad(frames, ((0, Fp - n_frames), (0, 0)))

    out = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((Fp, n_mels), jnp.float32),
        grid=(Fp // BF,),
        in_specs=[
            pl.BlockSpec((BF, N_FFT), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_FFT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(cos.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BF, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        frames,
        jnp.asarray(window)[None, :],
        jnp.asarray(cos),
        jnp.asarray(sin),
        jnp.asarray(mel_t),
    )
    return out[:n_frames].T  # (n_mels, F)


def fused_log_mel_spectrogram(
    audio, n_mels: int = 80, padding: int = 0
) -> jnp.ndarray:
    """Drop-in for audio.log_mel_spectrogram (1-D input) on the Pallas path:
    same reflect pad, frame drop, clamp and scaling semantics."""
    audio = jnp.asarray(audio, jnp.float32)
    if padding > 0:
        audio = jnp.pad(audio, (0, padding))
    audio = jnp.pad(audio, (N_FFT // 2, N_FFT // 2), mode="reflect")
    log_spec = _fused_log_mel(audio, n_mels, jax.default_backend() != "tpu")
    log_spec = log_spec[:, :-1]  # reference drops the final frame
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    return (log_spec + 4.0) / 4.0


@functools.lru_cache(maxsize=None)
def _sharded_mel_op(n_mels: int, padding: int):
    """Batch-partitioned vmapped mel kernel (ops/partition.py): under GSPMD
    each data shard computes its own rows' spectrograms."""
    from .partition import batch_partitioned

    def impl(audio2d):
        return jax.vmap(
            lambda a: fused_log_mel_spectrogram(a, n_mels, padding)
        )(audio2d)

    return batch_partitioned(impl, (2,), 3)


def fused_log_mel_batched(audio2d, n_mels: int = 80, padding: int = 0):
    """Batched (B, n_samples) -> (B, n_mels, n_frames) fused mel; the
    per-clip max clamp matches the reference's per-item computation."""
    return _sharded_mel_op(n_mels, padding)(audio2d)

"""Long-form transcription RTF on the chip: sequential seek loop vs the
batched-window fast path, on a synthetic long clip.

Usage: python scripts/bench_transcribe_long.py [minutes]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.transcribe import transcribe

    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    print("backend:", jax.default_backend())
    dims = tiny_dims()
    m = WhisperModel(
        model.init_params(jax.random.PRNGKey(0), dims), dims, name="long"
    )
    rng = np.random.default_rng(0)
    secs = minutes * 60
    # Real audio sources are 16-bit PCM (LibriSpeech FLAC, ffmpeg s16le);
    # int16 is the production representation.  The float32 rows measure the
    # legacy upload (2x the host->device bytes).
    pcm = (rng.standard_normal(int(16000 * secs)) * 0.05 * 32767).astype(
        np.int16
    )
    audio_f32 = pcm.astype(np.float32) / 32768.0

    kw = dict(language="en", without_timestamps=True, sample_len=32,
              temperature=0.0, fp16=True)
    for label, audio, extra in (
        ("batched-window (bw=32) int16", pcm, {"batch_windows": 32}),
        ("batched-window (bw=32) f32  ", audio_f32, {"batch_windows": 32}),
        ("sequential int16", pcm, {}),
    ):
        transcribe(m, audio, **kw, **extra)  # warm/compile
        t0 = time.perf_counter()
        transcribe(m, audio, **kw, **extra)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f} s for {secs:.0f} s audio "
              f"-> RTF {secs / dt:.0f}")


if __name__ == "__main__":
    main()

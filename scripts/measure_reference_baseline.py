"""Measure the reference PyTorch Whisper Tiny greedy-decode RTF on CPU.

Runs the *reference* implementation (/root/reference/whisper) on synthetic
30 s mel segments with a random-init tiny model, eot suppressed and a fixed
sample_len so the token count is deterministic - the identical protocol
bench.py uses for the TPU build.  The resulting audio-sec/sec number is
embedded in bench.py as REFERENCE_RTF_CPU.

Usage: python scripts/measure_reference_baseline.py [--batch 8] [--steps 64]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/reference/whisper")

import types

import numpy as np
import torch

# The container has no numba; the reference only needs it for CPU DTW in
# timing.py, which this benchmark never calls. Provide a pass-through stub.
if "numba" not in sys.modules:
    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    sys.modules["numba"] = numba


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from whisper.model import ModelDimensions, Whisper
    from whisper.decoding import DecodingOptions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=384, n_audio_head=6,
        n_audio_layer=4, n_vocab=51865, n_text_ctx=448, n_text_state=384,
        n_text_head=6, n_text_layer=4,
    )
    torch.manual_seed(0)
    model = Whisper(dims).eval()

    from whisper.tokenizer import get_tokenizer

    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    opts = DecodingOptions(
        language="en",
        without_timestamps=True,
        fp16=False,
        sample_len=args.steps,
        suppress_tokens=[tok.eot],
        suppress_blank=False,
    )

    mel = torch.from_numpy(
        np.random.default_rng(0).standard_normal((args.batch, 80, 3000)).astype(np.float32)
    )

    with torch.no_grad():
        model.decode(mel, opts)  # warmup
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            model.decode(mel, opts)
        dt = time.perf_counter() - t0

    audio_sec = args.batch * 30.0 * args.repeats
    print(f"batch={args.batch} steps={args.steps} repeats={args.repeats}")
    print(f"wall={dt:.2f}s  RTF={audio_sec / dt:.3f} audio-sec/sec (CPU, torch)")


if __name__ == "__main__":
    main()

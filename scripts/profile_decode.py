"""On-chip profiling of the decode loops: per-op device time from a real
jax.profiler trace (VERDICT r1 asked for profiler-backed numbers, not
tunnel wall-clock).

Usage: python scripts/profile_decode.py [greedy|beam|encoder|mel]
Prints the top device ops by self time and the derived per-token cost.
"""

import glob
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _tpu_plane(data):
    for plane in data.planes:
        if "TPU" in plane.name or "tpu" in plane.name.lower():
            yield plane


def collect_events(logdir):
    """-> list of (name, total_duration_sec, count) from the trace's TPU
    planes, aggregated by op name."""
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane.pb under {logdir}"
    data = ProfileData.from_file(paths[-1])
    agg = {}
    for plane in _tpu_plane(data):
        for line in plane.lines:
            for ev in line.events:
                d = ev.duration_ns
                name = ev.name
                tot, cnt = agg.get(name, (0, 0))
                agg[name] = (tot + d, cnt + 1)
    return sorted(
        ((k, v[0] / 1e9, v[1]) for k, v in agg.items()),
        key=lambda x: -x[1],
    )


def profile(fn, logdir, warmup=2, reps=3):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn())
        wall = (time.perf_counter() - t0) / reps
    return wall


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "greedy"
    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    print("backend:", jax.default_backend(), jax.devices())
    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="profile")
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    rng = np.random.default_rng(0)

    steps = 64
    if which in ("greedy", "beam"):
        B = 64 if which == "greedy" else 16
        if len(sys.argv) > 2:
            B = int(sys.argv[2])
        K = 5 if which == "beam" else None
        mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)
        opts = DecodingOptions(
            language="en", without_timestamps=True, sample_len=steps,
            suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
            beam_size=K,
        )
        fn = lambda: decode(m, mel, opts)[0].tokens
    elif which == "encoder":
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
        mel = jnp.asarray(rng.standard_normal((B, 80, 3000)), jnp.float32)
        enc = jax.jit(
            lambda p, x: model.encoder_apply(p, x, dims, jnp.bfloat16)
        )
        fn = lambda: enc(params["encoder"], mel)
    elif which == "mel":
        from qasr_ijcnlp_tpu.audio import log_mel_spectrogram

        B = 64
        audio = jnp.asarray(rng.standard_normal((B, 480000)), jnp.float32)
        jmel = jax.jit(log_mel_spectrogram)
        fn = lambda: jmel(audio)
    else:
        raise SystemExit(f"unknown target {which}")

    logdir = f"/tmp/qasr_profile_{which}"
    os.system(f"rm -rf {logdir}")
    wall = profile(fn, logdir)
    print(f"\n== {which}: wall {wall * 1e3:.1f} ms/call ==")

    events = collect_events(logdir)
    total = sum(d for _, d, _ in events)
    print(f"total device event time {total * 1e3:.1f} ms (all reps)")
    for name, dur, cnt in events[:40]:
        print(f"{dur * 1e3:9.3f} ms  x{cnt:<6} {name[:100]}")

    # Aggregate by op family (fusion.12 -> fusion) for a traffic overview.
    import re

    fam = {}
    for name, dur, cnt in events:
        key = re.split(r"[.\s(]", name.lstrip("%"), 1)[0]
        t, c = fam.get(key, (0.0, 0))
        fam[key] = (t + dur, c + cnt)
    print("\n-- by family --")
    for key, (dur, cnt) in sorted(fam.items(), key=lambda x: -x[1][0])[:15]:
        print(f"{dur * 1e3:9.3f} ms  x{cnt:<6} {key}")


if __name__ == "__main__":
    main()

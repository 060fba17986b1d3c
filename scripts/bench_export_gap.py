"""On-chip A/B: live decode (Pallas kernels on) vs exported StableHLO
artifacts (VERDICT r3 #6 / r4 #5), kernel-free and kernels-included.

Four legs at the headline protocol (tiny, B=128 default, 64 suppressed-eot
greedy steps, best-of-5 reps):

  live             -- decode() with the default-on kernels
  live-nokernel    -- decode() with fused mel/encoder/flash kernels disabled
                      (isolates "kernels excluded" from "export overhead")
  artifact         -- serialized -> deserialized jax.export artifact call
                      (portable: Pallas custom calls excluded by design)
  artifact-kernels -- with_kernels=True artifact (TPU/compiler-version-pinned,
                      keeps the Pallas custom calls)

EACH LEG RUNS IN ITS OWN SUBPROCESS.  The first revision of this bench ran
all four legs in one process and measured the last leg ~10-15% low: legs
timed later in a process (after extra executables + 151 MB artifact
constants are resident and caches were cleared) systematically drift slow —
an interleaved clean-process A/B showed the kernels artifact FASTER than
live (17.4k vs 16.4k RTF) where the one-process bench had reported it 10%
slower.  Same measurement-discipline family as the r4
bench_step_formulations bugs; fresh-process legs remove the confound.

Prints one JSON line per leg + a summary with the live->artifact gaps.
Pursue custom-call export only if the portable gap is >10% (VERDICT r3 #6)
-- it is (~10-12% + a B>=256 batch ceiling), which is why
with_kernels=True exists (export.py).

Usage: python scripts/bench_export_gap.py [--batch 128] [--steps 64]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

LEGS = ("live", "live-nokernel", "artifact", "artifact-kernels")


def _time_reps(fn, batch, repeats):
    fn()  # compile/first-call
    fn()  # second warmup (tunneled-link one-off costs)
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn()
    dt = time.perf_counter() - t0
    return batch * 30.0 * repeats / dt


def run_leg(leg: str, args) -> dict:
    """One leg, fresh process state assumed (called under --leg)."""
    import numpy as np

    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from qasr_ijcnlp_tpu import audio as audio_mod
    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.export import (
        export_greedy_decode, load_artifact, save_artifact,
    )
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    dims = tiny_dims()
    params = model.init_params(jax.random.PRNGKey(0), dims)
    m = WhisperModel(params, dims, name="tiny (bench, random-init)")
    tok = get_tokenizer(True, num_languages=99, language="en",
                        task="transcribe")
    opts = DecodingOptions(
        language="en", without_timestamps=True, sample_len=args.steps,
        suppress_tokens=[tok.eot], suppress_blank=False, fp16=True,
    )
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, 80, 3000)),
        jnp.float32,
    )

    out = {"path": leg, "platform": jax.default_backend()}

    if leg == "live":
        def live():
            r = decode(m, mel, opts)
            assert len(r[0].tokens) >= 0
        out["rtf"] = round(_time_reps(live, args.batch, args.repeats), 1)
        return out

    if leg == "live-nokernel":
        model.set_flash_attention(False)
        audio_mod.set_fused_mel(False)

        def live():
            r = decode(m, mel, opts)
            assert len(r[0].tokens) >= 0
        try:
            out["rtf"] = round(
                _time_reps(live, args.batch, args.repeats), 1)
        except Exception as e:
            # the XLA-native encoder materializes (B, H, 1500, 1500)
            # attention logits -- 13.2 GB at B=512 -- so this leg (and the
            # portable artifact, same formulation) has a batch ceiling the
            # kernel path does not
            out["rtf"] = None
            out["fail"] = str(e)[:120]
        return out

    # artifact legs: export (untimed), save/load round-trip, time the call
    with_kernels = leg == "artifact-kernels"
    exported, meta = export_greedy_decode(
        m, opts, batch=args.batch, from_audio=False,
        with_kernels=with_kernels,
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "decode.qasrx")
        save_artifact(path, exported, meta)
        out["artifact_mb"] = round(os.path.getsize(path) / 1e6, 1)
        call, _meta2 = load_artifact(path)

    def artifact():
        r = call(mel)
        # host-materialize to sync (block_until_ready returns early
        # through the tunneled device link)
        np.asarray(r[1])

    try:
        out["rtf"] = round(_time_reps(artifact, args.batch, args.repeats), 1)
    except Exception as e:
        out["rtf"] = None
        out["fail"] = str(e)[:120]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--leg", choices=LEGS, default=None,
                    help="internal: run one leg in this process")
    args = ap.parse_args()

    if args.leg:
        print(json.dumps(run_leg(args.leg, args)))
        return

    results = {}
    for leg in LEGS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--leg", leg, "--batch", str(args.batch),
             "--steps", str(args.steps), "--repeats", str(args.repeats)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = None
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
        if line is None:
            results[leg] = {"path": leg, "rtf": None,
                            "fail": (proc.stderr or "no output")[-200:]}
        else:
            results[leg] = json.loads(line)
        print(json.dumps(results[leg]))

    def rtf(leg):
        return results.get(leg, {}).get("rtf")

    summary = {
        "summary": "export_gap",
        "batch": args.batch,
        "isolation": "one subprocess per leg (see module docstring)",
        "live_rtf": rtf("live"),
        "live_nokernel_rtf": rtf("live-nokernel"),
        "artifact_rtf": rtf("artifact"),
        "artifact_kernels_rtf": rtf("artifact-kernels"),
        "note": "portable artifact excludes Pallas kernels by design "
                "(export.py); >10% gap motivates with_kernels=True export",
    }
    if rtf("artifact") and rtf("live"):
        summary["portable_gap_vs_live_pct"] = round(
            (1.0 - rtf("artifact") / rtf("live")) * 100, 1)
    if rtf("live-nokernel") and rtf("live"):
        summary["gap_attributed_to_kernels_pct"] = round(
            (1.0 - rtf("live-nokernel") / rtf("live")) * 100, 1)
    if rtf("artifact-kernels") and rtf("live"):
        summary["kernels_artifact_gap_vs_live_pct"] = round(
            (1.0 - rtf("artifact-kernels") / rtf("live")) * 100, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

"""On-chip A/B: live decode (Pallas kernels on) vs the exported StableHLO
artifact (VERDICT r3 #6 / r4 #5).

Artifacts exclude Pallas kernels by design (export.py: tpu_custom_call has
no cross-compiler-version stability guarantee), so the artifact runs the
XLA-native formulations.  Three legs at the headline protocol
(tiny, B=512, 64 suppressed-eot greedy steps, best-of-5 reps):

  live          -- decode() with the default-on kernels
  live-nokernel -- decode() with fused mel/encoder/flash kernels disabled
                   (isolates "kernels excluded" from "export overhead")
  artifact      -- serialized -> deserialized jax.export artifact call

Prints one JSON line per leg + a summary with the live->artifact gap.
Pursue custom-call export only if the gap is >10% (VERDICT r3 #6).

Usage: python scripts/bench_export_gap.py [--batch 512] [--steps 64]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def _time_reps(fn, batch, repeats):
    fn()  # compile/first-call
    fn()  # second warmup (tunneled-link one-off costs)
    t0 = time.perf_counter()
    for _ in range(repeats):
        fn()
    dt = time.perf_counter() - t0
    return batch * 30.0 * repeats / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

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

    results = {}

    def live():
        r = decode(m, mel, opts)
        assert len(r[0].tokens) >= 0

    results["live"] = _time_reps(live, args.batch, args.repeats)
    print(json.dumps({"path": "live", "rtf": round(results["live"], 1),
                      "platform": jax.default_backend()}))

    prev_flash = model._USE_FLASH
    prev_mel = audio_mod._USE_FUSED_MEL
    model.set_flash_attention(False)
    audio_mod.set_fused_mel(False)
    # the kernel flags are read at trace time and are NOT jit-key members;
    # drop the compiled programs so the no-kernel leg actually retraces
    jax.clear_caches()
    try:
        results["live_nokernel"] = _time_reps(live, args.batch, args.repeats)
    except Exception as e:
        # the XLA-native encoder materializes (B, H, 1500, 1500) attention
        # logits — 13.2 GB at B=512 — so this leg (and the artifact, which
        # runs the same formulation) has a batch ceiling the kernel path
        # does not
        results["live_nokernel"] = None
        print(json.dumps({"path": "live-nokernel", "rtf": None,
                          "fail": str(e)[:120]}))
    finally:
        model.set_flash_attention(prev_flash)
        audio_mod.set_fused_mel(prev_mel)
        jax.clear_caches()
    if results["live_nokernel"] is not None:
        print(json.dumps({"path": "live-nokernel",
                          "rtf": round(results["live_nokernel"], 1)}))

    exported, meta = export_greedy_decode(
        m, opts, batch=args.batch, from_audio=False
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "decode.qasrx")
        save_artifact(path, exported, meta)
        size_mb = os.path.getsize(path) / 1e6
        call, meta2 = load_artifact(path)

    def artifact():
        out = call(mel)
        # host-materialize to sync (block_until_ready returns early
        # through the tunneled device link)
        np.asarray(out[1])

    try:
        results["artifact"] = _time_reps(artifact, args.batch, args.repeats)
        print(json.dumps({"path": "artifact",
                          "rtf": round(results["artifact"], 1),
                          "artifact_mb": round(size_mb, 1)}))
    except Exception as e:
        results["artifact"] = None
        print(json.dumps({"path": "artifact", "rtf": None,
                          "artifact_mb": round(size_mb, 1),
                          "fail": str(e)[:120]}))

    # kernels-included artifact (with_kernels=True): same-compiler-version
    # deployment — expected to match live perf and carry no batch ceiling
    exported_k, meta_k = export_greedy_decode(
        m, opts, batch=args.batch, from_audio=False, with_kernels=True
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "decode_k.qasrx")
        save_artifact(path, exported_k, meta_k)
        size_k = os.path.getsize(path) / 1e6
        call_k, _ = load_artifact(path)

    def artifact_k():
        out = call_k(mel)
        np.asarray(out[1])

    try:
        results["artifact_kernels"] = _time_reps(
            artifact_k, args.batch, args.repeats)
        print(json.dumps({"path": "artifact+kernels",
                          "rtf": round(results["artifact_kernels"], 1),
                          "artifact_mb": round(size_k, 1)}))
    except Exception as e:
        results["artifact_kernels"] = None
        print(json.dumps({"path": "artifact+kernels", "rtf": None,
                          "fail": str(e)[:120]}))

    summary = {
        "summary": "export_gap",
        "batch": args.batch,
        "live_rtf": round(results["live"], 1),
        "live_nokernel_rtf": (
            round(results["live_nokernel"], 1)
            if results["live_nokernel"] else None),
        "artifact_rtf": (
            round(results["artifact"], 1) if results["artifact"] else None),
        "note": "artifact excludes Pallas kernels by design (export.py); "
                ">10% gap would motivate custom-call export",
    }
    summary["artifact_kernels_rtf"] = (
        round(results["artifact_kernels"], 1)
        if results.get("artifact_kernels") else None)
    if results["artifact"]:
        summary["gap_vs_live_pct"] = round(
            (1.0 - results["artifact"] / results["live"]) * 100, 1)
    if results["live_nokernel"]:
        summary["gap_attributed_to_kernels_pct"] = round(
            (1.0 - results["live_nokernel"] / results["live"]) * 100, 1)
    if results.get("artifact_kernels"):
        summary["kernels_artifact_gap_vs_live_pct"] = round(
            (1.0 - results["artifact_kernels"] / results["live"]) * 100, 1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

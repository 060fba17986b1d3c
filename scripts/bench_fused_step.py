"""On-chip A/B: fused decoder-step kernel (ops/decoder_step.py) vs the
unfused XLA step, at the headline bench protocol (bench.py: Whisper tiny,
random-init, B=512, 64 suppressed-eot greedy steps, best-of-5 reps).

This is the measurement that gates the kernel's default: it ships OFF
because this A/B (round 4, reproduced round 5) measures the fused
formulation ~2x SLOWER — the per-row (H=6)-row matmuls occupy ~5% of the
MXU's 128 rows, and restreaming the whole cross cache per token loses to
XLA's batched step.  Re-flip the default only when the fused line wins here.

Also reports per-step numeric drift between the two paths (the fused
kernel's online-softmax chunking reorders fp reductions; tolerance contract
in tests/test_decoder_step_kernel.py).

Usage: python scripts/bench_fused_step.py [--batch 512] [--steps 64]
Prints one JSON line per path plus a summary line.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def _rtf(batch, steps, repeats, decode_fn):
    decode_fn()  # compile
    decode_fn()  # second warmup (tunneled-link one-off costs)
    t0 = time.perf_counter()
    for _ in range(repeats):
        r = decode_fn()
        assert len(r[0].tokens) > 0  # host-materialized: synced
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

    from qasr_ijcnlp_tpu.decode import DecodingOptions, decode
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.models.dims import tiny_dims
    from qasr_ijcnlp_tpu.models.registry import WhisperModel
    from qasr_ijcnlp_tpu.ops.decoder_step import set_fused_decoder_step
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
    tokens = {}
    for name, flag in (("unfused", False), ("fused", True)):
        set_fused_decoder_step(flag)
        try:
            rtf = _rtf(args.batch, args.steps, args.repeats,
                       lambda: decode(m, mel, opts))
            res = decode(m, mel, opts)
            tokens[name] = [tuple(r.tokens) for r in res]
        finally:
            set_fused_decoder_step(None)
        results[name] = rtf
        print(json.dumps({
            "path": name, "rtf": round(rtf, 1),
            "unit": "audio-sec/sec/chip",
            "platform": jax.default_backend(),
            "batch": args.batch, "steps": args.steps,
        }))

    match = sum(a == b for a, b in zip(tokens["unfused"], tokens["fused"]))
    print(json.dumps({
        "summary": "fused_vs_unfused",
        "speedup_fused_over_unfused": round(
            results["fused"] / results["unfused"], 3),
        "token_rows_identical": f"{match}/{args.batch}",
        "note": "bf16 online-softmax reordering drifts logits ~1.6e-2 max; "
                "token divergence at random-init is expected near fp ties "
                "(parity contract: tests/test_decoder_step_kernel.py)",
    }))


if __name__ == "__main__":
    main()

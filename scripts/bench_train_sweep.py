"""Training-side performance sweep (docs/BENCHMARKS.md "Training" section).

Gives training the same measurement rigor as decode (VERDICT r3 #2):

  * token-level teacher-forced train step (the train_classical_whisper_asr
    replacement path, reference train_classical_whisper_asr.py:178-241):
    batch sweep with ms/step, audio-sec/s and an MFU estimate per point;
  * remat (jax.checkpoint over transformer blocks) A/B at the largest batch;
  * grad-accum A/B (same global batch as microbatches);
  * quantum-stem train step (the train_quantum_whisper_asr path, reference
    train_quantum_whisper_asr.py:130-186): 8-qubit stem + char head.

MFU = model FLOPs (3x forward: fwd + ~2x fwd for bwd) / wall / chip peak.
Peak defaults to v5e bf16 (197 TFLOP/s); override with --peak-tflops.

Usage: python scripts/bench_train_sweep.py [--model tiny|base]
           [--batches 16,32,64,128,256] [--tokens 120] [--peak-tflops 197]
           [--skip-quantum] [--remat-batch N] [--accum N]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def step_flops(dims, n_tok: int) -> float:
    """Model FLOPs of ONE training step PER UTTERANCE (fwd*3 for fwd+bwd).

    Matmul FLOPs only (2*M*N*K); LN/softmax/gelu vector work is <2% for
    these shapes.  Encoder conv stem counted as its matmul equivalent.
    """
    D, F = dims.n_audio_state, 4 * dims.n_audio_state
    Ta, Tm = dims.n_audio_ctx, 2 * dims.n_audio_ctx  # 1500 frames, 3000 mel
    L_enc, L_dec = dims.n_audio_layer, dims.n_text_layer
    V, Dt = dims.n_vocab, dims.n_text_state

    conv = 2 * Tm * D * (dims.n_mels * 3) + 2 * Ta * D * (D * 3)
    enc_layer = (
        2 * Ta * D * (4 * D)        # q,k,v,out projections
        + 2 * 2 * Ta * Ta * D       # QK^T and PV
        + 2 * Ta * (D * F) * 2      # mlp fc + proj
    )
    dec_layer = (
        2 * n_tok * Dt * (4 * Dt)
        + 2 * 2 * n_tok * n_tok * Dt          # causal self-attention
        + 2 * n_tok * Dt * (2 * Dt)           # cross q + out
        + 2 * 2 * n_tok * Ta * Dt             # cross QK^T + PV
        + 2 * n_tok * (Dt * 4 * Dt) * 2
    )
    cross_kv = 2 * Ta * Dt * (2 * Dt) * L_dec  # once per utterance
    logits = 2 * n_tok * Dt * V
    fwd = conv + L_enc * enc_layer + L_dec * dec_layer + cross_kv + logits
    return 3.0 * fwd


def bench_token_step(dims, B, n_tok, peak_tflops, remat=False, accum=1,
                    label=""):
    from qasr_ijcnlp_tpu.models import whisper as model
    from qasr_ijcnlp_tpu.train.step import (
        init_state, make_accum_train_step, make_optimizer, make_train_step,
        whisper_loss_fn, whisper_sum_loss_fn,
    )

    model.set_remat(remat)
    try:
        params = model.init_params(jax.random.PRNGKey(0), dims)
        tx = make_optimizer(lambda _: 1e-4)
        state = init_state(params, tx)
        if accum > 1:
            step = jax.jit(
                make_accum_train_step(
                    whisper_sum_loss_fn(dims, "bfloat16"), tx, accum
                ),
                donate_argnums=(0,),
            )
        else:
            step = jax.jit(
                make_train_step(whisper_loss_fn(dims, "bfloat16"), tx),
                donate_argnums=(0,),
            )

        rng = np.random.default_rng(0)
        mel = jnp.asarray(rng.standard_normal((B, dims.n_mels, 3000)),
                          jnp.float32)
        toks = jnp.asarray(rng.integers(0, dims.n_vocab - 1000,
                                        (B, n_tok + 1)), jnp.int32)
        try:
            state, loss = step(state, mel, toks)
            sync(loss)
        except Exception as e:
            print(f"  {label} B={B}: OOM/fail ({str(e)[:80]})")
            return None
        reps, inner = 3, 3
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(inner):
                state, loss = step(state, mel, toks)
            sync(loss)
            ts.append((time.perf_counter() - t0) / inner)
        t = float(np.median(ts))
        mfu = step_flops(dims, n_tok) * B / t / (peak_tflops * 1e12)
        print(f"  {label} B={B:4d}: {t * 1e3:7.1f} ms/step  "
              f"{B * 30 / t:8.0f} audio-s/s  MFU {mfu * 100:5.1f}%")
        return {"B": B, "ms": t * 1e3, "audio_s_per_s": B * 30 / t,
                "mfu": mfu}
    finally:
        model.set_remat(False)


def bench_quantum_step(B, peak_tflops):
    """Quantum-stem (8-qubit QuantumConv1d) char-ASR train step on-chip."""
    from qasr_ijcnlp_tpu.data import CharVocabulary
    from qasr_ijcnlp_tpu.models.asr import init_mlp_head
    from qasr_ijcnlp_tpu.models.quantum import create_quantum_whisper_tiny
    from qasr_ijcnlp_tpu.train.loops import char_asr_loss_fn, encoder_fn_for
    from qasr_ijcnlp_tpu.train.step import (
        init_state, make_optimizer, make_train_step,
    )

    qmodel = create_quantum_whisper_tiny(n_qubits=8)
    vocab = CharVocabulary.build(["the quick brown fox jumps over a lazy dog"])
    dims = qmodel.dims
    head = init_mlp_head(jax.random.PRNGKey(1), dims.n_audio_state,
                         vocab.num_chars)
    params = {"encoder": qmodel.params["encoder"], "head": head}
    loss_fn = char_asr_loss_fn(encoder_fn_for(qmodel), "mlp")
    tx = make_optimizer(lambda _: 1e-4)
    state = init_state(params, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, dims.n_mels, 3000)),
                      jnp.float32)
    chars = jnp.asarray(rng.integers(1, vocab.num_chars, (B, 64)), jnp.int32)
    try:
        state, loss = step(state, mel, chars)
        sync(loss)
    except Exception as e:
        print(f"  quantum-stem (8q) B={B}: OOM/fail ({str(e)[:80]})")
        return None
    reps, inner = 3, 3
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            state, loss = step(state, mel, chars)
        sync(loss)
        ts.append((time.perf_counter() - t0) / inner)
    t = float(np.median(ts))
    print(f"  quantum-stem (8q) B={B:3d}: {t * 1e3:7.1f} ms/step  "
          f"{B * 30 / t:8.0f} audio-s/s")
    return {"B": B, "ms": t * 1e3, "audio_s_per_s": B * 30 / t}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", choices=["tiny", "base"])
    ap.add_argument("--batches", default="16,32,64,128,256")
    ap.add_argument("--tokens", type=int, default=120)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--skip-quantum", action="store_true")
    ap.add_argument("--remat-batch", type=int, default=0,
                    help="run a remat on/off A/B at this batch (0 = largest)")
    ap.add_argument("--accum", type=int, default=4)
    args = ap.parse_args()

    from qasr_ijcnlp_tpu.cli import enable_compilation_cache

    enable_compilation_cache()
    from qasr_ijcnlp_tpu.models.dims import dims_for

    dims = dims_for(args.model)
    batches = [int(b) for b in args.batches.split(",")]
    print(f"backend: {jax.default_backend()}  model: {args.model}  "
          f"tokens/utt: {args.tokens}  peak: {args.peak_tflops} TFLOP/s")

    print("batch sweep (remat off, no accumulation):")
    results = []
    failed_B = None
    for B in batches:
        r = bench_token_step(dims, B, args.tokens, args.peak_tflops,
                             label=args.model)
        if r is None:
            failed_B = B
            break
        results.append(r)

    if results:
        rb = args.remat_batch or results[-1]["B"]
        print(f"remat A/B at B={rb}:")
        bench_token_step(dims, rb, args.tokens, args.peak_tflops,
                         remat=True, label=f"{args.model}+remat")
        if failed_B is not None:
            # remat's real payoff is extending the batch envelope: retry the
            # batch that failed without it
            print(f"remat at failed batch B={failed_B}:")
            bench_token_step(dims, failed_B, args.tokens, args.peak_tflops,
                             remat=True, label=f"{args.model}+remat")
        print(f"grad-accum A/B at global B={rb} ({args.accum} microbatches):")
        bench_token_step(dims, rb, args.tokens, args.peak_tflops,
                         accum=args.accum, label=f"{args.model}+accum")

    if not args.skip_quantum and args.model == "tiny":
        print("quantum-stem train step:")
        for B in (16, 64):
            bench_quantum_step(B, args.peak_tflops)


if __name__ == "__main__":
    main()

"""Token-level Whisper training on LibriSpeech (from re-initialized weights).

Reference: /root/reference/train_classical_whisper_asr.py - load official
tiny, re-initialize all weights, tokenizer-space teacher forcing with -100
padding, AdamW(0.9,0.98,1e-6) + linear-warmup-cosine per step, best-WER +
periodic epoch checkpoints.
"""

from __future__ import annotations

import argparse

import jax

from ..data import TokenASRView, load_librispeech
from ..data.loader import DataLoader
from ..models import whisper as cmodel
from ..models.dims import dims_for
from ..reporting import print_training_header
from ..tokenizer import get_tokenizer
from ..train.loops import train_token_asr
from . import resolve_device


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_size", type=str, default="tiny")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_audio_length", type=int, default=30)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--save_every", type=int, default=5,
                   help="Write a full TrainState (params + optimizer + "
                        "step) checkpoint every N epochs; 0 disables")
    p.add_argument("--resume_state", type=str, default=None,
                   help="Resume from a full TrainState checkpoint "
                        "(state_epoch_N / best_wer_state dir)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="Accumulate gradients over N microbatches per "
                        "optimizer step (batch_size must divide by N); "
                        "exact full-batch equivalence. Throughput optimum "
                        "on one v5e chip: --batch_size 128 --grad_accum 4 "
                        "(7,053 audio-s/s vs 6,647 at the default; "
                        "docs/BENCHMARKS.md 'Training')")
    p.add_argument("--warmup_epochs", type=int, default=3)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--max_tokens", type=int, default=448)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/classical_asr")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize transformer blocks in backward "
                        "(less HBM, ~30%% more FLOPs)")
    p.add_argument("--model_parallel", type=int, default=0,
                   help="Enable SPMD over all devices with this TP degree "
                        "(0 = single-device). Note: on virtual CPU meshes, "
                        "full-size models exceed XLA:CPU's 40s collective "
                        "rendezvous timeout - use real accelerator meshes "
                        "(tiny-shape CPU-mesh validation lives in "
                        "tests/test_parallel.py and __graft_entry__.py)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: slice params + Adam moments along the data "
                        "axis (implies an SPMD mesh; combine with "
                        "--model_parallel for 2D TP x FSDP sharding). The "
                        "same virtual-CPU-mesh caveat as --model_parallel "
                        "applies (XLA:CPU 40s rendezvous timeout at real "
                        "widths; tests/test_fsdp.py validates on tiny "
                        "shapes)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    resolve_device(args.device)

    if args.remat:
        cmodel.set_remat(True)
    dims = dims_for(args.model_size)
    # "From scratch": random init with the official architecture
    # (reference :38-81 re-initializes every weight of the loaded model).
    params = cmodel.init_params(jax.random.PRNGKey(0), dims)
    tokenizer = get_tokenizer(
        multilingual=not args.model_size.endswith(".en"),
        num_languages=99,
        language="en",
        task="transcribe",
    )

    # train.100 (+ train.360 when available) like the reference (:372-399).
    train_base = load_librispeech("train.100", args.max_samples or 64)
    val_base = load_librispeech("validation", (args.max_samples or 64) // 4 or 8)

    train_loader = DataLoader(
        TokenASRView(train_base, tokenizer, args.max_tokens, dims.n_mels),
        args.batch_size,
    )
    val_loader = DataLoader(
        TokenASRView(val_base, tokenizer, args.max_tokens, dims.n_mels),
        args.batch_size, shuffle=False,
    )

    print_training_header(f"classical whisper {args.model_size} (token-level)",
                          args.epochs, args.lr, args.batch_size)
    mesh = None
    if args.model_parallel or args.fsdp:
        from .. import parallel

        mesh = parallel.make_mesh(model_parallel=args.model_parallel or 1)
        print(f"SPMD mesh: {mesh.devices.shape} (data, model)"
              + (" + fsdp" if args.fsdp else ""))
    steps_per_epoch = max(len(train_loader), 1)
    out = train_token_asr(
        params,
        dims,
        tokenizer,
        train_loader,
        val_loader,
        epochs=args.epochs,
        learning_rate=args.lr,
        warmup_steps=args.warmup_epochs * steps_per_epoch,
        checkpoint_dir=args.checkpoint_dir,
        history_path="classical_whisper_asr_training_history.json",
        mesh=mesh,
        fsdp=args.fsdp,
        grad_accum=args.grad_accum,
        save_state_every=args.save_every,
        resume_state=args.resume_state,
    )
    print("Training complete. Best:", out["tracker"].best)
    return out


if __name__ == "__main__":
    main()

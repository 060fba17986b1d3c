"""Export the fused greedy-decode program as an AOT deployment artifact.

One self-describing file (JSON metadata + StableHLO, weights baked in)
that a deployment host runs with jax alone — no model code, checkpoint,
or tokenizer assets needed for token ids.  See qasr_ijcnlp_tpu/export.py.

    python -m qasr_ijcnlp_tpu.cli.export_decode --model tiny \
        --batch 8 --out tiny_decode.qasrx --platforms tpu cpu

Beyond-reference capability (the reference's decode requires the full
PyTorch package + checkpoint download, whisper/__init__.py:103-161).
"""

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="tiny")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--language", type=str, default="en")
    p.add_argument("--task", type=str, default="transcribe")
    p.add_argument("--sample_len", type=int, default=None)
    p.add_argument("--timestamps", action="store_true",
                   help="Include timestamp tokens (default: notimestamps)")
    p.add_argument("--from_mel", action="store_true",
                   help="Artifact takes a (batch, n_mels, 3000) mel instead "
                        "of raw 30 s audio")
    p.add_argument("--platforms", type=str, nargs="*", default=None,
                   help="Lowering platforms, e.g. 'tpu cpu' (default: the "
                        "current backend). Compute dtype is resolved at "
                        "export time: export on a TPU host (or via the "
                        "tunnel) to bake bf16 compute")
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--no_fp16", action="store_true")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8"],
                   help="Weight-only quantization of the baked constants "
                        "(per-channel symmetric int8 + f32 scales; ~4x "
                        "smaller file, decode shifts by the rounding error)")
    args = p.parse_args(argv)

    from . import load_model_with_fallback, resolve_device

    resolve_device(args.device)

    from ..decode import DecodingOptions
    from ..export import export_greedy_decode, save_artifact

    model = load_model_with_fallback(args.model)
    opts = DecodingOptions(
        language=args.language, task=args.task,
        without_timestamps=not args.timestamps,
        sample_len=args.sample_len, fp16=not args.no_fp16,
    )
    exported, meta = export_greedy_decode(
        model, opts, batch=args.batch, from_audio=not args.from_mel,
        platforms=args.platforms, quantize=args.quantize,
    )
    save_artifact(args.out, exported, meta)
    print(
        f"wrote {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB): "
        f"batch={args.batch} platforms={meta['platforms']} "
        f"input={meta['input_shape']} quantize={meta['quantize']}"
    )


if __name__ == "__main__":
    main()

"""Evaluate a trained quantum Whisper ASR checkpoint on LibriSpeech test.

Reference: /root/reference/evaluate_quantum_whisper_asr.py - which crashes at
import time on nonexistent helpers (:23-30, SURVEY.md §2.4).  This is the
working version: rebuild the quantum model, restore the checkpoint, REAL
greedy char decoding, CER/WER + CER-distribution plot.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .. import metrics as qmetrics
from ..data import CharVocabulary, CharASRView, END, START, load_librispeech
from ..data.loader import DataLoader, pad_batch_to
from ..models import asr as asr_model
from ..models.quantum import create_quantum_whisper_tiny
from ..reporting import analyze_predictions, plot_cer_distribution, save_results_json
from ..train.checkpoint import load_metadata, load_pytree
from ..train.loops import encoder_fn_for
from . import resolve_device


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_path", type=str, required=True,
                   help="Path to a trained checkpoint (orbax dir)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--n_qubits", type=int, default=4)
    p.add_argument("--hidden_size", type=int, default=384)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--head", type=str, default="lstm", choices=["lstm", "mlp"])
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--max_text_len", type=int, default=100)
    p.add_argument("--real_decode", action="store_true",
                   help="Decode the MLP head autoregressively instead of "
                        "the reference's teacher-forced argmax")
    return p


def main(argv=None):
    import jax

    args = build_parser().parse_args(argv)
    resolve_device(args.device)

    meta = load_metadata(args.model_path) or {}
    if "char_vocab" in meta:
        vocab = CharVocabulary.from_json(meta["char_vocab"])
    else:
        # Rebuild from training history JSON like the reference (:36-69).
        hist = "quantum_whisper_asr_training_history.json"
        if os.path.exists(hist):
            import json

            with open(hist) as f:
                cfg = json.load(f).get("config", {})
            vocab = CharVocabulary.from_json(cfg["char_vocab"])
        else:
            raise SystemExit(
                "No char vocabulary found in checkpoint metadata or history JSON"
            )

    model = create_quantum_whisper_tiny(n_qubits=args.n_qubits)
    key = jax.random.PRNGKey(0)
    if args.head == "lstm":
        head = asr_model.init_lstm_decoder(
            key, model.dims.n_audio_state, vocab.num_chars,
            args.hidden_size, args.num_layers,
        )
    else:
        head = asr_model.init_mlp_head(
            key, model.dims.n_audio_state, vocab.num_chars,
            args.hidden_size, args.num_layers,
        )
    params = {"encoder": model.params["encoder"], "head": head}
    params = load_pytree(args.model_path, target=params)

    base = load_librispeech("test", args.max_samples or 32)
    loader = DataLoader(
        CharASRView(base, vocab, args.max_text_len), args.batch_size,
        shuffle=False,
    )
    encoder_apply = encoder_fn_for(model)

    import jax.numpy as jnp

    @jax.jit
    def embed(params, mel):
        return encoder_apply(params["encoder"], mel)

    predictions, targets = [], []
    for batch in loader:
        (mel, char_ids), real = pad_batch_to(batch, args.batch_size)
        enc = embed(params, mel)
        if args.head == "lstm":
            out, _ = asr_model.lstm_greedy_decode(
                params["head"], enc, START, END, args.max_text_len
            )
            out = np.asarray(out)
        elif args.real_decode:
            out, _ = asr_model.mlp_greedy_decode(
                params["head"], enc, START, END, args.max_text_len
            )
            out = np.asarray(out)
        else:
            logits = asr_model.mlp_head_char_logits(params["head"], enc, char_ids)
            out = np.asarray(jnp.argmax(logits, axis=-1))
        for b in range(real):
            predictions.append(vocab.decode(out[b]))
            targets.append(vocab.decode(np.asarray(char_ids[b][1:])))

    cer = qmetrics.calculate_cer(predictions, targets)
    wer = qmetrics.calculate_wer(predictions, targets)
    print(f"\nTest CER: {cer:.4f}  WER: {wer:.4f}  n={len(predictions)}")
    analyze_predictions(predictions, targets)
    per_sample = [
        qmetrics.calculate_cer([p], [t]) for p, t in zip(predictions, targets)
    ]
    plot_cer_distribution(per_sample, "quantum_asr_cer_distribution.png")
    save_results_json("quantum_whisper_asr_evaluation_results.json", {
        "model_path": args.model_path,
        "cer": cer,
        "wer": wer,
        "num_samples": len(predictions),
        "used_dummy_dataset": bool(getattr(base, "is_synthetic", False)),
    })
    return {"cer": cer, "wer": wer}


if __name__ == "__main__":
    main()

"""Train a (scaled) quantum Whisper from scratch on LibriSpeech.

Reference: /root/reference/train_whisper_from_scratch.py - whose training
loop is an acknowledged placeholder (losses on torch.randn logits, :176-186;
PLACEHOLDER_IMPLEMENTATION_GUIDE.md).  This is the *intended* pipeline
implemented for real (BASELINE.json config 5): an 8-qubit quantum conv stem
on a randomly initialized tiny trunk + the LSTM char decoder, trained
end-to-end (nothing frozen) with dual best-CER/WER checkpoints.
"""

from __future__ import annotations

import argparse

import jax

from ..data import CharVocabulary, CharASRView, dataset_texts, load_librispeech
from ..data.loader import DataLoader
from ..models import asr as asr_model
from ..models.dims import tiny_dims
from ..models.quantum import count_params, init_quantum_params
from ..reporting import print_model_info, print_training_header
from ..train.loops import train_char_asr
from ..models.quantum import quantum_encoder_apply
from . import resolve_device


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--n_qubits", type=int, default=8)
    p.add_argument("--hidden_size", type=int, default=384)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--max_text_len", type=int, default=100)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/from_scratch")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    resolve_device(args.device)

    dims = tiny_dims()
    key = jax.random.PRNGKey(0)
    params_full = init_quantum_params(key, dims, n_qubits=args.n_qubits)

    train_base = load_librispeech("train.100", args.max_samples or 64)
    val_base = load_librispeech("validation", (args.max_samples or 64) // 4 or 8)
    vocab = CharVocabulary.build(
        dataset_texts(train_base, 1000)
    )
    head = asr_model.init_lstm_decoder(
        jax.random.fold_in(key, 1), dims.n_audio_state, vocab.num_chars,
        args.hidden_size, args.num_layers,
    )
    params = {"encoder": params_full["encoder"], "head": head}

    def encoder_apply(enc_params, mel):
        return quantum_encoder_apply(enc_params, mel, dims)

    print_model_info(
        f"quantum whisper from scratch ({args.n_qubits} qubits)",
        count_params(params), count_params(params),
    )
    print_training_header("from-scratch quantum ASR", args.epochs, args.lr,
                          args.batch_size)

    train_loader = DataLoader(
        CharASRView(train_base, vocab, args.max_text_len), args.batch_size
    )
    val_loader = DataLoader(
        CharASRView(val_base, vocab, args.max_text_len), args.batch_size,
        shuffle=False,
    )
    out = train_char_asr(
        params,
        encoder_apply,
        train_loader,
        val_loader,
        vocab,
        head_kind="lstm",
        epochs=args.epochs,
        learning_rate=args.lr,
        trainable_mask=None,  # nothing frozen: true from-scratch training
        checkpoint_dir=args.checkpoint_dir,
        history_path="whisper_from_scratch_training_history.json",
    )
    print("Training complete. Best:", out["tracker"].best)
    return out


if __name__ == "__main__":
    main()

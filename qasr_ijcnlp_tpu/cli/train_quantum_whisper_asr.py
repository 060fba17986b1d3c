"""Train the quantum Whisper ASR model (char-level) on LibriSpeech.

Reference: /root/reference/train_quantum_whisper_asr.py - quantum conv stem
from pretrained tiny, frozen trunk, char vocab from the first 1000
transcripts, CE(ignore <PAD>), AdamW+cosine, dual best-CER/WER checkpoints +
JSON history.  The decoder here is the *intended* 2-layer 384-d LSTM char
decoder (README.md:48-51; the shipped MLP head is available via
--head mlp), and validation uses REAL greedy decoding (the reference scored
placeholder strings, :217-218 - SURVEY.md §2.4).
"""

from __future__ import annotations

import argparse

import jax

from ..data import CharVocabulary, CharASRView, dataset_texts, load_librispeech
from ..data.loader import DataLoader
from ..models import asr as asr_model
from ..models.quantum import (
    count_params,
    create_quantum_whisper_tiny,
    trainable_mask,
)
from ..reporting import print_model_info, print_training_header
from ..train.loops import encoder_fn_for, train_char_asr
from . import resolve_device


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--n_qubits", type=int, default=4)
    p.add_argument("--hidden_size", type=int, default=384)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--head", type=str, default="lstm", choices=["lstm", "mlp"])
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--max_text_len", type=int, default=100)
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints/quantum_asr")
    p.add_argument("--resume", type=str, default=None,
                   help="Checkpoint path to resume parameters from")
    p.add_argument("--real_val_decode", action="store_true",
                   help="Validate the MLP head with true autoregressive "
                        "greedy decoding instead of the reference's "
                        "teacher-forced argmax (LSTM always decodes "
                        "autoregressively)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    resolve_device(args.device)

    model = create_quantum_whisper_tiny(n_qubits=args.n_qubits)
    train_base = load_librispeech("train.100", args.max_samples or 64)
    val_base = load_librispeech("validation", (args.max_samples or 64) // 4 or 8)

    # Char vocab from the first 1000 training transcripts (:344-353).
    vocab = CharVocabulary.build(
        dataset_texts(train_base, 1000)
    )
    print(f"Built character vocabulary with {vocab.num_chars} characters")

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
    mask = trainable_mask(params, extra_names=("head",))

    n_total = count_params(params)
    n_train = count_params(
        jax.tree.map(lambda p, m: p if m else None, params, mask)
    )
    print_model_info(model.name + f" + {args.head} char decoder", n_total, n_train)
    print_training_header("quantum ASR (char-level)", args.epochs, args.lr,
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
        encoder_fn_for(model),
        train_loader,
        val_loader,
        vocab,
        head_kind=args.head,
        epochs=args.epochs,
        learning_rate=args.lr,
        trainable_mask=mask,
        checkpoint_dir=args.checkpoint_dir,
        history_path="quantum_whisper_asr_training_history.json",
        resume_from=args.resume,
        real_decode=args.real_val_decode,
    )
    print("Training complete. Best:", out["tracker"].best)
    return out


if __name__ == "__main__":
    main()

"""Train the quantum Whisper classifier (Speech Commands or LibriSpeech).

Reference: /root/reference/train_quantum_whisper.py - quantum conv stem,
frozen trunk, encoder -> mean-pool -> Linear head, AdamW+cosine, triple
best-acc/loss/WER checkpoints (:279-296).  ``--dataset librispeech``
reproduces the reference's whole-utterance-text-as-class-label quirk
(:79-129) deliberately.
"""

from __future__ import annotations

import argparse

import jax

from ..data import (
    ClassificationView,
    dataset_texts,
    SPEECH_COMMANDS_LABELS,
    load_librispeech,
    load_speech_commands,
)
from ..data.loader import DataLoader
from ..models import classifier as clf_model
from ..models.quantum import (
    count_params,
    create_quantum_whisper_tiny,
    trainable_mask,
)
from ..reporting import print_model_info, print_training_header
from ..train.loops import encoder_fn_for, evaluate_classifier, train_classifier
from . import resolve_device


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--n_qubits", type=int, default=4)
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--dataset", type=str, default="google",
                   choices=["google", "librispeech"])
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--checkpoint_dir", type=str,
                   default="checkpoints/quantum_classifier")
    return p


def _librispeech_as_classification(split, max_samples):
    """Whole-utterance transcript as the class label (reference :79-129)."""
    base = load_librispeech(split, max_samples)
    texts = sorted(set(dataset_texts(base)))
    label_of = {t: i for i, t in enumerate(texts)}

    class _View:
        is_synthetic = getattr(base, "is_synthetic", False)

        def __len__(self):
            return len(base)

        def __getitem__(self, i):
            audio, text = base[i]
            return audio, label_of[text]

    return _View(), len(texts)


def main(argv=None):
    args = build_parser().parse_args(argv)
    resolve_device(args.device)

    if args.dataset == "google":
        train_base = load_speech_commands("train", args.max_samples or 64)
        val_base = load_speech_commands(
            "validation", (args.max_samples or 64) // 4 or 8
        )
        num_classes = len(SPEECH_COMMANDS_LABELS)
    else:
        train_base, num_classes = _librispeech_as_classification(
            "train.100", args.max_samples or 64
        )
        val_base, _ = _librispeech_as_classification(
            "validation", (args.max_samples or 64) // 4 or 8
        )

    model = create_quantum_whisper_tiny(n_qubits=args.n_qubits)
    if args.pretrained_path:
        from ..train.checkpoint import load_pytree

        try:  # shape-matched copy like the reference (:392-413)
            restored = load_pytree(args.pretrained_path, target=model.params)
            model.params = restored
            print(f"Loaded pretrained weights from {args.pretrained_path}")
        except Exception as e:
            print(f"Could not load {args.pretrained_path}: {e}; continuing")

    key = jax.random.PRNGKey(0)
    params = {
        "encoder": model.params["encoder"],
        "head": clf_model.init_classifier_head(
            key, model.dims.n_audio_state, num_classes
        ),
    }
    mask = trainable_mask(params, extra_names=("head",))
    n_total = count_params(params)
    n_train = count_params(jax.tree.map(lambda p, m: p if m else None, params, mask))
    print_model_info(f"{model.name} classifier ({num_classes} classes)",
                     n_total, n_train)
    print_training_header(f"quantum classification ({args.dataset})",
                          args.epochs, args.lr, args.batch_size)

    train_loader = DataLoader(ClassificationView(train_base), args.batch_size)
    val_loader = DataLoader(ClassificationView(val_base), args.batch_size,
                            shuffle=False)
    out = train_classifier(
        params,
        encoder_fn_for(model),
        train_loader,
        val_loader,
        epochs=args.epochs,
        learning_rate=args.lr,
        trainable_mask=mask,
        checkpoint_dir=args.checkpoint_dir,
        history_path="quantum_whisper_training_history.json",
    )

    # Final: evaluate all saved best checkpoints on test (reference :331-365).
    test_base = (
        load_speech_commands("test", (args.max_samples or 64) // 4 or 8)
        if args.dataset == "google"
        else _librispeech_as_classification("test", (args.max_samples or 64) // 4
                                            or 8)[0]
    )
    test_loader = DataLoader(ClassificationView(test_base), args.batch_size,
                             shuffle=False)
    test = evaluate_classifier(out["params"], encoder_fn_for(model), test_loader)
    print(f"Test: acc={test['accuracy']:.4f} loss={test['loss']:.4f} "
          f"wer={test['wer']:.4f}")
    return out


if __name__ == "__main__":
    main()

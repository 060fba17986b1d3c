"""Speech-command classification eval with the pretrained Whisper encoder.

Reference: /root/reference/evaluate_whisper_pretrained_modified_gspeech.py -
encoder -> mean-pool -> Linear classifier on Google Speech Commands, with
``--n_repeats`` majority voting over repeated forward passes (:168-227) and
class-wise accuracy breakdown (:463-526).
"""

from __future__ import annotations

import argparse
from collections import defaultdict

import jax
import numpy as np

from ..data import (
    ClassificationView,
    dataset_texts,
    SPEECH_COMMANDS_LABELS,
    load_librispeech,
    load_speech_commands,
)
from ..data.loader import DataLoader, pad_batch_to
from ..models import classifier as clf_model
from ..reporting import save_results_json
from ..train.loops import encoder_fn_for
from . import load_model_with_fallback, resolve_device


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="google",
                   choices=["google", "librispeech"])
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--n_repeats", type=int, default=10)
    p.add_argument("--model_size", type=str, default="tiny")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--classifier_path", type=str, default=None,
                   help="Optional trained head checkpoint")
    p.add_argument("--device", type=str, default="auto")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    resolve_device(args.device)

    model = load_model_with_fallback(args.model_size)
    if args.dataset == "google":
        base = load_speech_commands("test", args.max_samples or 32)
        num_classes = len(SPEECH_COMMANDS_LABELS)
        label_names = SPEECH_COMMANDS_LABELS
    else:
        # LibriSpeech-as-classification: whole transcript = class label
        # (reference train_quantum_whisper.py:79-129 convention).
        libri = load_librispeech("test", args.max_samples or 32)
        texts = sorted(set(dataset_texts(libri)))
        label_of = {t: i for i, t in enumerate(texts)}

        class _View:
            is_synthetic = getattr(libri, "is_synthetic", False)

            def __len__(self):
                return len(libri)

            def __getitem__(self, i):
                audio, text = libri[i]
                return audio, label_of[text]

        base = _View()
        num_classes = len(texts)
        label_names = [t[:20] for t in texts]

    head = clf_model.init_classifier_head(
        jax.random.PRNGKey(0), model.dims.n_audio_state, num_classes
    )
    params = {"encoder": model.params["encoder"], "head": head}
    if args.classifier_path:
        from ..train.checkpoint import load_pytree

        params = load_pytree(args.classifier_path, target=params)
    loader = DataLoader(ClassificationView(base), args.batch_size, shuffle=False)
    encoder_apply = encoder_fn_for(model)

    @jax.jit
    def infer(params, mel):
        return clf_model.classifier_apply(
            params["head"], encoder_apply(params["encoder"], mel)
        )

    per_class = defaultdict(lambda: [0, 0])
    correct = total = 0
    for batch in loader:
        (mel, labels), real = pad_batch_to(batch, args.batch_size)
        # The reference majority-votes over n_repeats stochastic forward
        # passes (:168-227); our jitted forward is deterministic (no
        # dropout, closed-form quantum sim), so n identical votes reduce to
        # one pass — run once instead of burning n_repeats x the device time.
        pred = np.asarray(infer(params, mel)).argmax(-1)
        labels = np.asarray(labels)
        for b in range(real):
            per_class[int(labels[b])][1] += 1
            if pred[b] == labels[b]:
                per_class[int(labels[b])][0] += 1
                correct += 1
            total += 1

    acc = correct / max(total, 1)
    print(f"\nOverall accuracy: {acc:.4f} ({correct}/{total})  "
          f"n_repeats={args.n_repeats}")
    print("\nClass-wise accuracy:")
    class_acc = {}
    for cid in sorted(per_class):
        hit, n = per_class[cid]
        name = label_names[cid] if cid < len(label_names) else str(cid)
        class_acc[name] = hit / max(n, 1)
        print(f"  {name:<10} {hit}/{n}  ({100.0 * hit / max(n, 1):.1f}%)")
    if getattr(base, "is_synthetic", False):
        print("NOTE: synthetic offline dataset - metrics are not comparable")

    save_results_json("gspeech_classification_results.json", {
        "model": model.name,
        "accuracy": acc,
        "n_repeats": args.n_repeats,
        "num_samples": total,
        "class_accuracy": class_acc,
        "used_dummy_dataset": bool(getattr(base, "is_synthetic", False)),
    })
    return {"accuracy": acc, "class_accuracy": class_acc}


if __name__ == "__main__":
    main()

"""Batch greedy-decode evaluation of pretrained Whisper on LibriSpeech.

The canonical RTF/WER configuration (BASELINE.json config 1; reference
/root/reference/evaluate_pretrained_whisper.py): per-item pad/trim + log-mel,
batched ``model.decode`` with ``language='en', without_timestamps=True``,
EnglishTextNormalizer on both sides, corpus WER + aggregate (pure) CER,
results JSON.  Adds RTF (audio-seconds per wall-second) measurement.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from .. import metrics as qmetrics
from ..audio import log_mel_spectrogram, pad_or_trim
from ..data import dataset_texts, load_librispeech
from ..data.loader import DataLoader, pad_batch_to
from ..decode import DecodingOptions
from ..reporting import save_results_json
from . import load_model_with_fallback, resolve_device


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_size", type=str, default="base.en")
    p.add_argument("--split", type=str, default="test-clean")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard the eval batch across all devices; batches "
                        "are padded up to a multiple of the device count "
                        "and the padding rows discarded, so any batch size "
                        "works")
    return p


_SPLIT_MAP = {
    "test-clean": "test", "dev-clean": "validation",
    "train-clean-100": "train.100",
}


class _AudioView:
    """Yields padded raw audio; the mel runs as ONE batched device program
    per eval batch instead of a per-item round trip."""

    def __init__(self, base):
        self.base = base
        # True per-clip durations, recorded as clips stream through, so the
        # reported RTF counts real speech seconds — not the 30 s padded
        # window (LibriSpeech averages ~12 s/clip; counting padding would
        # overstate throughput ~2.5x).
        self.durations = np.zeros(len(base))

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        audio, text = self.base[i]
        self.durations[int(i)] = len(audio) / 16000.0
        return np.asarray(pad_or_trim(audio), np.float32), np.int32(i)


def main(argv=None):
    args = build_parser().parse_args(argv)
    resolve_device(args.device)

    model = load_model_with_fallback(args.model_size)
    base = load_librispeech(
        _SPLIT_MAP.get(args.split, args.split), args.max_samples
    )
    texts = dataset_texts(base)
    view = _AudioView(base)
    loader = DataLoader(view, args.batch_size, shuffle=False)

    mesh = None
    eff_batch = args.batch_size
    if args.data_parallel:
        from .. import parallel

        mesh = parallel.make_mesh(model_parallel=1)
        model.shard(mesh)
        # Degrade, never refuse: pad the compiled batch shape up to a
        # multiple of the data axis; padding rows are decoded and discarded.
        eff_batch = parallel.round_up_to_mesh(args.batch_size, mesh)
        print(f"Data-parallel eval over {mesh.devices.size} devices "
              f"(batch {args.batch_size} -> {eff_batch})")

    options = DecodingOptions(language="en", without_timestamps=True)
    hypotheses = [None] * len(base)
    t0 = time.time()
    for batch in loader:
        (audio, idx), real = pad_batch_to(batch, eff_batch)
        audio = jax.numpy.asarray(audio)
        if mesh is not None:
            from .. import parallel

            audio = parallel.shard_batch(audio, mesh)
        mel = log_mel_spectrogram(audio, model.dims.n_mels)
        results = model.decode(mel, options)
        for b in range(real):
            hypotheses[int(idx[b])] = results[b].text
    jax.block_until_ready(jax.numpy.zeros(()))
    wall = time.time() - t0
    audio_seconds = float(view.durations.sum())
    rtf = audio_seconds / wall

    normalizer = qmetrics.EnglishTextNormalizer()
    norm_hyps = [normalizer(h) for h in hypotheses]
    norm_refs = [normalizer(t) for t in texts]
    wer = qmetrics.wer_corpus(norm_refs, norm_hyps)
    cer = qmetrics.calculate_cer_pure(norm_hyps, norm_refs)

    print(f"\nModel: {model.name}  split: {args.split}  n={len(base)}")
    print(f"WER: {wer * 100:.2f} %   CER: {cer * 100:.2f} %")
    print(f"RTF: {rtf:.1f} audio-sec/sec ({wall:.1f}s wall)")
    if getattr(base, "is_synthetic", False):
        print("NOTE: synthetic offline dataset - metrics are not comparable")

    out = args.output or f"pretrained_whisper_{args.model_size}_evaluation_results.json"
    save_results_json(out, {
        "model": model.name,
        "split": args.split,
        "num_samples": len(base),
        "wer": wer,
        "cer": cer,
        "rtf_audio_sec_per_sec": rtf,
        "used_dummy_dataset": bool(getattr(base, "is_synthetic", False)),
        "samples": [
            {"reference": r, "hypothesis": h}
            for r, h in list(zip(texts, hypotheses))[:10]
        ],
    })
    print(f"Results saved to {out}")
    return {"wer": wer, "cer": cer, "rtf": rtf}


if __name__ == "__main__":
    main()

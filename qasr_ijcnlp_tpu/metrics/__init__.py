"""Evaluation metrics: CER/WER with the reference's exact conventions.

The reference wires THREE different error-rate definitions
(/root/reference/utils.py:18-119); entry points must use the same one the
reference script uses, so all three are provided:

* :func:`calculate_cer` — per-sample char error rate, averaged over samples
  (utils.py:18-34, editdistance semantics).
* :func:`calculate_cer_pure` — aggregate: total char edits / total ref chars
  (utils.py:102-119).
* :func:`calculate_wer` — corpus word error rate, total word edits / total
  ref words (jiwer semantics, utils.py:36-49); per-sample-mean fallback
  matches the except-branch (utils.py:50-67).

The Levenshtein core is a numpy two-row DP (no external editdistance/jiwer
dependency — neither ships in this environment).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

from .normalizers import (  # noqa: F401
    BasicTextNormalizer,
    EnglishNumberNormalizer,
    EnglishSpellingNormalizer,
    EnglishTextNormalizer,
)


_NATIVE_LEV = "unset"


def _native_lev():
    global _NATIVE_LEV
    if _NATIVE_LEV == "unset":
        try:
            from .._native import native_levenshtein

            if native_levenshtein([1], [1]) == 0:
                _NATIVE_LEV = native_levenshtein
            else:  # pragma: no cover
                _NATIVE_LEV = None
        except Exception:
            _NATIVE_LEV = None
    return _NATIVE_LEV


def levenshtein(ref: Sequence, hyp: Sequence) -> int:
    """Edit distance (ins/del/sub cost 1): C++ core (native/editdist.cpp)
    with a vectorized numpy two-row DP fallback."""
    if len(ref) == 0:
        return len(hyp)
    if len(hyp) == 0:
        return len(ref)
    # Map to int ids so the comparison is integer equality.
    vocab = {}
    r = np.asarray([vocab.setdefault(x, len(vocab)) for x in ref])
    h = np.asarray([vocab.setdefault(x, len(vocab)) for x in hyp])
    native = _native_lev()
    if native is not None:
        return native(r, h)
    m = len(h)
    pos = np.arange(m + 1)
    prev = pos.copy()
    for i, ri in enumerate(r, start=1):
        # t[j] = min(substitute, delete) for j=1..m; the insert chain
        # cur[j] = min(t[j], cur[j-1]+1) unrolls to a prefix-min over t[k]-k.
        t = np.minimum(prev[:-1] + (h != ri), prev[1:] + 1)
        chain = np.concatenate(([i], t)) - pos
        prev = np.minimum.accumulate(chain) + pos
    return int(prev[-1])


def _require_parallel_lists(predictions, targets):
    if len(predictions) != len(targets):
        raise ValueError(
            f"got {len(predictions)} predictions vs {len(targets)} targets"
        )


def calculate_cer(predictions: List[str], targets: List[str]) -> float:
    """Mean per-sample CER (reference utils.py:18-34)."""
    _require_parallel_lists(predictions, targets)
    rates = []
    for pred, tgt in zip(predictions, targets):
        if len(tgt) == 0:
            rates.append(0.0 if len(pred) == 0 else 1.0)
        else:
            rates.append(levenshtein(tgt, pred) / len(tgt))
    return float(np.mean(rates)) if rates else 0.0


def calculate_cer_pure(predictions: List[str], targets: List[str]) -> float:
    """Aggregate CER: total edits / total target chars (utils.py:102-119)."""
    _require_parallel_lists(predictions, targets)
    edits = sum(levenshtein(t, p) for p, t in zip(predictions, targets))
    chars = sum(len(t) for t in targets)
    return edits / chars if chars else 0.0


def _words(s: Union[str, List[str]]) -> List[str]:
    return s.split() if isinstance(s, str) else list(s)


def wer_corpus(references: List[str], hypotheses: List[str]) -> float:
    """Corpus WER: total word edits / total reference words (jiwer.wer)."""
    _require_parallel_lists(hypotheses, references)
    edits = sum(
        levenshtein(_words(r), _words(h)) for r, h in zip(references, hypotheses)
    )
    words = sum(len(_words(r)) for r in references)
    return edits / words if words else 0.0


def calculate_wer(predictions: List[str], targets: List[str]) -> float:
    """Reference calculate_wer (utils.py:36-49): corpus WER over the lists."""
    return wer_corpus(targets, predictions)


def calculate_wer_per_sample_mean(predictions: List[str], targets: List[str]) -> float:
    """The reference's jiwer-unavailable fallback (utils.py:50-67)."""
    _require_parallel_lists(predictions, targets)
    rates = []
    for pred, tgt in zip(predictions, targets):
        tw, pw = _words(tgt), _words(pred)
        if not tw:
            rates.append(0.0 if not pw else 1.0)
        else:
            rates.append(levenshtein(tw, pw) / len(tw))
    return float(np.mean(rates)) if rates else 0.0

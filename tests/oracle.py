"""Import the read-only reference PyTorch implementation as a numerics oracle.

The reference (/root/reference) depends on `tiktoken` (Rust BPE) and `numba`,
neither of which is installed.  We satisfy those imports with light stubs:

* `tiktoken` is backed by *our own* BPE implementation
  (qasr_ijcnlp_tpu.tokenizer), which lets reference code paths that need a
  real tokenizer (decoding, suppress lists) run with full fidelity - and
  doubles as an end-to-end check that our tokenizer is a drop-in.
* `numba.jit` becomes a no-op decorator (the reference only uses nopython DP
  loops, which run fine as plain Python for test-sized inputs).

Nothing from the reference is copied; it is imported in place, read-only.
"""

import sys
import types

_REF_WHISPER_PATH = "/root/reference/whisper"


class _TiktokenEncodingAdapter:
    """Adapts qasr_ijcnlp_tpu's Encoding to the tiktoken.Encoding surface."""

    def __init__(self, name=None, explicit_n_vocab=None, pat_str=None,
                 mergeable_ranks=None, special_tokens=None):
        from qasr_ijcnlp_tpu.tokenizer import bpe

        self._enc = bpe.Encoding(
            name=name or "adapter",
            pat_str=pat_str,
            mergeable_ranks=mergeable_ranks,
            special_tokens=special_tokens or {},
        )
        self.special_tokens_set = set((special_tokens or {}).keys())
        self.eot_token = (special_tokens or {}).get("<|endoftext|>")
        self.n_vocab = explicit_n_vocab

    def encode(self, text, **kwargs):
        return self._enc.encode(text)

    def decode(self, ids, **kwargs):
        return self._enc.decode(ids)

    def encode_single_token(self, text):
        return self._enc.encode_single_token(text)


def install_stubs():
    if "tiktoken" not in sys.modules:
        fake = types.ModuleType("tiktoken")
        fake.Encoding = _TiktokenEncodingAdapter
        sys.modules["tiktoken"] = fake
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    # jiwer/editdistance aren't installed; back the reference's metric calls
    # with OUR implementations - doubling as a drop-in equivalence check.
    if "jiwer" not in sys.modules:
        from qasr_ijcnlp_tpu import metrics as _m

        jiwer = types.ModuleType("jiwer")
        jiwer.wer = lambda refs, hyps: _m.wer_corpus(
            refs if isinstance(refs, list) else [refs],
            hyps if isinstance(hyps, list) else [hyps],
        )
        sys.modules["jiwer"] = jiwer
    if "editdistance" not in sys.modules:
        from qasr_ijcnlp_tpu import metrics as _m

        ed = types.ModuleType("editdistance")
        ed.eval = lambda a, b: _m.levenshtein(a, b)
        sys.modules["editdistance"] = ed


def reference_root():
    """Put /root/reference itself on sys.path (root-level scripts/utils)."""
    install_stubs()
    for p in ("/root/reference", _REF_WHISPER_PATH):
        if p not in sys.path:
            sys.path.insert(0, p)


def reference_whisper():
    """Import and return the reference `whisper` package (torch)."""
    install_stubs()
    if _REF_WHISPER_PATH not in sys.path:
        sys.path.insert(0, _REF_WHISPER_PATH)
    import whisper  # noqa: delayed import of the reference package

    return whisper

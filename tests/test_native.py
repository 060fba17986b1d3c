"""Native C++ BPE core: exact agreement with the pure-Python merge, plus a
throughput sanity check (the native path must actually be faster)."""

import time

import pytest

from qasr_ijcnlp_tpu.tokenizer import bpe


@pytest.fixture(scope="module")
def native():
    try:
        from qasr_ijcnlp_tpu import _native

        return _native.bpe_handle()
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")


@pytest.fixture(scope="module")
def enc():
    return bpe.get_encoding("gpt2")


SAMPLES = [
    "Hello, world!",
    "the quick brown fox jumps over the lazy dog",
    "Ⅻ unicode ± soup — café naïve 日本語のテキスト",
    " preceded by space",
    "CAPS and MiXeD CaSe tokens 12345 67.89",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "",
    "a",
    "\n\n\t  whitespace   runs \r\n",
]


def test_native_matches_python_on_samples(native, enc):
    for text in SAMPLES:
        for match in enc.pat.finditer(text):
            piece = match.group().encode("utf-8")
            assert native.merge(piece, enc.ranks) == bpe._bpe_merge_py(
                piece, enc.ranks
            ), piece


def test_native_matches_python_fuzz(native, enc, rng):
    import random

    rnd = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz ABC .,!?'0123456789é世"
    for _ in range(300):
        piece = "".join(
            rnd.choice(alphabet) for _ in range(rnd.randrange(1, 24))
        ).encode("utf-8")
        assert native.merge(piece, enc.ranks) == bpe._bpe_merge_py(
            piece, enc.ranks
        ), piece


def test_encoding_uses_native_and_roundtrips(enc):
    text = "The TPU-native framework encodes this sentence exactly once."
    ids = enc.encode(text)
    assert enc.decode(ids) == text


def test_native_is_faster(native, enc):
    words = ("internationalization " * 50).strip().split()
    pieces = [(" " + w).encode() for w in words]

    t0 = time.perf_counter()
    for _ in range(20):
        for p in pieces:
            bpe._bpe_merge_py(p, enc.ranks)
    t_py = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(20):
        for p in pieces:
            native.merge(p, enc.ranks)
    t_native = time.perf_counter() - t0
    assert t_native < t_py, (t_native, t_py)

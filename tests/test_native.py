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


def _wav_bytes(audio, rate=16000, channels=1, width=2):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if channels > 1:
            audio = np.repeat(audio[:, None], channels, axis=1).reshape(-1)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_native_wav_decode_matches_stdlib(native):
    import numpy as np

    from qasr_ijcnlp_tpu._native import native_wav_decode

    rng = np.random.default_rng(0)
    audio = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    out = native_wav_decode(_wav_bytes(audio))
    assert out is not None and out.shape == (16000,)
    np.testing.assert_allclose(out, (audio * 32767).astype(np.int16) / 32768.0, atol=1e-4)

    # stereo mono-mix
    out2 = native_wav_decode(_wav_bytes(audio, channels=2))
    np.testing.assert_allclose(out2, out, atol=1e-4)

    # resample 8k -> 16k doubles the length (within rounding)
    out3 = native_wav_decode(_wav_bytes(audio[:8000], rate=8000))
    assert abs(len(out3) - 16000) <= 2

    # malformed input -> clean error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        native_wav_decode(b"RIFFxxxxWAVEgarbage")


def test_load_audio_uses_native(tmp_path, native):
    import numpy as np

    from qasr_ijcnlp_tpu.audio import load_audio

    rng = np.random.default_rng(1)
    audio = (0.2 * rng.standard_normal(32000)).astype(np.float32)
    path = str(tmp_path / "clip.wav")
    with open(path, "wb") as f:
        f.write(_wav_bytes(audio))
    out = load_audio(path)
    assert out.shape == (32000,)
    np.testing.assert_allclose(out, (audio * 32767).astype(np.int16) / 32768.0, atol=1e-4)


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

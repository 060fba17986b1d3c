"""Tokenizer tests: id-layout parity, BPE round trips, word splitting."""

import pytest

from qasr_ijcnlp_tpu.tokenizer import LANGUAGES, get_encoding, get_tokenizer


def test_known_gpt2_ids():
    # Well-known GPT-2 BPE ids; fixed points of the public vocab.
    enc = get_encoding("gpt2")
    assert enc.encode("Hello world") == [15496, 995]
    assert enc.encode(" the") == [262]
    assert enc.n_vocab == 51864 + 0  # 50257 base ranks + 1607 specials


def test_special_token_layout_multilingual():
    t = get_tokenizer(True, language="en", task="transcribe")
    assert t.eot == 50257
    assert t.sot == 50258
    assert t.sot_sequence == (50258, 50259, 50359)
    assert t.no_timestamps == 50363
    assert t.timestamp_begin == 50364
    assert t.special_tokens["<|30.00|>"] == 50364 + 1500
    assert t.sot_sequence_including_notimestamps == (50258, 50259, 50359, 50363)
    assert len(t.all_language_tokens) == 99
    assert t.language_token == 50259
    assert t.to_language_token("ko") == 50258 + 1 + list(LANGUAGES).index("ko")


def test_special_token_layout_gpt2():
    t = get_tokenizer(False)
    assert t.eot == 50256
    assert t.sot == 50257
    assert t.sot_sequence == (50257,)
    assert t.timestamp_begin == 50363
    assert t.sot in t.sot_sequence


@pytest.mark.parametrize("multilingual", [True, False])
def test_roundtrip(multilingual):
    t = get_tokenizer(multilingual)
    for text in [
        "Hello, World! 123",
        "  leading and   multiple spaces ",
        "don't can't it's we're I'll I'd I've I'm",
        "naïve café — em-dash…  日本語テスト",
        "MiXeD CaSe & symbols #@$%^&*()",
    ]:
        assert t.decode(t.encode(text)) == text


def test_multilingual_korean_shorter_than_gpt2():
    # The multilingual BPE is trained on multilingual text, so Korean takes
    # far fewer tokens than byte-fallback GPT-2 (reference test_tokenizer.py).
    text = "안녕하세요"
    gpt2 = get_encoding("gpt2").encode(text)
    multi = get_encoding("multilingual").encode(text)
    assert get_encoding("multilingual").decode(multi) == text
    assert get_encoding("gpt2").decode(gpt2) == text
    assert len(multi) < len(gpt2)


def test_decode_strips_timestamps_but_decode_with_timestamps_keeps():
    t = get_tokenizer(True, language="en", task="transcribe")
    ids = [t.timestamp_begin] + t.encode(" hello") + [t.timestamp_begin + 54]
    assert t.decode(ids) == " hello"
    rendered = t.decode_with_timestamps(ids)
    assert rendered == "<|0.00|> hello<|1.08|>"


def test_split_tokens_on_unicode():
    t = get_tokenizer(True, language="en", task="transcribe")
    tokens = t.encode("So uh, we're going to!")
    words, word_tokens = t.split_tokens_on_unicode(tokens)
    assert "".join(words) == "So uh, we're going to!"
    assert [t for ts in word_tokens for t in ts] == tokens


def test_split_tokens_on_spaces():
    t = get_tokenizer(True, language="en", task="transcribe")
    tokens = t.encode("So uh, we're going to tell")
    words, word_tokens = t.split_tokens_on_spaces(tokens)
    # Punctuation becomes its own "word" (reference behavior).
    assert words == ["So", " uh", ",", " we're", " going", " to", " tell"]
    assert [t for ts in word_tokens for t in ts] == tokens


def test_split_on_unicode_reference_case():
    # Exact case from the reference suite (tests/test_tokenizer.py:27-34):
    # a token decoding to an incomplete UTF-8 sequence yields U+FFFD.
    t = get_tokenizer(True)
    tokens = [8404, 871, 287, 6, 246, 526, 3210, 20378]
    words, word_tokens = t.split_tokens_on_unicode(tokens)
    assert words == [" elle", " est", " l", "'", "�", "é", "rit", "oire"]
    assert word_tokens == [[8404], [871], [287], [6], [246], [526], [3210], [20378]]


def test_non_speech_tokens_suppress_annotations():
    t = get_tokenizer(True, language="en", task="transcribe")
    ns = t.non_speech_tokens
    assert len(ns) > 50
    # Every non-speech token decodes to a symbolish string.
    for tok in ns[:10]:
        s = t.decode_with_timestamps([tok]).strip()
        assert s and not s.isalnum()


def test_reference_tokenizer_runs_on_our_bpe():
    """The reference whisper tokenizer, backed by our BPE via the tiktoken
    adapter, must produce identical ids to our own tokenizer."""
    from . import oracle

    whisper = oracle.reference_whisper()
    from whisper.tokenizer import get_tokenizer as ref_get_tokenizer

    ref = ref_get_tokenizer(True, language="en", task="transcribe")
    ours = get_tokenizer(True, language="en", task="transcribe")
    assert tuple(ref.sot_sequence) == ours.sot_sequence
    for text in ["Hello world", " the quick brown fox", "multi\nline\ttext"]:
        assert ref.encode(text) == ours.encode(text)
    assert ref.non_speech_tokens == ours.non_speech_tokens


def test_word_split_fuzz_parity_vs_reference():
    """split_tokens_on_unicode/spaces match the reference exactly on mixed
    ASCII/CJK/emoji text and on raw token streams that split codepoints."""
    from tests.oracle import reference_whisper

    reference_whisper()
    from whisper.tokenizer import get_tokenizer as ref_get_tokenizer

    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    ours = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    ref = ref_get_tokenizer(True, num_languages=99, language="en",
                            task="transcribe")

    texts = [
        "Hello, world! This is a test.",
        "商品とサービス 中文分词 테스트",
        "mixed 商品 and English 🙂 with emoji 🎉🎶",
        " punctuation , . ! ? ... and -- dashes",
        "don't it's we're (parens) [brackets]",
    ]
    samples = [ours.encode(t) for t in texts]
    # raw byte-level token ids that cut through multibyte codepoints
    rng = __import__("random").Random(7)
    samples += [[rng.randrange(200, 50000) for _ in range(40)] for _ in range(5)]
    # with specials/timestamps interleaved
    samples += [[ours.sot, *ours.encode("hi 世界"), ours.timestamp_begin + 12,
                 *ours.encode(" there"), ours.eot]]

    for ids in samples:
        assert ours.split_tokens_on_unicode(list(ids)) == tuple(
            ref.split_tokens_on_unicode(list(ids))
        ) or list(ours.split_tokens_on_unicode(list(ids))) == list(
            ref.split_tokens_on_unicode(list(ids))
        )
        a = ours.split_tokens_on_spaces(list(ids))
        b = ref.split_tokens_on_spaces(list(ids))
        assert list(a[0]) == list(b[0])
        assert [list(g) for g in a[1]] == [list(g) for g in b[1]]

"""Data-layer tests: fallback chain, views, synthetic determinism."""

import numpy as np

from qasr_ijcnlp_tpu.data import (
    CharASRView,
    CharVocabulary,
    ClassificationView,
    SPEECH_COMMANDS_LABELS,
    SyntheticLibriSpeech,
    SyntheticSpeechCommands,
    TokenASRView,
    load_librispeech,
    load_speech_commands,
)


def test_offline_fallback_is_flagged():
    ds = load_librispeech("validation", max_samples=4, verbose=False)
    assert ds.is_synthetic is True  # no network in this container
    sc = load_speech_commands("test", max_samples=4, verbose=False)
    assert sc.is_synthetic is True


def test_synthetic_determinism():
    a1, t1 = SyntheticLibriSpeech("train", 4)[2]
    a2, t2 = SyntheticLibriSpeech("train", 4)[2]
    np.testing.assert_array_equal(a1, a2)
    assert t1 == t2
    # splits draw from disjoint utterance banks
    a3, _ = SyntheticLibriSpeech("validation", 4)[2]
    assert not np.array_equal(a1, a3)


def test_speech_commands_labels():
    assert len(SPEECH_COMMANDS_LABELS) == 35
    ds = SyntheticSpeechCommands("train", 8)
    labels = {ds[i][1] for i in range(8)}
    assert labels <= set(range(35))


def test_char_view_shapes():
    base = SyntheticLibriSpeech("train", 3)
    vocab = CharVocabulary.build([base[i][1] for i in range(3)])
    view = CharASRView(base, vocab, max_text_len=32)
    mel, ids = view[0]
    assert mel.shape == (80, 3000)
    assert ids.shape == (32,) and ids[0] == 2  # <START>
    assert vocab.decode(ids) == base[0][1].lower()[:30]


def test_token_view_padding():
    from qasr_ijcnlp_tpu.tokenizer import get_tokenizer

    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    base = SyntheticLibriSpeech("train", 2)
    view = TokenASRView(base, tok, max_tokens=64)
    mel, ids = view[0]
    assert mel.shape == (80, 3000) and ids.shape == (64,)
    assert ids[0] == tok.sot and ids[1] == tok.no_timestamps
    assert (ids == -100).sum() > 0  # padded
    assert tok.eot in ids.tolist()


def test_classification_view():
    base = SyntheticSpeechCommands("train", 2)
    view = ClassificationView(base)
    mel, label = view[0]
    assert mel.shape == (80, 3000)
    assert 0 <= int(label) < 35

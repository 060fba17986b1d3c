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


def test_pad_batch_to_fill_values():
    from qasr_ijcnlp_tpu.data.loader import pad_batch_to

    mel = np.ones((3, 4), np.float32)
    labels = np.array([[5, 6], [7, 8], [9, 10]], np.int32)
    (pmel, plab), real = pad_batch_to((mel, labels), 5, (None, -100))
    assert real == 3
    assert pmel.shape == (5, 4) and plab.shape == (5, 2)
    # inputs repeat the last row (shape filler), labels take the ignore value
    np.testing.assert_array_equal(pmel[3:], np.ones((2, 4), np.float32))
    assert (plab[3:] == -100).all()
    np.testing.assert_array_equal(plab[:3], labels)


def test_prefetch_propagates_producer_errors():
    from qasr_ijcnlp_tpu.data.loader import prefetch_to_device

    def boom():
        yield np.zeros(2)
        raise RuntimeError("mid-epoch data error")

    it = prefetch_to_device(boom())
    next(it)
    try:
        next(it)
    except RuntimeError as e:
        assert "mid-epoch" in str(e)
    else:
        raise AssertionError("producer exception was swallowed")


def test_prefetch_abandoned_early_releases_producer():
    """Breaking out of a prefetch loop mid-epoch (train step raised) must
    stop the producer thread instead of leaving it blocked on a full queue
    with staged device buffers pinned (regression)."""
    import itertools
    import time

    from qasr_ijcnlp_tpu.data.loader import prefetch_to_device

    produced = []

    def src():
        for i in itertools.count():
            produced.append(i)
            yield (np.zeros(2, np.float32),)

    gen = prefetch_to_device(src())
    next(gen)
    gen.close()  # abandon mid-epoch -> finally sets stop + drains
    n_at_close = len(produced)
    time.sleep(0.6)  # producer polls stop every 0.1 s
    assert len(produced) <= n_at_close + 2


def test_dataset_texts_prefers_text_accessor():
    from qasr_ijcnlp_tpu.data import dataset_texts

    class WithAccessor:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            raise AssertionError("must not decode audio for text-only access")

        def text(self, i):
            return f"t{i}"

    assert dataset_texts(WithAccessor()) == ["t0", "t1", "t2"]
    assert dataset_texts(WithAccessor(), 2) == ["t0", "t1"]

    class Plain:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return (None, f"p{i}")

    assert dataset_texts(Plain()) == ["p0", "p1"]

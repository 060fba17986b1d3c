"""Metrics + normalizer tests: parity vs the reference implementation.

The English normalizer must agree string-for-string with the reference
(whisper/normalizers/english.py) since WER parity depends on it; the
Levenshtein core is fuzzed against a naive full-matrix DP.
"""

import random
import sys

import numpy as np
import pytest

from qasr_ijcnlp_tpu.metrics import (
    BasicTextNormalizer,
    EnglishTextNormalizer,
    calculate_cer,
    calculate_cer_pure,
    calculate_wer,
    levenshtein,
)


def _naive_levenshtein(a, b):
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
            )
    return d[n][m]


def test_levenshtein_fuzz():
    rnd = random.Random(0)
    for _ in range(200):
        a = "".join(rnd.choice("abcd") for _ in range(rnd.randrange(0, 12)))
        b = "".join(rnd.choice("abcd") for _ in range(rnd.randrange(0, 12)))
        assert levenshtein(a, b) == _naive_levenshtein(a, b), (a, b)


def test_levenshtein_words():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein([], ["a"]) == 1
    assert levenshtein("abc", "abc") == 0


def test_cer_wer_basic():
    preds = ["hello world", "a b c"]
    tgts = ["hello word", "a b c"]
    assert calculate_cer(preds, tgts) == pytest.approx(
        np.mean([1 / len("hello word"), 0.0])
    )
    assert calculate_wer(preds, tgts) == pytest.approx(1 / 5)
    assert calculate_cer_pure(preds, tgts) == pytest.approx(1 / 15)


# ---------------------------------------------------------------------------
# Normalizer parity vs reference
# ---------------------------------------------------------------------------

from tests.oracle import install_stubs, _REF_WHISPER_PATH

install_stubs()
sys.path.insert(0, _REF_WHISPER_PATH)

try:
    from whisper.normalizers import (
        BasicTextNormalizer as RefBasic,
        EnglishTextNormalizer as RefEnglish,
    )

    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

CASES = [
    "Let's go to the market, shan't we?",
    "Mr. Brown paid $20 million for the house on 5th Avenue.",
    "she was born in nineteen eighty four",
    "one hundred and twenty three thousand four hundred and fifty six",
    "double oh seven called at half past two",
    "three point one four one five nine",
    "I owe you twenty five dollars and seven cents",
    "the nineteen sixties were wild, the seventies less so",
    "he came twenty first out of one hundred",
    "minus forty degrees is the same in fahrenheit",
    "two and a half hours, three and a half days",
    "seventy-five per cent of voters agreed",
    "a hundred thousand and one nights",
    "I'd been there; she's gone; they'll've seen it",
    "Dr. Smith and Mrs. Jones met Prof. Lee",
    "it cost £3 and ¢50 plus €9",
    "the temperature was seventy two point five degrees",
    "ONE ONES one ones",
    "call me at five five five one two three four",
    "the colour of the aluminium armour",
    "uh well hmm I um think mm so",
    "[noise] (laughter) <unk> hello there",
    "10,000 people showed up on the 3rd of May",
    "one oh one dalmatians",
    "triple seven airlines flight seven forty seven",
    "zero point zero zero one percent",
    "a million billion trillion",
    "first second third fourth fifth twelfth twentieth",
    "sixes and sevens, twenties and thirties",
    "nineteen-eighty-four was written in nineteen forty eight",
    "café naïve résumé Zürich øre Æsir ßeta",
    "he's got $5, she'd gone home, it's 3 o'clock",
    "point five percent of one percent",
    "one two three four five six seven eight nine ten",
    "plus four minus three equals plus one",
    "'twas the night before christmas",
    "the 1960s, the 70s, the '80s",
    "42nd street and 5th avenue",
    "one hundred percent",
    "seven hundred and seventy seven",
    # digit-zero accumulator followed by point/zero/double/triple: the
    # reference's str(value or "") DROPS an integer-zero accumulator
    "0 point 5",
    "0 zero",
    "0 double five",
    "0 triple two",
    "ten 0 and 0 0 7",
]


@pytest.mark.skipif(not HAVE_REF, reason="reference normalizers unavailable")
@pytest.mark.parametrize("text", CASES)
def test_english_normalizer_parity(text):
    assert EnglishTextNormalizer()(text) == RefEnglish()(text)


@pytest.mark.skipif(not HAVE_REF, reason="reference normalizers unavailable")
def test_english_normalizer_fuzz_parity():
    words = (
        "one two three twenty thirty hundred thousand million point oh zero "
        "and a half dollars cents pounds percent per cent minus plus first "
        "third fifth dozen cat dog the of randomword 7 13 2.5 $3 fifty "
        "double triple ones sixties seventieth 0"
    ).split()
    ours, ref = EnglishTextNormalizer(), RefEnglish()
    rnd = random.Random(1)
    for _ in range(150):
        s = " ".join(rnd.choice(words) for _ in range(rnd.randrange(1, 12)))
        assert ours(s) == ref(s), s


@pytest.mark.skipif(not HAVE_REF, reason="reference normalizers unavailable")
@pytest.mark.parametrize("remove_diacritics", [False, True])
def test_basic_normalizer_parity(remove_diacritics):
    cases = [
        "Héllo, wörld! (aside) [noise] <tag> œuvre Æsir ß",
        "ça va? ¡hola! 日本語 teXT with   spaces",
        "a—b–c…d's éclair",
    ]
    ours = BasicTextNormalizer(remove_diacritics=remove_diacritics)
    ref = RefBasic(remove_diacritics=remove_diacritics)
    for s in cases:
        assert ours(s) == ref(s), s

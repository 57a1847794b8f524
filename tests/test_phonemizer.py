"""Phonemizer unit tests (the reference ships none — SURVEY.md §4)."""

import pytest

from tts_tpu.text.phoneme_data import (
    HUNDRED_PHONEME, NUMBER_PHONEMES, POINT_PHONEME, THOUSAND_PHONEME,
)
from tts_tpu.text.phonemizer import (
    Conditions, Corpus, PhonemeDictionary, Phonemizer, WordPhonemizer,
    build_number_phoneme, build_subthousand_phoneme, replace_accents,
)
from tts_tpu.text.tokenizers import SinglePassTokenizer


def make_phonemizer():
    d = PhonemeDictionary()
    d.add("hello", "həlˈoʊ")
    d.add("world", "wˈɜːld")
    d.add("the", "ðə")
    d.add("cat", "kˈæt")
    d.add("dog", "dˈɑːɡ")
    d.add("read", "ɹˈiːd")
    tok = SinglePassTokenizer(["a", "b", "c", "d", "e", "f", "g", "h", "i", "j",
                               "k", "l", "m", "n", "o", "p", "q", "r", "s", "t",
                               "u", "v", "w", "x", "y", "z"])
    wp = WordPhonemizer(tok)
    for ch in "abcdefghijklmnopqrstuvwxyz":
        wp.add_rule([ch], ch.upper())  # fake rules: letter -> uppercase marker
    return Phonemizer(d, wp)


def test_dictionary_words():
    ph = make_phonemizer()
    assert ph.text_to_phonemes("hello world") == "həlˈoʊ wˈɜːld"


def test_punctuation_preserved():
    ph = make_phonemizer()
    assert ph.text_to_phonemes("hello, world!") == "həlˈoʊ, wˈɜːld!"


def test_phonetic_fallback_uses_rules():
    ph = make_phonemizer()
    # 'zyzzyva' not in dictionary -> trained rules (uppercase markers)
    out = ph.text_to_phonemes("zyzzyva")
    assert out == "ZYZZYVA"


def test_number_small():
    assert build_subthousand_phoneme(7) == NUMBER_PHONEMES[7]
    assert build_subthousand_phoneme(15) == NUMBER_PHONEMES[15]
    assert build_subthousand_phoneme(42) == "fˈɔːɹɾi tˈuː"
    assert build_subthousand_phoneme(100) == NUMBER_PHONEMES[1] + " " + HUNDRED_PHONEME


def test_number_large():
    out = build_number_phoneme(1234)
    assert THOUSAND_PHONEME in out
    assert out == f"{NUMBER_PHONEMES[1]} {THOUSAND_PHONEME}, tˈuː {HUNDRED_PHONEME} θˈɜːɾi fˈɔːɹ"


def test_numeric_in_text():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("the cat 42")
    assert out == f"ðə kˈæt fˈɔːɹɾi tˈuː"


def test_numeric_decimal():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("3.14")
    assert out == f"{NUMBER_PHONEMES[3]} {POINT_PHONEME} {NUMBER_PHONEMES[1]} {NUMBER_PHONEMES[4]}"


def test_numeric_thousands_separator():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("32,000")
    assert THOUSAND_PHONEME in out
    assert "θˈɜːɾi tˈuː" in out


def test_acronym_spelled():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("the HTML")
    # spelled letter-by-letter
    assert "ˈeɪtʃ" in out and "tˈiː" in out and "ˈɛm" in out and "ˈɛl" in out


def test_dotted_acronym():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("U.S.")
    assert "jˈuː" in out and "ˈɛs" in out


def test_all_caps_sentence_not_acronym():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("HELLO WORLD")
    # dictionary hits still apply (lookup is exact-case here -> phonetic),
    # but they must not be letter-spelled
    assert "ˈeɪtʃ" not in out


def test_roman_numeral():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("chapter XIV")
    assert "fˈɔːɹtiːn" in out


def test_possessive():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("dog's")
    # consonant (non-vowel, non-sibilant) ending -> "s" per the rule table
    assert out == "dˈɑːɡs"


def test_possessive_after_vowel_and_sibilant():
    ph = make_phonemizer()
    d = ph.dict
    d.add("tree", "tɹˈiː")
    d.add("boss", "bˈɑːs")
    assert ph.text_to_phonemes("tree's").endswith("z")
    assert ph.text_to_phonemes("boss's").endswith("ᵻz")


def test_contraction():
    ph = make_phonemizer()
    d = ph.dict
    d.add("they", "ðˈeɪ")
    out = ph.text_to_phonemes("they're")
    assert out == "ðˈeɪr"


def test_symbol_replacement():
    ph = make_phonemizer()
    out = ph.text_to_phonemes("cat + dog")
    assert "plˈʌs" in out


def test_hyphenated_no_space():
    ph = make_phonemizer()
    ph.dict.add("twenty", "twˈɛnti")
    ph.dict.add("one", "wˈʌn")
    out = ph.text_to_phonemes("twenty-one")
    assert out == "twˈɛntiwˈʌn"


def test_accents_folded():
    assert replace_accents("café") == "cafe"
    assert replace_accents("naïve") == "naive"


def test_corpus_cursor():
    c = Corpus("ab cd")
    assert c.next() == "a"
    assert c.next(2) == "ab"
    assert c.pop(2) == "ab"
    assert c.last() == "b"
    assert c.after(1) == "c"
    run = c.pop_in(" ")
    assert run == " "
    assert c.pop(2) == "cd"
    assert c.next() == ""


def test_dictionary_partial_match():
    d = PhonemeDictionary()
    d.add("dr", "dˈɑːktɚ:.")
    ph = Phonemizer(d, make_phonemizer().word_phonemizer)
    out = ph.text_to_phonemes("dr. who")
    assert "dˈɑːktɚ" in out


def test_empty_and_whitespace():
    ph = make_phonemizer()
    assert ph.text_to_phonemes("") == ""
    assert ph.text_to_phonemes("   ").strip() == ""


def test_fuzz_never_crashes():
    """The lexer must terminate and return a string for arbitrary input."""
    import random
    rng = random.Random(0)
    ph = make_phonemizer()
    alphabet = ("abc XYZ 0123456789 .,!?;:'\"-()[]{} $%&*+<>= \t\n"
                "éüñ 🎉 ʃʒθð ... -- '' ½¾ MCMXCIV I.B.M. o'clock 1,234.56")
    for _ in range(200):
        n = rng.randint(0, 40)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        out = ph.text_to_phonemes(s)
        assert isinstance(out, str)


def test_pathological_numbers():
    ph = make_phonemizer()
    for s in ["1" * 50, "1,2,3,4", "1.2.3.4", "12 34 56", "0.0.0", "999,999,999,999,999",
              "1,000,000,000,000,001", "3.", ".3", "-5", "1-2", "100 200"]:
        out = ph.text_to_phonemes(s)
        assert isinstance(out, str), s

"""Phonemizer trainer tests: rule induction from a synthetic lexicon."""

import json

import pytest

from tts_tpu.convert.phonemizer_trainer import PhonemizerTrainer, align_word

# a small consistent toy language: one default mapping per letter, a
# contextual rule (a before t -> ɑ), and one irregular word
LEXICON = {
    "bat": "bɑt",
    "cat": "kɑt",
    "tab": "tæb",
    "cab": "kæb",
    "act": "ækt",
    "taca": "tækæ",
    "batata": "bɑtætæ",
    "cta": "ktæ",
    "abc": "æbk",
    "tact": "tækt",   # irregular: a->æ despite following t
}


def test_align_word_basic():
    chunks = align_word(list("cat"), "kɑt", lambda g, c: 1.0 if len(c) == 1 else 0.0)
    assert chunks == ["k", "ɑ", "t"]


def test_trainer_reproduces_lexicon():
    tr = PhonemizerTrainer()
    stats = tr.train(LEXICON)
    assert stats["covered"] == stats["words"] == len(LEXICON)
    ph = tr.build_phonemizer()
    for word, ipa in LEXICON.items():
        assert ph.text_to_phonemes(word) == ipa, word


def test_trainer_generalizes():
    tr = PhonemizerTrainer()
    tr.train(LEXICON)
    wp = tr.build_word_phonemizer()
    # unseen word follows the learned rules: b->b, a(before t)->ɑ?, t->t ...
    out = wp.phonemize("bab")
    assert out == "bæb"


def test_export_and_reload_gguf(tmp_path):
    from tts_tpu.core.gguf import GGUFFile
    from tts_tpu.text.phonemizer import Phonemizer

    tr = PhonemizerTrainer()
    tr.train(LEXICON)
    path = tmp_path / "ph.gguf"
    tr.export_gguf(str(path))
    with GGUFFile(str(path)) as f:
        ph = Phonemizer.from_gguf_kv(f.kv)
    for word, ipa in LEXICON.items():
        assert ph.text_to_phonemes(word) == ipa, word


def test_cli(tmp_path, capsys):
    from tts_tpu.convert.phonemizer_trainer import main
    lex = tmp_path / "lex.json"
    lex.write_text(json.dumps(LEXICON))
    out = tmp_path / "out.gguf"
    main(["--lexicon", str(lex), "--out", str(out)])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["covered"] == stats["words"]
    assert out.exists()

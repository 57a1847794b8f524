"""Tokenizer unit tests (the reference ships none — SURVEY.md §4)."""

from tts_tpu.text.tokenizers import BPETokenizer, SinglePassTokenizer, UnigramTokenizer


def make_unigram():
    # scores are log-probs; longer tokens score better than char chains
    vocab = {
        " ": 0, "h": 1, "e": 2, "l": 3, "o": 4, " hello": 5, " world": 6,
        "w": 7, "r": 8, "d": 9, "<unk>": 10,
    }
    scores = [-4, -5, -5, -5, -5, -1, -1, -5, -5, -5, -20]
    return UnigramTokenizer(vocab, unk_token=10, scores=scores)


def test_unigram_prefers_long_tokens():
    tk = make_unigram()
    assert tk.tokenize("hello world") == [5, 6]


def test_unigram_dedupes_spaces():
    tk = make_unigram()
    assert tk.tokenize("hello   world") == [5, 6]


def test_unigram_unknown_merge():
    tk = make_unigram()
    # unknown chars collapse into a single unk id between known tokens
    toks = tk.tokenize("hello ZZZ world")
    assert toks[0] == 5
    assert toks.count(10) == 1
    assert toks[-1] == 6


def test_unigram_utf8_unknown_step():
    tk = make_unigram()
    toks = tk.tokenize("héllo")  # é is unknown, two bytes, one unk token
    assert 10 in toks


def test_single_pass_char_level():
    tk = SinglePassTokenizer(["$", "a", "b", "c", "ʰ"])
    assert tk.tokenize("abcʰ") == [1, 2, 3, 4]
    # unknown char -> unknown_id (0), one per skipped byte
    assert tk.tokenize("axb") == [1, 0, 2]


def test_single_pass_shortest_match_first():
    # tokenize() is shortest-match-first (parity: tokenizer.cpp:159-177)
    tk = SinglePassTokenizer(["x", "a", "ab"])
    assert tk.tokenize("ab") == [1, 0]  # 'a' then 'b'->unknown(0)


def test_token_split_longest_match():
    tk = SinglePassTokenizer(["a", "ab", "abc", "d"])
    assert tk.token_split("abcd") == ["abc", "d"]
    assert tk.token_split("abq") == ["ab", "q"]  # unknown char passes through


def test_bpe_basic():
    vocab = {"l": 0, "o": 1, "w": 2, "e": 3, "r": 4, "lo": 5, "low": 6,
             "Ġ": 7, "Ġl": 8, "Ġlow": 9, "er": 10, "Ġlower": 11}
    merges = {("l", "o"): 0, ("lo", "w"): 1, ("Ġ", "l"): 2, ("Ġl", "ow"): 3,
              ("e", "r"): 4, ("Ġlow", "er"): 5}
    tk = BPETokenizer(vocab, merges, bos_token_id=100, eos_token_id=101)
    assert tk.tokenize("low lower") == [6, 11]


def test_bpe_space_marker():
    vocab = {"a": 0, "b": 1, "Ġ": 2, "Ġb": 3}
    merges = {("Ġ", "b"): 0}
    tk = BPETokenizer(vocab, merges, 0, 1)
    assert tk.tokenize("a b") == [0, 3]
    # leading word gets no space marker; double space collapses
    assert tk.tokenize("a  b") == [0, 3]


def test_bpe_direct_vocab_hit():
    tk = BPETokenizer({"hello": 7}, {}, 0, 1)
    assert tk.tokenize("hello") == [7]


def test_from_gguf_kv_roundtrip():
    kv = {
        "tokenizer.ggml.tokens": ["<unk>", "▁a", "b"],
        "tokenizer.ggml.scores": [-10.0, -1.0, -2.0],
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.eos_token_id": 2,
    }
    tk = UnigramTokenizer.from_gguf_kv(kv)
    assert tk.eos_token == 2
    assert " a" in tk.vocab  # ▁ replaced with space like py-gguf does

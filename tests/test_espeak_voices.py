"""parse_voice_code fuzzy matching against a mocked espeak voice inventory
(parity: /root/reference/src/models/kokoro/phonemizer.cpp:163-248)."""

import pytest

from tts_tpu.runtime.api import TTSError
from tts_tpu.text.espeak import parse_voice_code

# (name, identifier) rows shaped like real espeak-ng data: identifiers are
# "family/lang[-LOCALE]", country codes capitalized, names human-readable.
INVENTORY = [
    ("English (Great Britain)", "gmw/en-GB"),
    ("English (America)", "gmw/en-US"),
    ("English", "gmw/en"),
    ("French (France)", "roa/fr"),
    ("Portuguese (Brazil)", "roa/pt-BR"),
    ("Portuguese (Portugal)", "roa/pt"),
    ("Chinese (Mandarin)", "sit/cmn"),
    ("Chinese (Cantonese)", "sit/yue"),
    ("Hindi", "inc/hi"),
    ("Quechua", "qu"),  # identifier without a family part
]


def test_language_code_exact():
    assert parse_voice_code("en", INVENTORY) == "gmw/en"


def test_language_code_prefers_shorter_identifier():
    # "pt" prefix-matches pt-BR and pt; the more generic (shorter) wins
    assert parse_voice_code("pt", INVENTORY) == "roa/pt"


def test_language_code_country_secondary():
    # no language starts with "us", but en-US's country part matches
    assert parse_voice_code("us", INVENTORY) == "gmw/en-US"


def test_family_code_primary_is_language_prefix():
    # 3-letter codes try ISO 639-3 language codes first...
    assert parse_voice_code("yue", INVENTORY) == "sit/yue"


def test_family_code_secondary_is_family():
    # ...then fall back to the language-family part
    assert parse_voice_code("inc", INVENTORY) == "inc/hi"


def test_identifier_prefix():
    assert parse_voice_code("gmw/en-us", INVENTORY) == "gmw/en-US"


def test_locale_code_underscore_normalized():
    assert parse_voice_code("en_gb", INVENTORY) == "gmw/en-GB"
    assert parse_voice_code("en-gb", INVENTORY) == "gmw/en-GB"


def test_name_substring_fallback():
    assert parse_voice_code("cantonese", INVENTORY) == "sit/yue"


def test_single_part_identifier():
    # NOTE(parity): the reference would read identifier_parts[1] out of
    # bounds here; we match and move on (intent, not the bug)
    assert parse_voice_code("qu", INVENTORY) == "qu"


def test_no_match_raises():
    with pytest.raises(TTSError):
        parse_voice_code("xx-nope", INVENTORY)


# ---------------------------------------------------------------------------
# ctypes phonemize loop (mocked library) + live-library smoke
# ---------------------------------------------------------------------------

class _FakeEspeakLib:
    """Minimal espeak-ng surface for espeak_text_to_phonemes."""

    def __init__(self, advance=True, phonemes=b"h@loU"):
        self.advance = advance
        self.phonemes = phonemes

    def espeak_Initialize(self, *a):
        return 22050

    def espeak_SetVoiceByName(self, v):
        return 0

    def espeak_TextToPhonemes(self, ptr, chars, mode):
        if self.advance:
            ptr.contents.value = None      # consumed the whole clause
            return self.phonemes
        return None                        # stuck: no progress, no output


def _patch_lib(monkeypatch, lib):
    from tts_tpu.text import espeak
    monkeypatch.setattr(espeak, "_lib", lib)
    monkeypatch.setattr(espeak, "_initialized", False)


def test_text_to_phonemes_mocked_loop(monkeypatch):
    from tts_tpu.text.espeak import espeak_text_to_phonemes
    _patch_lib(monkeypatch, _FakeEspeakLib())
    out = espeak_text_to_phonemes("hello. world.", voice="gmw/en-US")
    # punctuation espeak drops is reinserted between clause outputs
    assert out == "h@loU.h@loU."


def test_text_to_phonemes_stuck_cursor_raises(monkeypatch):
    """A library failure that stops advancing the clause cursor must raise,
    not spin forever (VERDICT r3 item 7)."""
    from tts_tpu.text.espeak import espeak_text_to_phonemes
    _patch_lib(monkeypatch, _FakeEspeakLib(advance=False))
    with pytest.raises(TTSError, match="no progress"):
        espeak_text_to_phonemes("hello", voice="gmw/en-US")


def test_espeak_live_smoke():
    """End-to-end against a REAL libespeak-ng; auto-skips where the library
    is absent so a future environment exercises the live path with zero new
    work (VERDICT r3 item 7)."""
    from tts_tpu.text import espeak
    if not espeak.available():
        pytest.skip("libespeak-ng not installed")
    out = espeak.espeak_text_to_phonemes("Hello world.", voice="gmw/en-US")
    assert out.strip(), "live espeak returned no phonemes"
    assert out.rstrip().endswith(".")
    voices = espeak.list_voice_inventory()
    assert voices, "live espeak voice inventory is empty"
    assert espeak.parse_voice_code("en", voices)

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

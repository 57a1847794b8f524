"""Optional espeak-ng binding via ctypes (the reference's ESPEAK_INSTALL path,
/root/reference/src/models/kokoro/phonemizer.cpp:3-46, 992-1021).

espeak-ng keeps global state, so all calls are serialized behind a module
lock — the Python analog of the reference's espeak_wrapper mutex singleton
(phonemizer.h:293-323).  If the shared library is absent we raise a
recoverable TTSError instead of aborting.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import threading

from tts_tpu.runtime.api import TTSError
from tts_tpu.text.phoneme_data import STOPPING_TOKENS

_lock = threading.Lock()
_lib = None
_initialized = False

ESPEAK_CHARS_UTF8 = 1
AUDIO_OUTPUT_SYNCHRONOUS = 2


def _load():
    global _lib
    if _lib is not None:
        return _lib
    for name in ("espeak-ng", "espeak"):
        path = ctypes.util.find_library(name)
        if path:
            _lib = ctypes.CDLL(path)
            _lib.espeak_TextToPhonemes.restype = ctypes.c_char_p
            _lib.espeak_TextToPhonemes.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int, ctypes.c_int]
            return _lib
    raise TTSError(
        "espeak-ng is not installed; use the built-in TTS phonemizer "
        "(phonemizer.type=0) or install libespeak-ng")


def available() -> bool:
    try:
        _load()
        return True
    except TTSError:
        return False


def _ensure_init(voice: str):
    global _initialized
    lib = _load()
    if not _initialized:
        lib.espeak_Initialize(AUDIO_OUTPUT_SYNCHRONOUS, 0, None, 0)
        _initialized = True
    lib.espeak_SetVoiceByName(voice.encode())


def espeak_text_to_phonemes(text: str, voice: str = "gmw/en-US",
                            preserve_punctuation: bool = True,
                            ipa: bool = True) -> str:
    """Phonemize clause-by-clause, reinserting the punctuation espeak drops
    (parity: phonemizer.cpp:1001-1013)."""
    import re

    with _lock:
        _ensure_init(voice)
        lib = _load()
        mode = 0x02 if ipa else 0x01
        parts = re.split(f"([{re.escape(STOPPING_TOKENS)}])", text)
        phonemes = []
        for i in range(0, len(parts), 2):
            chunk = parts[i]
            if chunk:
                buf = ctypes.c_char_p(chunk.encode("utf-8"))
                ptr = ctypes.cast(ctypes.pointer(buf), ctypes.POINTER(ctypes.c_void_p))
                out = []
                while ptr.contents.value:
                    resp = lib.espeak_TextToPhonemes(ptr, ESPEAK_CHARS_UTF8, mode)
                    if resp:
                        out.append(resp.decode("utf-8"))
                phonemes.append(" ".join(out).strip())
            if preserve_punctuation and i + 1 < len(parts):
                phonemes.append(parts[i + 1])
        return "".join(phonemes)

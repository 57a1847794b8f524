"""In-process SDL2 playback binding, exercised against a fake SDL library
(the image has no libSDL2 — the ctypes call sequence is what's under test;
parity: examples/cli/playback.cpp:18-62)."""

import ctypes

import numpy as np

from tts_tpu.runtime import playback


class FakeSDL:
    """Records the SDL call sequence the reference playback makes."""

    def __init__(self, fail_open=False):
        self.calls = []
        self.fail_open = fail_open
        self.queued = 0
        self._drain_polls = 2

    def SDL_Init(self, flags):
        self.calls.append(("init", flags))
        return 0

    def SDL_OpenAudioDevice(self, name, capture, spec, obtained, changes):
        self.calls.append(("open",))
        live = ctypes.cast(spec, ctypes.POINTER(playback.SDL_AudioSpec)).contents
        # copy now: the spec is stack-local to play() and dies with it
        self.spec = {"freq": live.freq, "channels": live.channels,
                     "format": live.format}
        return 0 if self.fail_open else 7

    def SDL_PauseAudioDevice(self, dev, pause):
        self.calls.append(("pause", dev.value, pause))

    def SDL_QueueAudio(self, dev, data, nbytes):
        self.calls.append(("queue", nbytes.value))
        self.queued = nbytes.value
        return 0

    def SDL_GetQueuedAudioSize(self, dev):
        if self._drain_polls > 0:
            self._drain_polls -= 1
            return self.queued
        return 0

    def SDL_Delay(self, ms):
        self.calls.append(("delay", ms))

    def SDL_CloseAudioDevice(self, dev):
        self.calls.append(("close", dev.value))

    def SDL_Quit(self):
        self.calls.append(("quit",))


def _with_fake(monkeypatch, fake):
    monkeypatch.setattr(playback, "_lib", fake)


def test_play_queues_and_drains(monkeypatch):
    fake = FakeSDL()
    _with_fake(monkeypatch, fake)
    audio = np.linspace(-1, 1, 480).astype(np.float32)
    assert playback.play(audio, 24000, poll_ms=1) is True
    kinds = [c[0] for c in fake.calls]
    assert kinds[:3] == ["init", "open", "pause"]
    assert ("queue", audio.nbytes) in fake.calls
    assert kinds[-2:] == ["close", "quit"]       # drained then closed
    assert fake.spec == {"freq": 24000, "channels": 1,
                         "format": playback.AUDIO_F32}


def test_play_fails_open_when_no_device(monkeypatch):
    fake = FakeSDL(fail_open=True)
    _with_fake(monkeypatch, fake)
    assert playback.play(np.zeros(8, np.float32), 24000) is False
    assert ("quit",) in fake.calls               # SDL_Quit still runs


def test_play_unavailable_without_lib(monkeypatch):
    monkeypatch.setattr(playback, "_lib", False)
    assert playback.available() is False
    assert playback.play(np.zeros(8, np.float32), 24000) is False

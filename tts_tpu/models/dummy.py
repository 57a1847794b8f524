"""Weight-free test runner: one second of 440Hz sine per input character.

Parity: /root/reference/src/models/dummy/model.cpp:6-19 — exists so the CLI
and server can be exercised end-to-end without model weights."""

from __future__ import annotations

import numpy as np

from tts_tpu.models.registry import register_loader
from tts_tpu.runtime.api import GenerationConfig, TTSResponse, TTSRunner


class DummyRunner(TTSRunner):
    sample_rate = 44100
    architecture = "dummy"

    def generate(self, text: str, config: GenerationConfig | None = None) -> TTSResponse:
        n = max(len(text), 0)
        t = np.arange(n * self.sample_rate, dtype=np.float32) / self.sample_rate
        audio = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        return TTSResponse(audio=audio, sample_rate=self.sample_rate)

    def list_voices(self):
        return ["dummy"]


@register_loader("dummy", is_test=True)
def _load_dummy(config: GenerationConfig) -> DummyRunner:
    return DummyRunner()

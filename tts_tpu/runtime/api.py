"""Public runner API.

Mirrors the reference's `generation_configuration` / `tts_response` /
`tts_runner` surface (/root/reference/include/common.h:13-101) so users of
TTS.cpp find the same concepts, but with recoverable errors instead of
abort() (SURVEY.md §5 "Failure detection") and numpy audio out.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class GenerationConfig:
    """Per-call sampling / voice configuration.

    Field-for-field parity with `generation_configuration`
    (/root/reference/include/common.h:45-66).
    """

    temperature: float = 1.0
    repetition_penalty: float = 1.0
    top_k: int = 0                  # 0 = disabled
    top_p: float = 1.0              # 1.0 = disabled
    max_tokens: int = 0             # 0 = model default cap
    voice: str = ""
    espeak_voice_id: str = ""
    use_cross_attn: bool = True
    sample: bool = True             # False = greedy argmax
    seed: int | None = None


@dataclass
class TTSResponse:
    """Generated audio (float32 PCM in [-1, 1]) + metadata."""

    audio: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    sample_rate: int = 44100
    # per-stage wall times in ms, filled by runners (SURVEY.md §5 tracing plan)
    timings: dict = field(default_factory=dict)

    @property
    def duration_s(self) -> float:
        return float(len(self.audio)) / float(self.sample_rate)


class TTSError(RuntimeError):
    """Recoverable user-facing error (bad voice, prompt too long, ...).

    The reference aborts the process in these cases
    (/root/reference/src/util.cpp:14-22); we raise instead.
    """


class TTSRunner:
    """Abstract runner: text in, audio out.

    Concrete runners (kokoro, parler, dia, orpheus, dummy) implement
    `generate`.  Parity surface: tts_runner / tts_generation_runner
    (/root/reference/include/common.h:68-101).
    """

    sample_rate: int = 44100
    architecture: str = "unknown"
    # Device-state declarations for parallel/serving.move_to_device:
    # attribute names holding jax-array pytrees / nested components.
    device_arrays: tuple = ()
    device_components: tuple = ()

    def generate(self, text: str, config: GenerationConfig | None = None) -> TTSResponse:
        raise NotImplementedError

    def list_voices(self) -> list[str]:
        return []

    # -- prompt-bucket pinning (production p99 guard) ----------------------
    # The AR runners (orpheus/parler) pad the prompt to a token bucket; a
    # first unusually long prompt after warmup would otherwise compile a new
    # prefill graph mid-serving — the same tail class KokoroModel's
    # freeze_buckets kills for frame buckets (VERDICT r4 item 4).  Runners
    # route bucket choice through _prompt_bucket; after freeze_buckets()
    # prompts round UP within the warmed set (a few padded tokens of extra
    # prefill compute) and only a prompt longer than every warmed bucket
    # falls back to the full ladder (and records the event).

    def _prompt_bucket(self, n: int, ladder) -> int:
        pinned = getattr(self, "_pinned_pbuckets", None)
        if pinned and n <= pinned[-1]:
            return next(b for b in pinned if n <= b)
        b = next((x for x in ladder if n <= x), ladder[-1])
        events = self.__dict__.setdefault("_bucket_events", [])
        if b not in events:
            events.append(b)
        return b

    def freeze_buckets(self) -> tuple:
        """Pin prompt-bucket selection to the buckets used so far (call after
        warmup).  Returns the pinned set."""
        self._pinned_pbuckets = tuple(
            sorted(set(self.__dict__.get("_bucket_events", []))))
        return self._pinned_pbuckets

    def bucket_events(self) -> list:
        """Prompt buckets first-used by this runner, in order (events after
        freeze_buckets() are post-warmup cold compiles)."""
        return list(self.__dict__.get("_bucket_events", []))

    def update_conditional_prompt(self, text_encoder_path: str, prompt: str) -> None:
        raise TTSError(f"{self.architecture} does not support conditional prompts")

"""Model registry and `runner_from_file` — THE top-level entry point.

Parity surface: /root/reference/src/models/loaders.{h,cpp} — per-architecture
self-registering loaders keyed on GGUF `general.architecture`, plus the
`test:` filename prefix that returns a weight-free fake runner so apps can be
exercised without model files (loaders.cpp:37-44)."""

from __future__ import annotations

from typing import Callable

from tts_tpu.core.gguf import GGUFFile
from tts_tpu.runtime.api import GenerationConfig, TTSError, TTSRunner

_LOADERS: dict[str, Callable] = {}
_TEST_LOADERS: dict[str, Callable] = {}


def register_loader(architecture: str, is_test: bool = False):
    def deco(fn):
        (_TEST_LOADERS if is_test else _LOADERS)[architecture] = fn
        return fn
    return deco


def list_architectures() -> list[str]:
    return sorted(_LOADERS)


def runner_from_file(path: str, config: GenerationConfig | None = None) -> TTSRunner:
    """Load a GGUF model file and return the appropriate runner."""
    import tts_tpu.models.dummy  # noqa: F401  (registers test loaders)
    import tts_tpu.models.kokoro_runner  # noqa: F401
    import tts_tpu.models.parler  # noqa: F401
    import tts_tpu.models.dia  # noqa: F401
    import tts_tpu.models.orpheus  # noqa: F401

    config = config or GenerationConfig()
    if path.startswith("test:"):
        name = path[len("test:"):]
        if name not in _TEST_LOADERS:
            raise TTSError(f"unknown test runner '{name}'")
        return _TEST_LOADERS[name](config)

    f = GGUFFile(path)
    arch = f.architecture
    if arch not in _LOADERS:
        raise TTSError(
            f"architecture '{arch}' is not supported "
            f"(supported: {', '.join(list_architectures())})")
    return _LOADERS[arch](f, config)

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


def runner_from_file(path: str, config: GenerationConfig | None = None,
                     mesh=None) -> TTSRunner:
    """Load a GGUF model file and return the appropriate runner.

    mesh: optional jax Mesh for architectures with a tensor-parallel config
    (currently Orpheus); raises TTSError for loaders without mesh support."""
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
        if mesh is not None:
            raise TTSError("test runners have no tensor-parallel config (mesh=)")
        return _TEST_LOADERS[name](config)

    f = GGUFFile(path)
    arch = f.architecture
    if arch not in _LOADERS:
        raise TTSError(
            f"architecture '{arch}' is not supported "
            f"(supported: {', '.join(list_architectures())})")
    if mesh is not None:
        import inspect
        if "mesh" not in inspect.signature(_LOADERS[arch]).parameters:
            raise TTSError(
                f"architecture '{arch}' has no tensor-parallel config (mesh=)")
        return _LOADERS[arch](f, config, mesh=mesh)
    return _LOADERS[arch](f, config)

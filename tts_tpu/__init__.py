"""tts_tpu — a TPU-native (JAX/XLA/Pallas) text-to-speech framework.

Re-implements the capabilities of TTS.cpp (reference: /root/reference) with a
TPU-first design: pure jitted step functions with static shapes, `lax.scan`
decode loops, on-device sampling, Pallas kernels for the hot ops, and
`jax.sharding.Mesh` + collectives for multi-chip scaling.

Layer map (mirrors SURVEY.md §1, redesigned for TPU):
  core/     GGUF reader/writer, quant block codecs, config plumbing
  text/     tokenizers (unigram / BPE / single-pass) + rule-based phonemizer (host-side)
  ops/      XLA/Pallas compute kernels (stft/istft, convs, snake, lstm scan, attention, sampling)
  codecs/   neural audio codec decoders (DAC, SNAC) as jitted functions
  models/   model families: kokoro, parler (+t5), dia, orpheus, dummy  + registry
  runtime/  runner API: generate(text, config) -> audio; chunking; VAD
  parallel/ device mesh, sharding rules, tensor-parallel layouts
  apps/     cli, server, quantize, perf_battery, phonemize
  convert/  HF checkpoint -> GGUF encoders (the py-gguf equivalent)
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compile cache for every app/runner (first compile of a
    shape bucket costs minutes on TPU; warm runs replay in ms).  Opt out with
    TTS_TPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("TTS_TPU_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_CACHE_DIR",
                            _os.path.expanduser("~/.cache/tts_tpu_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_setup_compilation_cache()

from tts_tpu.runtime.api import GenerationConfig, TTSResponse  # noqa: F401

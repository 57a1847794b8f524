from tts_tpu.runtime.api import GenerationConfig, TTSResponse, TTSRunner  # noqa: F401

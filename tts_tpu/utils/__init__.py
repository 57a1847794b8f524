from tts_tpu.utils.audio import read_wav, write_aiff, write_wav  # noqa: F401

from tts_tpu.core.gguf import GGUFFile, GGUFTensor, GGUFWriter, GGMLType  # noqa: F401

from tts_tpu.text.tokenizers import (  # noqa: F401
    BPETokenizer,
    SinglePassTokenizer,
    UnigramTokenizer,
)

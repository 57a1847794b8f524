from tts_tpu.codecs.dac import DACDecoder  # noqa: F401
from tts_tpu.codecs.snac import SNACDecoder  # noqa: F401

from tts_tpu.ops.basic import (  # noqa: F401
    ada_layer_norm, instance_norm_time, layer_norm, leaky_relu, snake,
)
from tts_tpu.ops.conv import conv1d, conv_transpose1d  # noqa: F401
from tts_tpu.ops.lstm import bilstm, lstm, pack_lstm_params  # noqa: F401
from tts_tpu.ops.stft import hann_window, istft, stft, window_squared_sum  # noqa: F401
from tts_tpu.ops.resample import upsample_linear, upsample_nearest  # noqa: F401

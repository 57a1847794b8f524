"""DAC (Descript Audio Codec) decoder: 9 RVQ codebooks -> 44.1kHz PCM.

Parity: /root/reference/src/decoder/dac_model.{h,cpp} — quantizer embedding
sum, in-conv, 4 upsampling layers (total x512), snake, out-conv, tanh.
One jitted function over a padded frame bucket; the runner slices the valid
samples."""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.codecs.blocks import codec_layer, quantizer_decode, residual_unit
from tts_tpu.ops.basic import snake
from tts_tpu.ops.conv import conv1d

FRAME_BUCKETS = (64, 128, 256, 512, 1024, 2048, 2580, 3072)


def pick_bucket(n, buckets=FRAME_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


@dataclass(frozen=True)
class DACConfig:
    n_layers: int = 4
    n_heads: int = 9
    up_sampling_factor: int = 512
    max_generation_size: int = 2580
    strides: tuple = (8, 8, 4, 2)
    paddings: tuple = (4, 4, 2, 1)

    @staticmethod
    def from_gguf_kv(kv: dict) -> "DACConfig":
        g = lambda k, d: int(kv.get(k, d))
        n_heads = g("parler-tts.decoder.output_heads", g("dia.decoder.output_heads", 9))
        n_layers = 4
        return DACConfig(
            n_layers=n_layers,
            n_heads=n_heads,
            up_sampling_factor=g("dac.up_sampling_factor", g("dac.up_scaling_factor", 512)),
            max_generation_size=g("parler-tts.decoder.max_generation",
                                  g("dia.decoder.max_generation", 2580)),
            strides=tuple(g(f"dac.dac_layer_stride_{i}", s)
                          for i, s in enumerate((8, 8, 4, 2))),
            paddings=tuple(g(f"dac.dac_layer_padding_{i}", p)
                           for i, p in enumerate((4, 4, 2, 1))),
        )


def _unit_params(get, base: str) -> dict:
    return {
        "in_alpha": get(f"{base}.res.initial.alpha").reshape(-1),
        "in_w": get(f"{base}.res.initial.weight"),
        "in_b": get(f"{base}.res.initial.bias"),
        "out_alpha": get(f"{base}.res.final.alpha").reshape(-1),
        "out_w": get(f"{base}.res.final.weight"),
        "out_b": get(f"{base}.res.final.bias"),
    }


def load_dac_params(tensors: dict, cfg: DACConfig, prefix: str = "audio_encoder.") -> dict:
    def get(name, optional=False):
        t = tensors.get(prefix + name)
        if t is None:
            if optional:
                return None
            raise KeyError(f"dac: missing tensor {prefix}{name}")
        return jnp.asarray(np.asarray(t, np.float32))

    p = {
        "in_w": get("initial.weight"), "in_b": get("initial.bias"),
        "out_w": get("final.weight"), "out_b": get("final.bias"),
        "out_alpha": get("final.alpha").reshape(-1),
        "layers": [], "quantizers": [],
    }
    for i in range(1, cfg.n_layers + 1):
        base = f"decoder_block.{i}"
        layer = {
            "in_alpha": get(f"{base}.final.alpha").reshape(-1),
            "in_w": get(f"{base}.final.weight"),
            "in_b": get(f"{base}.final.bias"),
            "units": [_unit_params(get, f"{base}.residual_unit.{j}") for j in range(3)],
        }
        p["layers"].append(layer)
    for i in range(cfg.n_heads):
        w = get(f"quantizers.{i}.out_proj.weight")
        p["quantizers"].append({
            "codebook": get(f"quantizers.{i}.codebook.weight"),
            "out_w": w.reshape(w.shape[0], -1).T,        # conv1x1 -> [D, C]
            "out_b": get(f"quantizers.{i}.out_proj.bias"),
        })
    return p


@partial(jax.jit, static_argnames=("cfg",))
def dac_decode(params, cfg: DACConfig, codes, n_valid):
    """codes [T, H] int32 (zero-padded to a bucket; `n_valid` true frames)
    -> audio [T * up_sampling_factor] float32 (caller slices the valid part).

    Pad-frame latents are zeroed so the tail of the valid audio sees the same
    zero neighborhood an exact-shape run's 'same' convolutions would."""
    mask = (jnp.arange(codes.shape[0]) < n_valid).astype(jnp.float32)[:, None]
    x = quantizer_decode(codes, params["quantizers"])          # [T, C]
    x = x * mask
    x = conv1d(x, params["in_w"], params["in_b"], padding=3)
    for i, layer in enumerate(params["layers"]):
        x = codec_layer(x, layer, stride=cfg.strides[i], padding=cfg.paddings[i])
    x = snake(x, params["out_alpha"])
    x = conv1d(x, params["out_w"], params["out_b"], padding=3)
    return jnp.tanh(x)[:, 0]


class DACDecoder:
    """Bucketed host wrapper: tokens [T, 9] -> float32 PCM numpy."""

    sample_rate = 44100
    # receptive field in frames: in-conv +/-3, layer-1 residual units
    # +/-39/8, transposed-conv kernels +/-~1 each, deeper layers sub-frame;
    # 16 gives margin (verified by test_dac_streaming_window)
    RECEPTIVE_FRAMES = 16
    device_arrays = ("params",)

    def __init__(self, cfg: DACConfig, params: dict):
        self.cfg = cfg
        self.params = params

    @classmethod
    def from_tensors(cls, tensors: dict, kv: dict) -> "DACDecoder":
        cfg = DACConfig.from_gguf_kv(kv)
        return cls(cfg, load_dac_params(tensors, cfg))

    def decode(self, codes: np.ndarray) -> np.ndarray:
        t = len(codes)
        if t == 0:
            return np.zeros(0, np.float32)
        tb = pick_bucket(t)
        if t > tb:
            # beyond the largest bucket (Dia's cap is 3072 frames, covered by
            # FRAME_BUCKETS, but clamp defensively instead of crashing)
            import logging
            logging.getLogger(__name__).warning(
                "dac: truncating %d frames to largest bucket %d", t, tb)
            codes, t = codes[:tb], tb
        padded = np.zeros((tb, self.cfg.n_heads), np.int32)
        padded[:t] = codes
        audio = dac_decode(self.params, self.cfg, jnp.asarray(padded),
                           jnp.asarray(t, jnp.int32))
        return np.asarray(audio[: t * self.cfg.up_sampling_factor])

    def decode_window(self, codes: np.ndarray, emit_start: int,
                      emit_end: int) -> np.ndarray:
        """Incremental decode: given the frames so far, decode a bounded
        window with RECEPTIVE_FRAMES of context on both sides and return the
        samples for frames [emit_start, emit_end) — O(chunk) codec work per
        chunk.  With emission held RECEPTIVE_FRAMES behind the decode head
        (Parler/Dia generate_stream), concatenated chunks equal a single
        full decode (DAC has no noise injection, so this is exact)."""
        total = len(codes)
        emit_end = min(emit_end, total)
        if emit_end <= emit_start:
            return np.zeros(0, np.float32)
        start = max(0, emit_start - self.RECEPTIVE_FRAMES)
        end = min(total, emit_end + self.RECEPTIVE_FRAMES)
        audio = self.decode(np.asarray(codes[start:end], np.int32))
        up = self.cfg.up_sampling_factor
        return audio[(emit_start - start) * up : (emit_end - start) * up]

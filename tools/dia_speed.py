"""Dia-1.6B decode speed at real dimensions (random weights, CFG batch 2).

Real-time threshold: one decode step = one DAC frame = 512 samples of
44.1 kHz audio = 11.6 ms, i.e. ~86 steps/s.

QUANT=q4 measures the quantized-decoder path (int4 Pallas matmuls, bf16
KV/cross caches, bf16 heads) — the layout a Q4_0 GGUF produces.
"""

import dataclasses
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.models.dia import (
    DiaConfig, dia_cross_kv, dia_decode_loop, dia_decode_loop_spec_resume,
    dia_encode, dia_init_loop_state, init_dia_cache,
)
from tts_tpu.ops.sampling import init_state
from tts_tpu.ops.spec import SPEC_K


def main():
    cfg = DiaConfig()  # real dims: enc 12L x 1024, dec 18L x 2048 GQA 16/4
    quant = os.environ.get("QUANT") == "q4"
    if quant:
        cfg = dataclasses.replace(cfg, kv_dtype="bfloat16")
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.02).astype(np.float32))

    def rq(K, N):
        """Decoder linear at [in, out]: dense f32, or packed int4 + uint16
        raw-f16-bit scales (what pack_q4_weight produces)."""
        if not quant:
            return r(K, N)
        from tts_tpu.ops.qmatmul import pack_q4_nibbles
        vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
        return {"wq4": jnp.asarray(pack_q4_nibbles(vals)),
                "scales": jnp.asarray(((rng.random((K // 32, N)) + .5) * 0.005)
                                      .astype(np.float16).view(np.uint16))}
    EH, DH, hs = cfg.encoder_hidden_size, cfg.decoder_hidden_size, cfg.head_size
    enc = {"embedding": r(256, EH), "norm": jnp.ones(EH), "layers": []}
    for _ in range(cfg.n_encoder_layers):
        enc["layers"].append({
            "q": r(EH, cfg.encoder_attn_heads * hs), "k": r(EH, cfg.encoder_attn_heads * hs),
            "v": r(EH, cfg.encoder_attn_heads * hs), "o": r(cfg.encoder_attn_heads * hs, EH),
            "sa_norm": jnp.ones(EH), "mlp_norm": jnp.ones(EH),
            "gate": r(EH, 4096), "up": r(EH, 4096), "wo": r(4096, EH),
        })
    hdt = jnp.bfloat16 if quant else jnp.float32
    dec = {"norm": jnp.ones(DH),
           "embds": [r(cfg.audio_vocab_size + 3, DH) for _ in range(9)],
           "heads": [r(DH, cfg.output_vocab_size).astype(hdt) for _ in range(9)],
           "layers": []}
    for _ in range(cfg.n_decoder_layers):
        dec["layers"].append({
            "sa_q": rq(DH, cfg.decoder_attn_heads * hs),
            "sa_k": rq(DH, cfg.kv_heads * hs), "sa_v": rq(DH, cfg.kv_heads * hs),
            "sa_o": rq(cfg.decoder_attn_heads * hs, DH),
            "ca_q": rq(DH, cfg.decoder_attn_heads * hs),
            "ca_k": rq(EH, cfg.decoder_attn_heads * hs),
            "ca_v": rq(EH, cfg.decoder_attn_heads * hs),
            "ca_o": rq(cfg.decoder_attn_heads * hs, DH),
            "sa_norm": jnp.ones(DH), "ca_norm": jnp.ones(DH), "mlp_norm": jnp.ones(DH),
            "gate": rq(DH, 8192), "up": rq(DH, 8192), "wo": rq(8192, DH),
        })
    params = {"encoder": enc, "decoder": dec}
    jax.block_until_ready(params)
    print("params built (dia dims)")

    tokens = np.zeros((2, cfg.max_encoder_context_length), np.int32)
    tokens[0, :200] = 65
    t0 = time.time()
    states = dia_encode(params, cfg, jnp.asarray(tokens), jnp.asarray(200, jnp.int32))
    cross = dia_cross_kv(params, cfg, states, jnp.asarray(200, jnp.int32))
    jax.block_until_ready(cross)
    print(f"encode+cross compile+run: {time.time() - t0:.1f}s")

    # MODE: seq (sampled, default) | seq_greedy | spec | spec_miss (the
    # every-draft-rejected worst-case floor) — the VERDICT r4 item 5 A/B.
    # NOTE the random-weight greedy stream goes degenerate (repeats), so
    # spec acceptance is flattering; spec_miss is the honest floor.
    mode = os.environ.get("MODE", "seq")
    N = 200
    for trial in range(2):
        cache = init_dia_cache(cfg)
        t0 = time.time()
        if mode in ("spec", "spec_miss"):
            out0 = jnp.full((cfg.max_generation_size + SPEC_K + 1, 9),
                            cfg.pad_token_id, jnp.int32)
            out, lstate, cache = dia_decode_loop_spec_resume(
                params, cfg, jnp.asarray(N, jnp.int32),
                jnp.asarray(cfg.max_generation_size, jnp.int32), cache, cross,
                dia_init_loop_state(cfg), out0, k=SPEC_K,
                force_miss=(mode == "spec_miss"))
            n = lstate[2]
        else:
            out, n, cache, s, _, _ = dia_decode_loop(
                params, cfg, jnp.asarray(N, jnp.int32),
                jnp.asarray(cfg.max_generation_size, jnp.int32), cache, cross,
                jax.random.PRNGKey(trial), init_state(9),
                dia_init_loop_state(cfg), do_sample=(mode == "seq"))
        jax.block_until_ready(out)
        dt = time.time() - t0
        label = "compile+run" if trial == 0 else "warm"
        print(f"[{mode}] decode {label}: {int(n)} steps in {dt:.2f}s -> "
              f"{int(n)/dt:.1f} steps/s ({int(n)/dt/86.1:.2f}x real time)")


if __name__ == "__main__":
    main()

"""Parler-TTS mini decode speed at real dimensions (random weights).

Real-time threshold: one decode step = one DAC frame = 512 samples of
44.1 kHz audio = 11.6 ms, i.e. ~86 steps/s.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.models.parler import (
    ParlerConfig, init_kv_cache, init_loop_state, parler_decode_loop,
    parler_decode_loop_spec_resume, parler_prefill, precompute_cross_kv,
)
from tts_tpu.ops.sampling import init_state
from tts_tpu.ops.spec import SPEC_K


def main():
    import dataclasses

    cfg = ParlerConfig()  # mini v1 dims (24L, h=1024, 16 heads)
    quant = os.environ.get("QUANT") == "q4"
    if quant:
        cfg = dataclasses.replace(cfg, kv_dtype="bfloat16")
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.02).astype(np.float32))

    def rq(K, N):
        if not quant:
            return r(K, N)
        from tts_tpu.ops.qmatmul import pack_q4_nibbles
        vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
        return {"wq4": jnp.asarray(pack_q4_nibbles(vals)),
                "scales": jnp.asarray(((rng.random((K // 32, N)) + .5) * 0.005)
                                      .astype(np.float16).view(np.uint16))}
    H, FFN, ENC = cfg.hidden_size, 4096, 20
    params = {
        "prompt_embd": r(1088, H), "positional": r(cfg.max_ctx_length, H),
        "text_encoding": r(ENC, H), "norm_w": jnp.ones(H), "norm_b": jnp.zeros(H),
        "embds": [r(cfg.audio_vocab_size + 2, H) for _ in range(9)],
        "heads": [r(H, cfg.output_vocab_size)
                  .astype(jnp.bfloat16 if quant else jnp.float32)
                  for _ in range(9)],
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "sa_norm_w": jnp.ones(H), "sa_norm_b": jnp.zeros(H),
            "sa_q": rq(H, H), "sa_k": rq(H, H), "sa_v": rq(H, H), "sa_o": rq(H, H),
            "ca_norm_w": jnp.ones(H), "ca_norm_b": jnp.zeros(H),
            "ca_q": rq(H, H), "ca_k": rq(H, H), "ca_v": rq(H, H), "ca_o": rq(H, H),
            "fc1": rq(H, FFN), "fc2": rq(FFN, H),
            "out_norm_w": jnp.ones(H), "out_norm_b": jnp.zeros(H),
        })
    jax.block_until_ready(params)
    print("params built (parler-mini dims)")

    cross = jax.jit(precompute_cross_kv, static_argnames=("cfg",))(params, cfg)
    cache = init_kv_cache(cfg)
    T = 32
    tokens = jnp.zeros(T, jnp.int32)
    t0 = time.time()
    cache = parler_prefill(params, cfg, tokens, jnp.asarray(T, jnp.int32),
                           cache, cross)
    jax.block_until_ready(cache)
    print(f"prefill compile+run: {time.time() - t0:.1f}s")

    # MODE: seq (sampled, default) | seq_greedy | spec | spec_miss (the
    # every-draft-rejected worst-case floor).  The spec modes are the
    # VERDICT r4 item 5 A/B: greedy speculative 9-head decode vs the greedy
    # sequential loop.  NOTE the random-weight greedy stream goes degenerate
    # (repeats), so spec acceptance is flattering — record spec_miss as the
    # honest floor, as with orpheus.
    mode = os.environ.get("MODE", "seq")
    N = 200

    def run(seed):
        cache = init_kv_cache(cfg)
        cache = parler_prefill(params, cfg, tokens, jnp.asarray(T, jnp.int32),
                               cache, cross)
        t0 = time.time()
        if mode in ("spec", "spec_miss"):
            out0 = jnp.full((cfg.max_generation_size + SPEC_K + 1, 9),
                            cfg.eos_token_id, jnp.int32)
            out, lstate, cache, _ = parler_decode_loop_spec_resume(
                params, cfg, jnp.asarray(T, jnp.int32),
                jnp.asarray(N, jnp.int32), cache, cross, init_loop_state(cfg),
                out0, max_steps=cfg.max_generation_size, k=SPEC_K,
                force_miss=(mode == "spec_miss"))
            n = lstate[2]
        else:
            out, n, cache, s, _, _ = parler_decode_loop(
                params, cfg, jnp.asarray(T, jnp.int32), jnp.asarray(N, jnp.int32),
                cache, cross, jax.random.PRNGKey(seed), init_state(9),
                init_loop_state(cfg), max_steps=cfg.max_generation_size,
                do_sample=(mode == "seq"))
        jax.block_until_ready(out)
        return int(n), time.time() - t0

    n, dt = run(0)
    print(f"[{mode}] decode compile+run ({n} steps): {dt:.1f}s")
    n, dt = run(1)
    print(f"[{mode}] decode warm: {n} steps in {dt:.2f}s -> {n/dt:.1f} steps/s "
          f"({n/dt/86.1:.2f}x real time)")


if __name__ == "__main__":
    main()

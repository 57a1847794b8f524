"""Orpheus-3B speculative vs sequential GREEDY decode speed (int4 + flash +
int8 KV — the fastest round-2 configuration).

The self-speculative loop (models/orpheus.py orpheus_decode_loop_spec) drafts
k tokens by prompt-lookup and verifies them in one T=k+1 forward; emitted
tokens are bit-identical to the sequential loop.  Reported acceptance is
measured on RANDOM weights — greedy decode on random weights tends to settle
into repetitive cycles, which flatters n-gram drafting, so the tool also
reports the floor configuration (FORCE_MISS=1 drafts a token id outside the
vocab so every draft is rejected: the worst case, one accepted token per
k+1-wide verify forward).
"""
import dataclasses
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tts_tpu.models.orpheus import (OrpheusConfig, init_kv_cache,
                                    orpheus_decode_loop,
                                    orpheus_decode_loop_spec,
                                    orpheus_decode_loop_spec_sample,
                                    orpheus_prefill)
from tts_tpu.ops.qmatmul import pack_q4_nibbles
from tts_tpu.ops.sampling import init_state

cfg = dataclasses.replace(OrpheusConfig(), kv_quant=True)
rng = np.random.default_rng(0)


def q4(K, N):
    vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
    return {"wq4": jnp.asarray(pack_q4_nibbles(vals)),
            "scales": jnp.asarray(((rng.random((K // 32, N)) + .5) * 0.01)
                                  .astype(np.float16).view(np.uint16))}


H = cfg.hidden_size
params = {"embd": jnp.asarray((rng.standard_normal((cfg.vocab_size, H)) * 0.02)
                              .astype(np.float32)).astype(jnp.bfloat16),
          "head": q4(H, ((cfg.vocab_size + 255) // 256) * 256),
          "out_norm": jnp.ones(H, jnp.float32),
          "rope_factors": jnp.ones(cfg.head_size // 2, jnp.float32),
          "layers": []}
for _ in range(cfg.n_layers):
    params["layers"].append({
        "in_norm": jnp.ones(H, jnp.float32),
        "qkv": q4(H, 3072 + 1024 + 1024), "o": q4(3072, H),
        "post_norm": jnp.ones(H, jnp.float32),
        "gateup": q4(H, 2 * 8192), "down": q4(8192, H)})
jax.block_until_ready(params)

T = 64
tokens = jnp.zeros(T, jnp.int32)
N = int(os.environ.get("N", "420"))   # 60 SNAC frames

# sampled modes use the reference defaults (temp 0.7, top-p 0.95, rep 1.1)
SAMP = dict(temperature=0.7, top_p=0.95, repetition_penalty=1.1)

for name in ("seq", "spec", "seq_sample", "spec_sample"):
    if os.environ.get("ONLY") and os.environ["ONLY"] != name:
        continue
    for trial in (1, 2, 3):
        cache = init_kv_cache(cfg)
        logits, cache = orpheus_prefill(params, cfg, tokens,
                                        jnp.asarray(T, jnp.int32), cache)
        first = jnp.argmax(logits).astype(jnp.int32)
        jax.block_until_ready(first)
        t0 = time.time()
        if name == "seq":
            out, n, cache, s, _ = orpheus_decode_loop(
                params, cfg, first, jnp.asarray(T, jnp.int32),
                jnp.asarray(N, jnp.int32), cache, jax.random.PRNGKey(trial),
                init_state(1), max_steps=cfg.max_generation_size,
                do_sample=False)
        elif name == "seq_sample":
            out, n, cache, s, _ = orpheus_decode_loop(
                params, cfg, first, jnp.asarray(T, jnp.int32),
                jnp.asarray(N, jnp.int32), cache, jax.random.PRNGKey(trial),
                init_state(1), max_steps=cfg.max_generation_size,
                do_sample=True, use_top_p=True, **SAMP)
        elif name == "spec_sample":
            out, n, cache, s, _ = orpheus_decode_loop_spec_sample(
                params, cfg, first, jnp.asarray(T, jnp.int32),
                jnp.asarray(N, jnp.int32), cache, jax.random.PRNGKey(trial),
                init_state(1), max_steps=cfg.max_generation_size,
                use_top_p=True, **SAMP)
        else:
            out, n, cache = orpheus_decode_loop_spec(
                params, cfg, first, jnp.asarray(T, jnp.int32),
                jnp.asarray(N, jnp.int32), cache,
                max_steps=cfg.max_generation_size,
                force_miss=os.environ.get("FORCE_MISS") == "1")
        n_host = int(np.asarray(n))   # transfer forces completion
        dt = time.time() - t0
        o = np.asarray(out)[:n_host]
        print(f"{name} trial {trial}: n={n_host} dt={dt:.3f}s -> "
              f"{n_host / max(dt, 1e-9):.1f} tok/s; "
              f"uniq={len(np.unique(o))}", flush=True)

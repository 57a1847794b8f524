"""Orpheus-3B decode speed with int4-packed Q4 weights (vs int8/bf16 tools)."""
import os, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from tts_tpu.models.orpheus import (OrpheusConfig, init_kv_cache, orpheus_prefill,
                                    orpheus_decode_loop)
from tts_tpu.ops.sampling import init_state
from tts_tpu.ops.qmatmul import pack_q4_nibbles

import dataclasses
cfg = OrpheusConfig()
if os.environ.get("TTS_TPU_ORPHEUS_KV", "").lower() == "int8":
    cfg = dataclasses.replace(cfg, kv_quant=True)
if os.environ.get("NO_FLASH") == "1":
    cfg = dataclasses.replace(cfg, use_flash_attn=False)
rng = np.random.default_rng(0)
def q4(K, N):
    vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
    return {"wq4": jnp.asarray(pack_q4_nibbles(vals)),
            "scales": jnp.asarray(((rng.random((K//32, N))+.5)*0.01).astype(np.float16).view(np.uint16))}
H = cfg.hidden_size
params = {"embd": jnp.asarray((rng.standard_normal((cfg.vocab_size, H))*0.02).astype(np.float32)).astype(jnp.bfloat16),
          # tile-padded quantized head, as the real Q4 loader produces
          # HEADPAD=256 reproduces the pre-r5 256-padded head for A/Bs
          "head": q4(H, -(-cfg.vocab_size // int(os.environ.get("HEADPAD", "1024")))
                     * int(os.environ.get("HEADPAD", "1024"))),
          "out_norm": jnp.ones(H, jnp.float32),
          "rope_factors": jnp.ones(cfg.head_size // 2, jnp.float32), "layers": []}
for _ in range(cfg.n_layers):
    params["layers"].append({"in_norm": jnp.ones(H, jnp.float32),
        "qkv": q4(H, 3072 + 1024 + 1024), "o": q4(3072, H),
        "post_norm": jnp.ones(H, jnp.float32),
        "gateup": q4(H, 2 * 8192), "down": q4(8192, H)})
jax.block_until_ready(params)
T = 64
tokens = jnp.zeros(T, jnp.int32)
for trial, N in [(1, 100), (2, 200), (3, 200)]:
    cache = init_kv_cache(cfg)
    logits, cache = orpheus_prefill(params, cfg, tokens, jnp.asarray(T, jnp.int32), cache)
    jax.block_until_ready(logits)
    t0=time.time()
    out, n, cache, s, _ = orpheus_decode_loop(params, cfg, jnp.asarray(0, jnp.int32),
        jnp.asarray(T, jnp.int32), jnp.asarray(N, jnp.int32), cache,
        jax.random.PRNGKey(trial), init_state(1), max_steps=cfg.max_generation_size,
        do_sample=(os.environ.get("GREEDY") != "1"),
        use_top_p=(os.environ.get("TOPP") == "1"))
    n_host = int(np.asarray(n))      # transfer forces completion (axon
    # block_until_ready is unreliable under tunnel degradation)
    dt = time.time()-t0
    o = np.asarray(out)
    print(f"N={N}: n={n_host} dt={dt:.3f}s -> {n_host/max(dt,1e-9):.1f} tok/s; uniq={len(np.unique(o[:n_host]))}")

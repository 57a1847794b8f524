"""Orpheus-3B decode speed at real dimensions (random bf16 weights on device)."""
import os, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from tts_tpu.models.orpheus import (OrpheusConfig, init_kv_cache, orpheus_prefill,
                                    orpheus_decode_loop)
from tts_tpu.ops.sampling import init_state

cfg = OrpheusConfig()  # real 3B dims
key = jax.random.PRNGKey(0)
def rnd(*shape, dtype=jnp.bfloat16):
    global key
    key, k = jax.random.split(key)
    return (jax.random.normal(k, shape, jnp.float32) * 0.02).astype(dtype)

H = cfg.hidden_size
params = {
    "embd": rnd(cfg.vocab_size, H),
    "head": {"w": rnd(H, cfg.vocab_size)},
    "out_norm": jnp.ones(H, jnp.float32),
    "rope_factors": jnp.ones(cfg.head_size // 2, jnp.float32),
    "layers": [],
}
for _ in range(cfg.n_layers):
    params["layers"].append({
        "in_norm": jnp.ones(H, jnp.float32),
        "q": {"w": rnd(H, cfg.n_attn_heads * cfg.head_size)},
        "k": {"w": rnd(H, cfg.n_kv_attn_heads * cfg.head_size)},
        "v": {"w": rnd(H, cfg.n_kv_attn_heads * cfg.head_size)},
        "o": {"w": rnd(cfg.n_attn_heads * cfg.head_size, H)},
        "post_norm": jnp.ones(H, jnp.float32),
        "gate": {"w": rnd(H, 8192)},
        "up": {"w": rnd(H, 8192)},
        "down": {"w": rnd(8192, H)},
    })
jax.block_until_ready(params)
print("params built (3B bf16)")

cache = init_kv_cache(cfg)
T = 64
tokens = jnp.zeros(T, jnp.int32)
t0 = time.time()
logits, cache = orpheus_prefill(params, cfg, tokens, jnp.asarray(T, jnp.int32), cache)
jax.block_until_ready(logits)
print(f"prefill compile+run: {time.time()-t0:.1f}s")

sstate = init_state(1)
N = 200
t0 = time.time()
out, n, cache, sstate, _ = orpheus_decode_loop(
    params, cfg, jnp.asarray(0, jnp.int32), jnp.asarray(T, jnp.int32),
    jnp.asarray(N, jnp.int32), cache, jax.random.PRNGKey(1), sstate,
    max_steps=cfg.max_generation_size, do_sample=True, temperature=1.0)
jax.block_until_ready(out)
print(f"decode loop compile+run ({int(n)} steps): {time.time()-t0:.1f}s")

cache2 = init_kv_cache(cfg)
logits, cache2 = orpheus_prefill(params, cfg, tokens, jnp.asarray(T, jnp.int32), cache2)
t0 = time.time()
out, n, cache2, sstate, _ = orpheus_decode_loop(
    params, cfg, jnp.asarray(0, jnp.int32), jnp.asarray(T, jnp.int32),
    jnp.asarray(N, jnp.int32), cache2, jax.random.PRNGKey(2), init_state(1),
    max_steps=cfg.max_generation_size, do_sample=True, temperature=1.0)
jax.block_until_ready(out)
dt = time.time() - t0
steps = int(n)
print(f"decode warm: {steps} steps in {dt:.2f}s -> {steps/dt:.1f} tok/s")
# real-time threshold: 7 tokens -> 4 SNAC fine frames -> 2048 samples @24k = 85.3ms
print(f"real-time needs ~82 tok/s; margin {steps/dt/82:.2f}x")

import os, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from tts_tpu.models.orpheus import (OrpheusConfig, init_kv_cache, orpheus_prefill,
                                    orpheus_decode_loop)
from tts_tpu.ops.sampling import init_state

cfg = OrpheusConfig()
rng = np.random.default_rng(0)
def q(K, N):
    return {"wq": jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8)),
            "scales": jnp.asarray(((rng.random((K//32, N))+.5)*0.005).astype(np.float16).view(np.uint16))}
H = cfg.hidden_size
params = {"embd": jnp.asarray((rng.standard_normal((cfg.vocab_size, H))*0.02).astype(np.float32)).astype(jnp.bfloat16),
          "head": {"w": jnp.asarray((rng.standard_normal((H, cfg.vocab_size))*0.02).astype(np.float32)).astype(jnp.bfloat16)},
          "out_norm": jnp.ones(H, jnp.float32),
          "rope_factors": jnp.ones(cfg.head_size // 2, jnp.float32), "layers": []}
for _ in range(cfg.n_layers):
    params["layers"].append({"in_norm": jnp.ones(H, jnp.float32),
        "q": q(H, 3072), "k": q(H, 1024), "v": q(H, 1024), "o": q(3072, H),
        "post_norm": jnp.ones(H, jnp.float32),
        "gate": q(H, 8192), "up": q(H, 8192), "down": q(8192, H)})
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
        jax.random.PRNGKey(trial), init_state(1), max_steps=cfg.max_generation_size)
    jax.block_until_ready((out, n))
    dt = time.time()-t0
    o = np.asarray(out)
    print(f"N={N}: n={int(n)} dt={dt:.3f}s -> {int(n)/max(dt,1e-9):.1f} tok/s; out head: {o[:6]} uniq={len(np.unique(o[:int(n)]))}")

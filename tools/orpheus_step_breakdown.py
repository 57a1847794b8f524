#!/usr/bin/env python
"""Where does the Orpheus decode step spend its time?

ONE jitted probe runs five sub-graph loops back-to-back with TRACED
iteration counts (fori_loop -> while_loop), so the whole tool costs a single
XLA compile — compiles ship over the axon tunnel and cost 10-20 min each, so
per-subgraph jits are unaffordable.  Each sub-graph's per-iteration time is
the wall difference between a run with its count raised and the all-baseline
run, divided by the extra iterations (tunnel dispatch latency cancels).

Sub-graphs:
  body    : 28-layer `_orpheus_body` (weights + attention + elementwise)
  head    : lm_head projection
  sample  : sampling over the 157k vocab (penalty/temp/softmax/categorical)
  attn    : the GQA attention einsums alone over the full cache length
  linears : the 6 quantized matmuls per layer x 28 — the weight-stream floor

body - linears - attn = the elementwise/RoPE/norm/cache-update residue.
Run on the TPU host: QUANT=q4|q8 python -u tools/orpheus_step_breakdown.py
"""
import os, time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from tts_tpu.models.orpheus import (
    OrpheusConfig, _gqa_attention, _head_logits, _orpheus_body, init_kv_cache)
from tts_tpu.ops.qmatmul import linear, pack_q4_nibbles
from tts_tpu.ops.sampling import init_state, sample_tokens

cfg = OrpheusConfig()
rng = np.random.default_rng(0)
QUANT = os.environ.get("QUANT", "q4")


def qw(K, N):
    if QUANT == "q8":
        return {"wq": jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8)),
                "scales": jnp.asarray(((rng.random((K // 32, N)) + .5) * 0.005)
                                      .astype(np.float16).view(np.uint16))}
    vals = rng.integers(-8, 8, (K, N)).astype(np.int8)
    return {"wq4": jnp.asarray(pack_q4_nibbles(vals)),
            "scales": jnp.asarray(((rng.random((K // 32, N)) + .5) * 0.01)
                                  .astype(np.float16).view(np.uint16))}


H = cfg.hidden_size
params = {"embd": jnp.asarray((rng.standard_normal((cfg.vocab_size, H)) * 0.02)
                              .astype(np.float32)).astype(jnp.bfloat16),
          "head": qw(H, ((cfg.vocab_size + 1023) // 1024) * 1024),
          "out_norm": jnp.ones(H, jnp.float32),
          "rope_factors": jnp.ones(cfg.head_size // 2, jnp.float32),
          "layers": []}
for _ in range(cfg.n_layers):
    params["layers"].append({
        "in_norm": jnp.ones(H, jnp.float32),
        "qkv": qw(H, 3072 + 1024 + 1024), "o": qw(3072, H),
        "post_norm": jnp.ones(H, jnp.float32),
        "gateup": qw(H, 2 * 8192), "down": qw(8192, H)})
jax.block_until_ready(params)
print(f"quant={QUANT}  cache_len={cfg.cache_length}  params on device", flush=True)

cache = init_kv_cache(cfg)
pos = jnp.asarray(200, jnp.int32)
key = jax.random.PRNGKey(0)
sstate = init_state(1)
from tts_tpu.models.orpheus import padded_cache_length
mask0 = jnp.zeros((1, 1, 1, padded_cache_length(cfg)), jnp.float32)


# params/cache ride as ARGUMENTS: closure-captured device arrays are baked
# into the lowered HLO as CONSTANTS (2.8 GB here), which makes lowering take
# tens of minutes and ships the bytes to the compiler — the r4/r5 runs of
# this tool never finished because of it
@jax.jit
def probe(params, n_body, n_head, n_sample, n_attn, n_linears, cache):
    # body: one full transformer step; the cache rides the loop carry so its
    # update is in-place (as in the production decode loop) — a read-only
    # cache would force a 360 MB copy-on-write per iteration
    def body_fn(i, carry):
        tok, ch = carry
        x, ch = _orpheus_body(params, cfg, tok[None], pos[None], pos, ch)
        return ((x[0, 0] * 1e-30).astype(jnp.int32), ch)

    r_body, _ = lax.fori_loop(0, n_body, body_fn,
                              (jnp.zeros((), jnp.int32), cache))

    # head: hidden -> 157k logits
    def head_fn(i, h):
        lg = _head_logits(h, params, cfg)
        return h + lg[:1].astype(jnp.bfloat16) * 1e-30

    r_head = lax.fori_loop(0, n_head, head_fn, jnp.zeros(H, jnp.bfloat16))

    # sample: logits -> token
    logits0 = jnp.zeros(cfg.vocab_size, jnp.float32)

    def sample_fn(i, c):
        toks, _ = sample_tokens(key, (logits0 + c)[None], sstate,
                                temperature=0.7, repetition_penalty=1.1)
        return toks[0].astype(jnp.float32) * 1e-30

    r_sample = lax.fori_loop(0, n_sample, sample_fn,
                             jnp.zeros((), jnp.float32))

    # attn: the 28 GQA einsums over the full cache
    q0 = jnp.zeros((1, cfg.n_attn_heads, cfg.head_size), jnp.bfloat16)

    def attn_fn(i, c):
        out = c
        for l in range(cfg.n_layers):
            a = _gqa_attention(q0 + out * 1e-30, cache["k"][l],
                               cache["v"][l], mask0, cfg)
            out = a[0, :1].astype(jnp.bfloat16)
        return out

    r_attn = lax.fori_loop(0, n_attn, attn_fn, jnp.zeros(1, jnp.bfloat16))

    # linears: 6 quantized matmuls x 28 layers (weight-stream floor)
    z8 = jnp.zeros((1, 8192), jnp.float32)

    def linears_fn(i, c):
        out = c
        for L in params["layers"]:
            qkv = linear(out, L["qkv"])
            o = linear(qkv[:, :H] * 1e-30 + out, L["o"])
            gu = linear(o * 1e-30 + out, L["gateup"])
            dn = linear(gu[:, :8192] * 1e-30 + z8, L["down"])
            out = out + dn * 1e-30
        return out

    r_linears = lax.fori_loop(0, n_linears, linears_fn,
                              jnp.zeros((1, H), jnp.float32))

    return (r_body + r_head[0].astype(jnp.int32) + r_sample.astype(jnp.int32)
            + r_attn[0].astype(jnp.int32) + r_linears[0, 0].astype(jnp.int32))


BASE, HIGH = 8, 72


def wall(counts):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(probe(params,
                         *[jnp.asarray(c, jnp.int32) for c in counts], cache))
        best = min(best, time.perf_counter() - t0)
    return best


t0 = time.time()
base_counts = [BASE] * 5
wall(base_counts)   # compile + warm
print(f"compiled in {time.time() - t0:.0f}s", flush=True)
t_base = wall(base_counts)
names = ["body", "head", "sample", "attn", "linears"]
res = {}
for i, name in enumerate(names):
    c = list(base_counts)
    c[i] = HIGH
    res[name] = (wall(c) - t_base) / (HIGH - BASE)
    print(f"{name:8s}{res[name] * 1e6:9.1f} us", flush=True)

step = res["body"] + res["head"] + res["sample"]
print(f"residue (body - linears - attn): "
      f"{(res['body'] - res['linears'] - res['attn']) * 1e6:9.1f} us")
print(f"step = body+head+sample = {step * 1e6:9.1f} us -> "
      f"{1.0 / step:6.1f} tok/s upper bound")

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
          "head": q4(H, ((cfg.vocab_size + 1023) // 1024) * 1024),
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

K_DRAFT = int(os.environ.get("K", "7"))   # draft window (verify T = K+1)


def replay_acceptance(stream: np.ndarray, first: int):
    """Host-side replay of the device loop's n-gram drafting over the emitted
    greedy stream: drafting depends only on the out-buffer prefix and the
    carried token, and for GREEDY decode a draft is accepted iff it equals
    the emitted token — so this reproduces the on-device window count exactly
    and yields the measured acceptance rate (VERDICT r3 item 2a)."""
    n = len(stream)
    out = np.full(n + K_DRAFT + 2, cfg.stopping_token_id, np.int64)
    out[:n] = stream
    iters = 0
    accepted = 0
    i = 0
    token = first
    while i < n:
        prev = out[i - 1] if i > 0 else token
        prev2 = out[i - 2] if i > 1 else token
        # most recent j with (out[j-1], out[j]) == (prev2, prev), j+1 < i-1
        drafts = np.full(K_DRAFT, prev, np.int64)
        best = -1
        for j in range(1, max(i - 1, 0) - 1):
            if out[j] == prev and out[j - 1] == prev2:
                best = j + 1
        # the device drafter reads `out` with rows >= i still holding fill
        # (stopping_token_id), NOT the future stream — mask before slicing
        # so the replay stays exact for draft windows that cross i (K > 7)
        src_buf = out.copy()
        src_buf[i:] = cfg.stopping_token_id
        if best >= 0:
            drafts = src_buf[best: best + K_DRAFT]
        elif i >= 7:
            drafts = src_buf[i - 7: i - 7 + K_DRAFT]
        n_acc = 0
        for d, g in zip(drafts, out[i: i + K_DRAFT]):
            if d == g and i + n_acc < n - 1:
                n_acc += 1
            else:
                break
        accepted += n_acc
        i += n_acc + 1
        token = out[i - 1]
        iters += 1
    return iters, accepted / max(iters, 1)

# spec_sample (the rejection-scheme speculative SAMPLER) was measured here
# on 2026-08-19 at 149-150 tok/s vs seq_sample's 206-209 tok/s warm — the
# per-window [k+1, V] filtering + residual redraw cost more than the saved
# weight reads — and was removed from models/orpheus.py (measured -> reverted).
CHUNK = int(os.environ.get("CHUNK", "56"))   # streaming chunk: 8 SNAC frames

for name in ("seq", "spec", "seq_sample", "stream_seq", "stream_spec"):
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
        elif name.startswith("stream"):
            # greedy generate_stream's dispatch pattern: CHUNK-token budget
            # per dispatch, host readback of (tokens, n) each chunk — the
            # server pcm path (VERDICT r3 item 3 before/after measurement).
            from tts_tpu.models.orpheus import orpheus_decode_loop_spec_resume
            i_cum, pos, tok_carry = 0, T, first
            if name == "stream_spec":
                out = jnp.full((cfg.max_generation_size + K_DRAFT + 1,),
                               cfg.stopping_token_id, jnp.int32)
                while i_cum < N:
                    out, i_new, cache = orpheus_decode_loop_spec_resume(
                        params, cfg, tok_carry, jnp.asarray(pos, jnp.int32),
                        jnp.asarray(i_cum, jnp.int32),
                        jnp.asarray(min(i_cum + CHUNK, N), jnp.int32),
                        cache, out, max_steps=cfg.max_generation_size, k=K_DRAFT)
                    host = np.asarray(out)     # full-buffer readback per chunk
                    i_new = int(i_new)
                    pos += i_new - i_cum
                    i_cum = i_new
                    tok_carry = jnp.asarray(int(host[i_cum - 1]), jnp.int32)
                n = jnp.asarray(i_cum)
            else:
                outs = []
                s = init_state(1)
                key = jax.random.PRNGKey(trial)
                while len(outs) < N:
                    budget = min(CHUNK, N - len(outs))
                    toks, nn, cache, s, key = orpheus_decode_loop(
                        params, cfg, tok_carry, jnp.asarray(pos, jnp.int32),
                        jnp.asarray(budget, jnp.int32), cache, key, s,
                        max_steps=cfg.max_generation_size, do_sample=False)
                    nn = int(nn)
                    outs.extend(int(t) for t in np.asarray(toks)[:nn])
                    pos += nn
                    tok_carry = jnp.asarray(outs[-1], jnp.int32)
                out, n = jnp.asarray(np.asarray(outs, np.int32)), jnp.asarray(len(outs))
        elif name == "seq_sample":
            out, n, cache, s, _ = orpheus_decode_loop(
                params, cfg, first, jnp.asarray(T, jnp.int32),
                jnp.asarray(N, jnp.int32), cache, jax.random.PRNGKey(trial),
                init_state(1), max_steps=cfg.max_generation_size,
                do_sample=True, use_top_p=True, **SAMP)
        else:
            out, n, cache = orpheus_decode_loop_spec(
                params, cfg, first, jnp.asarray(T, jnp.int32),
                jnp.asarray(N, jnp.int32), cache,
                max_steps=cfg.max_generation_size, k=K_DRAFT,
                force_miss=os.environ.get("FORCE_MISS") == "1")
        n_host = int(np.asarray(n))   # transfer forces completion
        dt = time.time() - t0
        o = np.asarray(out)[:n_host]
        extra = ""
        if name == "spec" and os.environ.get("FORCE_MISS") != "1":
            iters, acc = replay_acceptance(o, int(np.asarray(first)))
            extra = (f"; verify_windows={iters} "
                     f"accept={acc:.2f}/window ({n_host}/{iters} tok/fwd)")
        print(f"{name} trial {trial}: n={n_host} dt={dt:.3f}s -> "
              f"{n_host / max(dt, 1e-9):.1f} tok/s; "
              f"uniq={len(np.unique(o))}{extra}", flush=True)

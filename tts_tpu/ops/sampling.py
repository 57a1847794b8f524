"""On-device multi-head sampling: temperature, repetition penalty, top-k,
top-p, categorical draw — one jitted function over a [heads, vocab] tile.

Behavior parity with the reference's host-side sampler
(/root/reference/src/sampler.cpp:3-204): per-head *consecutive-repeat*
repetition penalty (logit / penalty^count for the single last-sampled id),
temperature before top-k/top-p, nucleus kept inclusively up to top_p, greedy
path when do_sample=False.  Unlike the reference this runs on the TPU inside
the decode step, so logits never cross to the host.

State is a dict {"last": int32 [H], "count": int32 [H]} matching
sampler.cpp:57-63's update rule.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def init_state(n_heads: int) -> dict:
    return {"last": jnp.full((n_heads,), -1, jnp.int32),
            "count": jnp.zeros((n_heads,), jnp.int32)}


def filtered_probs(logits, state, *, temperature: float | jax.Array = 1.0,
                   top_k: int = 0, top_p: float | jax.Array = 1.0,
                   repetition_penalty: float | jax.Array = 1.0,
                   use_top_p: bool = True):
    """logits [H, V] -> the post-filter categorical distribution [H, V] that
    `sample_tokens` draws from: consecutive-repeat penalty, temperature,
    top-k, and the sort-free nucleus cutoff.  Exposed separately so the
    speculative-sampling verify step (models/orpheus.py) can compute exact
    per-position target probabilities for its accept/reject test."""
    H, V = logits.shape
    logits = logits.astype(jnp.float32)

    # consecutive-repeat penalty on the last sampled id per head
    rep = jnp.asarray(repetition_penalty, jnp.float32)
    pen = jnp.power(rep, state["count"].astype(jnp.float32))      # [H]
    onehot_last = jax.nn.one_hot(state["last"], V, dtype=jnp.float32)
    scale = 1.0 + onehot_last * (1.0 / pen - 1.0)[:, None]
    logits = logits * scale
    logits = logits / jnp.asarray(temperature, jnp.float32)

    if top_k and top_k < V:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1]              # [H]
        logits = jnp.where(logits < kth[:, None], -jnp.inf, logits)

    probs = jax.nn.softmax(logits, axis=-1)

    if use_top_p:
        # nucleus: keep the smallest prefix of the sorted probs with
        # cumsum >= top_p (inclusive, sampler.cpp topp semantics).
        # Computed WITHOUT a sort: the prefix's cutoff equals the largest
        # threshold t with sum(probs >= t) >= top_p (the kept mass is a
        # step function of t), found by 30 bisection steps — 30 masked
        # reductions over [H, V] instead of an O(V log V) sort that costs
        # multi-ms at llama-3's 157k vocab.  After 30 halvings the
        # threshold is within max_prob * 2^-30 of exact, so only tokens
        # within ~1e-9 of the cutoff can differ from the sorted version.
        tp = jnp.asarray(top_p, jnp.float32)
        lo = jnp.zeros((H, 1), jnp.float32)
        hi = jnp.max(probs, axis=-1, keepdims=True)

        def bisect(_, lohi):
            lo, hi = lohi
            mid = 0.5 * (lo + hi)
            mass = jnp.sum(jnp.where(probs >= mid, probs, 0.0),
                           axis=-1, keepdims=True)
            ge = mass >= tp
            return (jnp.where(ge, mid, lo), jnp.where(ge, hi, mid))

        lo, hi = jax.lax.fori_loop(0, 30, bisect, (lo, hi))
        probs = jnp.where(probs >= lo, probs, 0.0)
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    return probs


@partial(jax.jit, static_argnames=("top_k", "do_sample", "use_top_p"))
def sample_tokens(key, logits, state, *, temperature: float | jax.Array = 1.0,
                  top_k: int = 0, top_p: float | jax.Array = 1.0,
                  repetition_penalty: float | jax.Array = 1.0,
                  do_sample: bool = True, use_top_p: bool = True):
    """logits [H, V] -> (tokens [H] int32, new_state).

    temperature/top_p/repetition_penalty may be traced scalars so one compiled
    step serves any config; top_k, do_sample, and use_top_p are static.
    `use_top_p=False` statically removes the nucleus filter — a FULL [H, V]
    sort per step (multi-ms at llama-3's 157k vocab) that a traced
    top_p == 1.0 cannot elide.
    """
    if do_sample:
        probs = filtered_probs(
            logits, state, temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, use_top_p=use_top_p)
        tokens = jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1)
        tokens = tokens.astype(jnp.int32)
    else:
        tokens = jnp.argmax(logits.astype(jnp.float32), axis=-1).astype(jnp.int32)

    same = tokens == state["last"]
    new_count = jnp.where(same, state["count"] + 1, 1).astype(jnp.int32)
    new_state = {"last": tokens, "count": new_count}
    return tokens, new_state

"""Bisect the level-1 MRF res-block cost at [23040, 128]: chained
differential timing (dispatch floor cancels) of each op class the block
composes — AdaIN (masked instance norm + affine), snake, conv (current
formulation), mask-multiply — and of one full conv-pair unit.

PYTHONPATH=/root/repo:/root/.axon_site python tools/kokoro_mrf_bisect.py
"""
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tts_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax import lax

from tts_tpu.ops.basic import ada_instance_norm, snake
from tts_tpu.ops.conv import conv1d

T, C = 23040, 128
rng = np.random.default_rng(0)
N_LO, N_HI = 10, 110


def bench(name, fn, *args, reps=7):
    @jax.jit
    def chained(n, *a):
        x0 = a[0]

        def body(i, acc):
            x = x0 + (acc * 1e-30).astype(x0.dtype)
            y = fn(x, *a[1:])
            return acc + y.sum().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    for n in (N_LO, N_HI):
        np.asarray(chained(n, *args))

    def wall(n):
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(n, *args))
            per.append(time.perf_counter() - t0)
        return min(per)

    per_op = (wall(N_HI) - wall(N_LO)) / (N_HI - N_LO) * 1e3
    print(f"{name:34s} {per_op:7.3f} ms", flush=True)


def arr(*shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)


x = arr(T, C)
mask = jnp.asarray((np.arange(T) < T - 64).astype(np.float32))
gamma = arr(C, dtype=jnp.float32)
beta = arr(C, dtype=jnp.float32)
alpha = jnp.abs(arr(C, dtype=jnp.float32)) + 0.5
w7 = arr(C, C, 7, dtype=jnp.float32)
b1 = arr(C, dtype=jnp.float32)

bench("control x+1", lambda x: x + 1, x)
bench("adain masked", lambda x: ada_instance_norm(x, gamma, beta, mask=mask), x)
bench("adain zero-tail", lambda x: ada_instance_norm(x, gamma, beta, mask=mask,
                                                     zero_tail=True), x)
bench("adain unmasked", lambda x: ada_instance_norm(x, gamma, beta), x)
bench("snake", lambda x: snake(x, alpha), x)
bench("mask-mult", lambda x: x * mask.astype(x.dtype)[:, None], x)
bench("conv k7 d3", lambda x: conv1d(x, w7, b1, padding=9, dilation=3), x)


def pair(x):
    """One conv pair exactly as _gen_res_block_apply composes it (current)."""
    mcol = mask.astype(x.dtype)[:, None]
    cur = ada_instance_norm(x, gamma, beta, mask=mask, zero_tail=True)
    cur = snake(cur, alpha)
    cur = conv1d(cur, w7, b1, padding=9, dilation=3)
    cur = cur * mcol
    cur = ada_instance_norm(cur, gamma, beta, mask=mask, zero_tail=True)
    cur = snake(cur, alpha)
    cur = conv1d(cur, w7, b1, padding=3)
    return x + cur * mcol


bench("full conv pair k7", pair, x)

"""Micro-bench the generator-tail constituent ops.

Timing method (the ONLY one that works over the axon tunnel, whose
per-dispatch latency is ~2-15 ms even for async enqueue): the repeat loop
runs INSIDE one jit — a `lax.fori_loop` carries a scalar that each
iteration's input depends on, so XLA cannot parallelize or elide the N
applications.  One dispatch, one 4-byte readback; per-op device time =
(wall - RTT) / N minus the ~equivalent of one extra elementwise add.
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

from tts_tpu.ops.basic import ada_instance_norm, leaky_relu, snake
from tts_tpu.ops.conv import conv1d, conv_transpose1d
from tts_tpu.ops.stft import hann_window, istft, stft

F = 192
rng = np.random.default_rng(0)
N = 20


tiny = jax.jit(lambda x: x + 1)
z = jnp.zeros((8,), jnp.float32)
np.asarray(tiny(z))
fl = []
for _ in range(8):
    t0 = time.perf_counter(); np.asarray(tiny(z)); fl.append(time.perf_counter() - t0)
RTT = sorted(fl)[4]
print(f"RTT {RTT * 1e3:.1f} ms", flush=True)


def bench(name, fn, *args, reps=5):
    """fn(*args) -> array; chained N times inside one jit."""

    @jax.jit
    def chained(*a):
        x0 = a[0]

        def body(i, acc):
            x = x0 + (acc * 1e-30).astype(x0.dtype)
            y = fn(x, *a[1:])
            # full-array reduction: every element of y is live, so XLA
            # cannot slice-propagate the dependence down to one element
            return acc + y.sum().astype(jnp.float32)

        return lax.fori_loop(0, N, body, jnp.float32(0.0))

    np.asarray(chained(*args))          # compile + warm
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        per.append((time.perf_counter() - t0 - RTT) / N * 1e3)
    per.sort()
    print(f"{name:46s} {per[len(per) // 2]:7.3f} ms", flush=True)


def arr(*shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32)).astype(dtype)


# ---- control: the chaining overhead itself -------------------------------
W1, C1 = 120 * F, 128
x1 = arr(W1, C1)
bench("control x+1 [23040,128]", lambda x: x + 1, x1)

# ---- level-1 rate: [23040, 128] ------------------------------------------
w1_k7 = arr(C1, C1, 7, dtype=jnp.float32)
b1 = arr(C1, dtype=jnp.float32)
m1 = jnp.ones((W1,), jnp.bfloat16)
style = arr(128, dtype=jnp.float32)
gw = arr(128, C1, dtype=jnp.float32)
gb = arr(C1, dtype=jnp.float32)
alpha = arr(C1, dtype=jnp.float32)

bench("conv1d [23040,128] k7 d1", lambda x: conv1d(x, w1_k7, b1, padding=3), x1)
bench("conv1d [23040,128] k7 d3",
      lambda x: conv1d(x, w1_k7, b1, padding=9, dilation=3), x1)
bench("conv1d [23040,128] k11 d5",
      lambda x: conv1d(x, arr(C1, C1, 11, dtype=jnp.float32), b1, padding=25,
                       dilation=5), x1)
bench("conv1d [23040,128] k3 d1",
      lambda x: conv1d(x, arr(C1, C1, 3, dtype=jnp.float32), b1, padding=1), x1)
bench("ada_instance_norm [23040,128]",
      lambda x: ada_instance_norm(x, style @ gw + gb, style @ gw + gb,
                                  mask=m1.astype(jnp.float32)), x1)
bench("snake [23040,128]", lambda x: snake(x, alpha), x1)
bench("leaky+mask [23040,128]",
      lambda x: leaky_relu(x, 0.1) * m1[:, None], x1)

# ---- level-0 rate: [3840, 256] -------------------------------------------
W0, C0 = 20 * F, 256
x0 = arr(W0, C0)
bench("conv1d [3840,256] k7 d1",
      lambda x: conv1d(x, arr(C0, C0, 7, dtype=jnp.float32),
                       arr(C0, dtype=jnp.float32), padding=3), x0)
bench("ada_instance_norm [3840,256]",
      lambda x: ada_instance_norm(x, style @ arr(128, C0, dtype=jnp.float32),
                                  style @ arr(128, C0, dtype=jnp.float32),
                                  mask=jnp.ones((W0,), jnp.float32)), x0)
bench("snake [3840,256]", lambda x: snake(x, arr(C0, dtype=jnp.float32)), x0)

# ---- upsample convs ------------------------------------------------------
xup = arr(2 * F, 512)
bench("conv_transpose [384,512]->[3840,256] k20 s10",
      lambda x: conv_transpose1d(x, arr(512, 256, 20, dtype=jnp.float32),
                                 arr(256, dtype=jnp.float32), stride=10,
                                 padding=5), xup)
bench("conv_transpose [3840,256]->[23040,128] k12 s6",
      lambda x: conv_transpose1d(x, arr(256, 128, 12, dtype=jnp.float32),
                                 arr(128, dtype=jnp.float32), stride=6,
                                 padding=3), x0)

# ---- out conv + istft ----------------------------------------------------
S = 600 * F
window = jnp.asarray(hann_window(20))
bench("out_conv [23040,128]->22 k7",
      lambda x: conv1d(x, arr(22, C1, 7, dtype=jnp.float32),
                       arr(22, dtype=jnp.float32), padding=3), x1)
spec = arr(W1 + 1, 11, dtype=jnp.float32)
ph = arr(W1 + 1, 11, dtype=jnp.float32)
wss = jnp.ones((S,), jnp.float32)
bench("istft S=115200",
      lambda s, p: istft(s, p, window, wss, 20, 5), spec, ph)
har = arr(S, dtype=jnp.float32)
bench("stft S=115200", lambda h: stft(h, window, 20, 5)[0], har)

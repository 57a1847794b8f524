"""AOT-export cache: skip per-process trace+lower of the big jitted graphs.

The XLA persistent compile cache makes *compiles* warm across processes, but
each new process still pays Python tracing + StableHLO lowering per (token,
frame) bucket — 30-60 s of host time for the Kokoro generation graph
(CLAUDE.md round-2 lever).  This cache serializes `jax.export` artifacts to
disk keyed by (function, static config, arg shapes, jax version, backend);
a warm process deserializes the lowered module in ~100 ms and goes straight
to the (persistently cached) XLA compile.

Fail-open by design: any export/deserialize problem falls back to the plain
jitted function.
"""

from __future__ import annotations

import hashlib
import logging
import os

logger = logging.getLogger(__name__)

_MEM: dict = {}


def cache_dir() -> str | None:
    if os.environ.get("TTS_TPU_NO_COMPILE_CACHE"):
        return None
    base = os.environ.get(
        "TTS_TPU_AOT_DIR",
        os.path.join(os.environ.get("JAX_CACHE_DIR",
                                    os.path.expanduser("~/.cache/tts_tpu_jax")),
                     "aot"))
    return base


_CODE_FP: str | None = None


def _code_fingerprint() -> str:
    """Hash of every .py in the tts_tpu package: a stale exported artifact
    from an older graph version must never be served after a code change
    (the export bakes in the traced computation, not just shapes)."""
    global _CODE_FP
    if _CODE_FP is None:
        import tts_tpu

        h = hashlib.sha256()
        pkg = os.path.dirname(tts_tpu.__file__)
        for root, _, files in sorted(os.walk(pkg)):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    with open(os.path.join(root, fn), "rb") as f:
                        h.update(f.read())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


def make_key(name: str, static_repr: str, args) -> str:
    """Public form of `_key` for callers that memoize (see `call_cached`)."""
    return _key(name, static_repr, args)


def _key(name: str, static_repr: str, args) -> str:
    import jax

    shapes = ",".join(
        f"{x.dtype}{list(x.shape)}" if hasattr(x, "shape") else repr(x)
        for x in jax.tree_util.tree_leaves(args))
    raw = "|".join([name, static_repr, shapes, jax.__version__,
                    jax.default_backend(), _code_fingerprint()])
    return name + "-" + hashlib.sha256(raw.encode()).hexdigest()[:16]


def call_cached(name: str, static_repr: str, jitted_fn, *args, key: str | None = None):
    """Call `jitted_fn(*args)` through the AOT cache.

    `jitted_fn` must be a jax.jit'd callable CLOSED OVER its static arguments
    (e.g. functools.partial over the jit with cfg/F bound); `args` are the
    dynamic arguments only.

    `key`: precomputed cache key (from `make_key` on the same name /
    static_repr / arg structure).  Computing the key walks the whole params
    pytree and formats every leaf — ~2 ms of host time per call on the
    Kokoro graph (measured) — so hot callers memoize it per bucket and pass
    it in; the key only depends on static config and arg SHAPES, which are
    fixed per (token, frame) bucket.
    """
    directory = cache_dir()
    if directory is None:
        return jitted_fn(*args)
    if key is None:
        key = _key(name, static_repr, args)
    fn = _MEM.get(key)
    if fn is None:
        import jax
        import jax.export

        path = os.path.join(directory, key + ".jaxexport")
        try:
            if os.path.exists(path):
                with open(path, "rb") as f:
                    exported = jax.export.deserialize(bytearray(f.read()))
            else:
                exported = jax.export.export(jitted_fn)(*args)
                os.makedirs(directory, exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(exported.serialize())
                os.replace(tmp, path)
            fn = jax.jit(exported.call)
            try:
                # dispatch through the AOT-Compiled object: the re-jitted
                # exported.call pays ~1 ms/call of python arg processing on
                # the hot path (tools/kokoro_micro_ab.py: direct jit 49.9 ms
                # p50 vs aot-wrapped 50.9); lower+compile replays the
                # StableHLO (no Python re-trace) and Compiled.__call__ is
                # the fast path.  Shapes are fixed per cache key.
                fn = fn.lower(*args).compile()
            except Exception:
                pass  # keep the plain re-jit wrapper
        except Exception as e:  # fail open
            logger.warning("aot cache unavailable for %s (%s); using plain jit",
                           name, e)
            fn = jitted_fn
        _MEM[key] = fn
    return fn(*args)

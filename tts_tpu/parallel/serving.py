"""Data-parallel request serving across chips (SURVEY §2.9(c)).

The reference's `--n-parallelism` runs share-nothing model replicas on CPU
threads (/root/reference/examples/server/server.cpp:225-321).  The TPU-native
equivalent: one runner replica committed per chip; the server routes each
request to a replica, so independent requests run on independent chips with
no collectives (request-level data parallelism).  Tensor parallelism
(runner_from_file(mesh=...)) composes orthogonally for models too big for
one chip.
"""

from __future__ import annotations

import jax


def _has_jax_array(val) -> bool:
    """True if any leaf of `val` (as a pytree) is a jax.Array."""
    try:
        leaves = jax.tree_util.tree_leaves(val)
    except Exception:
        return False
    return any(isinstance(x, jax.Array) for x in leaves)


def move_to_device(obj, device) -> None:
    """Commit every declared device attribute of `obj` onto `device`.

    Classes DECLARE their device state: `device_arrays` names attributes
    holding jax-array pytrees; `device_components` names nested objects
    (model/codec) that carry their own declarations.  After moving, any
    UNdeclared attribute that still contains a jax.Array raises — a new
    runner attribute can't silently stay pinned to the old chip.
    Committed params pin each replica's compute to its chip."""
    def move_tree(val):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, device) if isinstance(x, jax.Array) else x,
            val)

    arrays = getattr(obj, "device_arrays", ())
    components = getattr(obj, "device_components", ())
    for name in arrays:
        if getattr(obj, name, None) is not None:
            setattr(obj, name, move_tree(getattr(obj, name)))
    for name in components:
        if getattr(obj, name, None) is not None:
            move_to_device(getattr(obj, name), device)
    declared = set(arrays) | set(components)
    for name, val in vars(obj).items():
        if name not in declared and _has_jax_array(val):
            raise RuntimeError(
                f"{type(obj).__name__}.{name} holds jax arrays but is not in "
                f"device_arrays/device_components — declare it so replicas "
                f"are fully committed to their chip")


def load_replica(model_path: str, config, device):
    """Load a runner and commit its weights to `device`."""
    from tts_tpu.models.registry import runner_from_file

    runner = runner_from_file(model_path, config)
    move_to_device(runner, device)
    return runner


def serving_devices(n: int | None = None):
    """The devices to spread replicas over (all visible chips by default)."""
    devices = jax.devices()
    return devices[: n or len(devices)]

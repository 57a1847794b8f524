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


def load_replica(model_path: str, config, target):
    """Load a runner committed to `target`: a single Device (weights
    device_put there) or a Mesh (tensor-parallel placement via the model's
    make_tp_context — params arrive sharded, nothing to move afterwards)."""
    from jax.sharding import Mesh

    from tts_tpu.models.registry import runner_from_file

    if isinstance(target, Mesh):
        return runner_from_file(model_path, config, mesh=target)
    runner = runner_from_file(model_path, config)
    move_to_device(runner, target)
    return runner


def serving_devices(n: int | None = None):
    """The devices to spread replicas over (all visible chips by default)."""
    devices = jax.devices()
    return devices[: n or len(devices)]


def replica_meshes(tensor_parallel: int, n_replicas: int | None = None):
    """DP x TP composition (SURVEY §2.9(b)+(c)): partition the visible chips
    into disjoint ('tp',) meshes of `tensor_parallel` chips each — one mesh
    per replica, so request-level data parallelism routes across replicas
    while each replica's model shards across its own chips (collectives stay
    inside the group and ride ICI).  tensor_parallel=1 degrades to plain
    per-chip replicas."""
    import numpy as np
    from jax.sharding import Mesh

    tp = max(tensor_parallel, 1)
    if tp == 1:
        return serving_devices(n_replicas)
    devices = jax.devices()
    n_groups = len(devices) // tp
    if n_groups == 0:
        raise ValueError(
            f"tensor_parallel={tp} needs at least {tp} devices; "
            f"{len(devices)} visible")
    if n_replicas is not None:
        n_groups = min(n_groups, n_replicas)
    return [Mesh(np.asarray(devices[g * tp:(g + 1) * tp]), axis_names=("tp",))
            for g in range(n_groups)]

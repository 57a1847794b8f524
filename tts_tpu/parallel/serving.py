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


def move_to_device(obj, device) -> None:
    """Commit every jax array reachable from `obj`'s attributes (and the
    attributes of nested runner components like .model/.snac/.dac) onto
    `device`.  Committed params pin each replica's compute to its chip."""
    def move_tree(val):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, device) if isinstance(x, jax.Array) else x,
            val)

    for name, val in list(vars(obj).items()):
        if hasattr(val, "__dict__") and hasattr(val, "params"):
            move_to_device(val, device)      # nested component (model/codec)
        else:
            try:
                setattr(obj, name, move_tree(val))
            except (TypeError, ValueError):
                pass                          # non-pytree attribute


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

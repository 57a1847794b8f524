"""Device mesh construction — the parallelism substrate (SURVEY.md §2.9).

The reference has no distributed layer; on TPU the equivalents are
`jax.sharding.Mesh` axes:
  dp — data/batch parallel (replaces the server's --n-parallelism replicas)
  tp — tensor parallel (attention-head / MLP sharding for the 3B backbone)
Collectives ride ICI via XLA (psum/all-gather inserted by GSPMD).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    """Build a (dp, tp) mesh over the first `n_devices` devices.

    tp defaults to min(n_devices, 2) when n_devices > 1, else 1 — a sensible
    shape for both the 8-way CPU test mesh and small TPU slices.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    arr = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

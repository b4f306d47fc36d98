"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's ``torch.nn.DataParallel``
(``base/base_trainer.py:26-29``; the only parallelism the reference has):
a 1-D ``Mesh`` over all local devices with the global batch sharded along the
``data`` axis. Parameters and optimizer state are replicated; XLA inserts the
gradient ``all_reduce`` over ICI inside the jitted train step.

The axis name is kept abstract so multi-host meshes (data x model) slot in
without touching trainer code; ``make_mesh`` accepts any (axis, size) layout.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[Tuple[str, int]] = (("data", -1),),
) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    ``axes`` is a sequence of (name, size); one size may be -1 to absorb the
    remaining devices (like a reshape).
    """
    devices = jax.devices()[: n_devices or len(jax.devices())]
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    unknown = [i for i, s in enumerate(sizes) if s == -1]
    known = int(np.prod([s for s in sizes if s != -1]))
    if unknown:
        sizes[unknown[0]] = len(devices) // known
    grid = np.asarray(devices).reshape(sizes)
    return Mesh(grid, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Device-put a host batch with its leading dim sharded over the mesh.

    Leaves whose batch dimension is not divisible by the mesh (e.g. a final
    partial batch, or single-sample inference) are replicated instead — the
    computation still runs, just without data parallelism for that batch.
    """
    sharded = batch_sharding(mesh, axis)
    replicated = replicated_sharding(mesh)
    n = mesh.devices.size

    def put(x):
        fits = hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n == 0
        return jax.device_put(x, sharded if fits else replicated)

    return jax.tree_util.tree_map(put, batch)

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

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)
_warned_replicated = False


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
    # Divisibility is against the batch axis size only: on a 2-D mesh
    # (e.g. data x model) the batch is sharded over "data" alone and the
    # other axes replicate it.
    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

    def put(x):
        fits = hasattr(x, "shape") and x.ndim > 0 and x.shape[0] % n == 0
        if not fits and hasattr(x, "shape") and getattr(x, "ndim", 0) > 0:
            # A mis-sized global batch silently degrading to fully-replicated
            # compute is easy to miss; say so once per process.
            global _warned_replicated
            if not _warned_replicated:
                _warned_replicated = True
                logger.warning(
                    "shard_batch: leaf with batch dim %d is not divisible by "
                    "the %d-device mesh; replicating instead of sharding "
                    "(data parallelism disabled for such leaves).",
                    x.shape[0], n,
                )
        return jax.device_put(x, sharded if fits else replicated)

    return jax.tree_util.tree_map(put, batch)

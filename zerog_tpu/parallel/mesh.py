"""Device mesh helpers.

The reference's only parallelism is shared-memory rayon inside halo2_proofs
(SURVEY.md §2b "Intra-node parallelism"); the TPU-native counterpart is a
1-D device mesh over which the three hot kernels shard:

- MSM: points partitioned across devices, per-device window sums, combined
  with an all-gather + log-depth Jacobian fold (point addition is the
  reduction op, so a plain psum does not apply).
- NTT: four-step (Bailey) decomposition with an all-to-all transpose between
  the two local NTT stages.
- Quotient evaluation: row-sharded extended domain; rotations become
  ppermute halo exchanges.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_axis", "Mesh", "NamedSharding", "P"]

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (AXIS,))


def shard_axis(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = AXIS
    return NamedSharding(mesh, P(*spec))

"""Device-mesh construction and swarm-axis sharding.

The scaling model (SURVEY §5/§7): swarms are embarrassingly parallel — the
reference farms them out as OS processes (reference
example/1czy/execution.sh:21-24); here they shard across the ``swarm`` axis
of a ``jax.sharding.Mesh`` with the scoring parameters replicated.  The
``atoms`` mesh axis additionally shards the receptor-atom dimension of the
pairwise energy for complexes whose pair matrix exceeds one chip (the
context-parallel analogue), combining partials with psum/pmax collectives
(parallel.sharded).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SWARM_AXIS = "swarm"
ATOM_AXIS = "atoms"


def make_mesh(n_swarm: Optional[int] = None, n_atoms: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (swarm, atoms) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_swarm is None:
        n_swarm = len(devices) // n_atoms
    if n_swarm * n_atoms != len(devices):
        devices = devices[: n_swarm * n_atoms]
    grid = np.asarray(devices).reshape(n_swarm, n_atoms)
    return Mesh(grid, (SWARM_AXIS, ATOM_AXIS))


def swarm_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for per-swarm batched state/randoms."""
    return NamedSharding(mesh, P(SWARM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_swarm_states(mesh: Mesh, tree):
    """Place a pytree with leading swarm axis onto the mesh (sharded over
    SWARM_AXIS, replicated over ATOM_AXIS)."""
    sh = swarm_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate_params(mesh: Mesh, params):
    """Replicate scoring parameters on every device of the mesh."""
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if x is not None else None, params)

"""lightdock_tpu — a TPU-native macromolecular docking framework.

A from-scratch JAX/XLA/Pallas implementation of Glowworm Swarm Optimization
docking with DFIRE / DNA / PYDOCK scoring, feature-compatible with
LightDock-Rust (the reference engine) but architected for TPU: all
glowworms of a swarm are batched on-device, the 100-step GSO loop runs
under ``jax.lax.scan``, pairwise energies are evaluated by tiled kernels,
and swarms shard across a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401

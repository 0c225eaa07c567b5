"""Device-mesh sharding: the framework's "communication backend".

The reference has no distributed backend at all (SURVEY.md §2.5) — multi-GPU
means independent processes. Here data-parallelism over particles is
first-class: a 1-D mesh over all local devices, trajectories sharded on the
``data`` axis, parameters replicated. Under jit, XLA inserts the single
collective this workload needs (a psum for the loss/grad mean) over ICI.

The same code path runs on 1 chip, a v5e-8 slice, or the 8-device virtual
CPU mesh used in tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

data_axis = "data"


def get_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (data_axis,))


def shard_batch(x, mesh: Mesh):
    """Place a pytree of (batch, ...) arrays with the batch axis split over
    the data axis of the mesh."""
    sharding = NamedSharding(mesh, P(data_axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), x)


def replicate(x, mesh: Mesh):
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), x)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def constrain_batch(x, mesh: Mesh | None):
    """Inside-jit sharding constraint: split the leading (particle) axis over
    the data axis. Without this, a batch generated under jit from a replicated
    PRNG key inherits replicated sharding and every device redundantly
    simulates the FULL batch. No-op on a 1-device mesh or when the batch does
    not divide the mesh (tiny smoke batches)."""
    if mesh is None or mesh.devices.size <= 1 or x.shape[0] % mesh.devices.size:
        return x
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""Chain-parallel execution over a TPU mesh.

The reference's only parallelism is single-process chain vectorization
(SURVEY.md section 2.5); the TPU-native scaling axis is the same chain
dimension *sharded over devices*: chain states live as ``P('chains')`` arrays,
every kernel step is elementwise/batched over chains so XLA partitions it
for free, and the only cross-device traffic is the all-reduce of the scalar
statistics / moment accumulators (``psum`` over ICI) plus any cross-chain
reductions the tuning path needs (``jnp.var`` over the chain axis).

No explicit collectives are written here: the driver's jitted chunk runners
consume whatever sharding their inputs carry, and GSPMD inserts the
reductions. ``sharded_sample`` is the convenience wrapper that places the
initial state and lets everything downstream follow.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chain_mesh(n_devices: Optional[int] = None, axis_name: str = "chains") -> Mesh:
    """1-D mesh over (the first n) local devices; chain axis sharded over it."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # silently truncating would run at less parallelism than the
            # caller configured, with downstream divisibility checks
            # validating against the wrong axis size
            raise ValueError(
                f"requested n_devices={n_devices} but only {len(devices)} "
                f"devices are available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_chains(x, mesh: Mesh, axis_name: str = "chains"):
    """Place `(n_chains, ...)` with the chain axis sharded over the mesh."""
    x = jax.numpy.asarray(x)
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. flow/kernel params) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(jax.numpy.asarray(a), sharding), tree)


def constrain_chains(x, mesh: Mesh, axis_name: str = "chains"):
    """In-jit sharding constraint pinning the chain axis to the mesh."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def sharded_sample(sampler, x0, mesh: Optional[Mesh] = None, **kwargs):
    """Run ``sampler.sample`` with chains sharded over ``mesh``.

    The chain axis of ``x0`` must divide the mesh size. All driver scan
    carries inherit the sharding; statistics accumulators (event-shaped sums,
    scalar counters) resolve to replicated values via GSPMD all-reduces.
    """
    if mesh is None:
        mesh = chain_mesh()
    # Chains shard over the mesh's FIRST axis (whatever its name): check
    # divisibility against that axis size, not the total device count — a
    # (2, 4) ('chains', 'data') mesh accepts n_chains=6.
    axis_name = mesh.axis_names[0]
    axis_size = mesh.shape[axis_name]
    n_chains = np.asarray(x0).shape[0]
    if n_chains % axis_size != 0:
        raise ValueError(
            f"n_chains={n_chains} must be divisible by the '{axis_name}' "
            f"mesh axis size {axis_size}"
        )
    x0_sharded = shard_chains(x0, mesh, axis_name=axis_name)
    return sampler.sample(x0_sharded, **kwargs)

"""Device-mesh parallelism for rendering.

Path tracing is embarrassingly parallel in samples, so the scaling recipe
(SURVEY.md §5) is: replicate the scene to every chip, shard the *sample* axis
over the mesh, keep a per-device partial film, and all-reduce the film once
at development time. This replaces the reference's crossbeam thread pool +
CAS film (renderer/mod.rs:120-194, film.rs:145-162) with ICI collectives and
deterministic per-device accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "samples") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def device_film_buffers(film, mesh: Mesh):
    """Per-device partial film: [D, H, W, B], sharded along the mesh axis."""
    d = mesh.devices.size
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis))
    shape = (d, film.height, film.width, film.bins)
    acc = jax.device_put(jnp.zeros(shape, jnp.float32), sharding)
    wt = jax.device_put(jnp.zeros(shape, jnp.float32), sharding)
    return acc, wt


def sharded_render_step(step_fn, mesh: Mesh):
    """Lift a single-device render step (acc, wt, key, data) -> (acc, wt)
    onto the mesh: each device advances its own film shard with its own RNG
    key; the scene data pytree is replicated. One call renders D samples
    (one per device)."""
    axis = mesh.axis_names[0]

    def per_device(acc, wt, keys, data):
        acc2, wt2 = step_fn(acc[0], wt[0], keys[0], data)
        return acc2[None], wt2[None]

    mapped = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def step_keys(key, n_devices: int, step_index: int):
    """Distinct per-device RNG keys for one sharded step."""
    base = jax.random.fold_in(key, step_index)
    return jax.random.split(base, n_devices)


@jax.jit
def merge_films(acc, wt):
    """Reduce per-device film shards [D, H, W, B] -> [H, W, B].

    When the inputs are sharded along D, XLA lowers this to an ICI
    all-reduce; the result is the replicated full film."""
    return acc.sum(axis=0), wt.sum(axis=0)

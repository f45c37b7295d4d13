"""Device-mesh construction for data-parallel training.

TPU-native replacement of the reference's DDP process groups
(reference: scripts/run.py:84-89): instead of NCCL/Gloo process groups,
parallelism is a compile-time property — a `jax.sharding.Mesh` over which
the jitted train step is partitioned. Gradient reduction and the
samples-per-ray scalar agreement (reference: deblur_e_nerf.py:1269-1272)
become XLA collectives over ICI inserted by the partitioner.
"""

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
REPLICA_AXIS = "replica"


def make_mesh(devices=None, n_devices=None):
    """A 1-D data-parallel mesh over ICI.

    Args:
        devices: explicit device list; defaults to all local devices.
        n_devices: optional cap on the number of devices used.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_multislice_mesh(n_replicas, devices=None, n_devices=None):
    """A 2-D ('replica', 'data') mesh: the reference's multi-node DDP
    analog (reference: scripts/run.py num_nodes x gpus). The outer
    'replica' axis maps across slices/hosts (DCN), the inner 'data' axis
    within a slice (ICI); the batch shards over BOTH axes, so gradient
    reduction decomposes into an ICI psum + a DCN psum — the layout
    jax/XLA exploits when device order follows slice locality
    (jax.devices() ordering).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % n_replicas != 0:
        raise ValueError(
            f"{n} devices do not divide into {n_replicas} replicas"
        )
    grid = np.asarray(devices).reshape(n_replicas, n // n_replicas)
    return Mesh(grid, (REPLICA_AXIS, DATA_AXIS))


def batch_axes(mesh):
    """The mesh axes the event batch shards over (all of them)."""
    return tuple(mesh.axis_names)

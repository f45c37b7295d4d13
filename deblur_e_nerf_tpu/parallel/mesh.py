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

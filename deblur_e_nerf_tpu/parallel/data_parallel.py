"""Data-parallel training step: jit-partitioned over a device mesh.

The reference's data parallelism is PyTorch DDP (per-process replicas,
NCCL gradient allreduce, an explicit `all_gather` to agree on the dynamic
batch size; reference: scripts/run.py:84-89, deblur_e_nerf.py:1269-1272).
The TPU-native design is a single SPMD program: the event batch is sharded
over the mesh's `data` axis, parameters/optimizer/occupancy state are
replicated, and the partitioner inserts the gradient psum and the global
reductions behind the loss/metric means. Batch-size agreement is exact by
construction — every metric is already a global reduction.
"""

from jax.sharding import NamedSharding, PartitionSpec as P

import jax
import jax.numpy as jnp

from ..training import step as step_lib
from .mesh import DATA_AXIS, batch_axes


def batch_shardings(mesh, batch_like):
    """Leading-axis sharding (over ALL mesh axes) for every leaf of an
    event batch — P(('data',)) on a 1-D mesh, P(('replica', 'data')) on
    a multi-slice mesh."""
    s = NamedSharding(mesh, P(batch_axes(mesh)))
    return {k: s for k in batch_like}


def shard_batch(mesh, batch, force_global_build=False):
    """Place a host batch onto the mesh, leading axis over all axes.

    Single-process (one host driving every mesh device): a plain
    `device_put`. Multi-process (multislice / multi-host meshes, where
    each process only addresses its local devices): every host runs the
    SAME `EventBatcher` stream (identical seed -> identical global
    batch, the design invariant of `training/pipeline.py`), and the
    global array is assembled per-process from the host-local rows via
    `jax.make_array_from_callback` — the runtime pulls from each
    callback only the shards addressable on that process. This is the
    host-side half of the reference's DDP data feeding
    (data/datamodule.py:85-91) without any cross-host traffic.

    `force_global_build` exercises the multi-process assembly path on a
    single process (tests).
    """
    sharding = NamedSharding(mesh, P(batch_axes(mesh)))
    if jax.process_count() == 1 and not force_global_build:
        return jax.device_put(batch, sharding)
    import numpy as np

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return {k: put(v) for k, v in batch.items()}


def replicate(mesh, tree):
    """Fully replicate a pytree over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_sharded_train_step(model, consts, tx, sc, loss_config, mesh,
                            trainable_mask=None):
    """Data-parallel version of `training.step.make_train_step`.

    Returns step_fn(state, batch, key) -> (state, metrics) compiled over
    `mesh`: batch leaves sharded `P('data')` on their leading axis,
    everything else replicated. The event-batch capacity must be divisible
    by the mesh size.
    """
    step_fn = step_lib.make_train_step(
        model, consts, tx, sc, loss_config,
        trainable_mask=trainable_mask,
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(batch_axes(mesh)))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )


def make_sharded_occ_update(model, consts, mesh, step_scale=1):
    """Replicated occupancy-grid EMA update over the mesh.

    The grid is small (resolution^3 <= 128^3) and its update is cheap
    relative to a train step (reference: models/nerf.py:170-204 runs it
    every n=16 opt steps), so it stays replicated rather than sharded.
    """
    from ..models import nerf_model

    repl = NamedSharding(mesh, P())

    def occ_update(params, occ_state, key, step):
        # `step` is the OPT step; the curriculum counts micro-steps, so
        # scale by the gradient-accumulation factor
        return nerf_model.update_occupancy(
            model, params, occ_state, key,
            consts["trajectory"].T_wc_position, step,
            level_mask=nerf_model.level_mask_for_step(
                model, step * jnp.asarray(step_scale, jnp.int32)
            ),
        )

    return jax.jit(
        occ_update,
        in_shardings=(repl, repl, repl, repl),
        out_shardings=repl,
    )

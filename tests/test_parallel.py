"""Data-parallel train step on a virtual 8-device CPU mesh.

Validates the SPMD analog of the reference's DDP training
(reference: scripts/run.py:84-89): batch sharded over the `data` axis,
replicated params, partitioner-inserted gradient reduction. Checks that
the sharded step is numerically consistent with the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.data import events as events_data
from deblur_e_nerf_tpu.data import synthetic
from deblur_e_nerf_tpu.models import nerf_model
from deblur_e_nerf_tpu.parallel import data_parallel, mesh as mesh_lib
from deblur_e_nerf_tpu.training import (optim, pipeline, setup,
                                        step as step_lib)
from deblur_e_nerf_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def dp_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_ds")
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=20_000,
        num_poses=21,
    )
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.model.pixel_bandwidth.it_sample_size = 4
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    bundle, params = setup.build(
        config, str(root), sample_budget=4096, batch_capacity=64,
    )
    tx, _ = optim.build(
        params, config.optimizer, config.lr_scheduler,
        float(config.loss.weight.nerf_mlp_weight_decay),
        float(bundle.consts["refractory_period"]
              ["max_refractory_period"]),
        steps_per_epoch=10,
        model_configs={
            c: config.model[c]
            for c in ("contrast_threshold", "refractory_period",
                      "pixel_bandwidth", "nerf")
        },
    )
    return root, bundle, params, tx


def _make_state(bundle, params, tx):
    occ_state = nerf_model.init_occupancy(bundle.model)
    occ_state = occ_state._replace(
        binary=jnp.ones_like(occ_state.binary)
    )
    return step_lib.TrainState(
        params=params, opt_state=tx.init(params), occ_state=occ_state,
        step=jnp.asarray(0, jnp.int32),
    )


def test_mesh_construction():
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == (mesh_lib.DATA_AXIS,)


@pytest.mark.slow
def test_sharded_step_matches_single_device(dp_setup):
    root, bundle, params, tx = dp_setup
    mesh = mesh_lib.make_mesh()
    assert 64 % mesh.devices.size == 0

    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=64, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batcher.next_batch(64).items()}
    key = jax.random.PRNGKey(7)

    # single-device reference step
    single_fn = jax.jit(step_lib.make_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config,
    ))
    state0 = _make_state(bundle, params, tx)
    ref_state, ref_metrics = single_fn(state0, batch, key)

    # sharded step over the mesh
    sharded_fn = data_parallel.make_sharded_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config, mesh,
    )
    state1 = data_parallel.replicate(mesh, _make_state(bundle, params, tx))
    sharded_batch = data_parallel.shard_batch(mesh, batch)
    dp_state, dp_metrics = sharded_fn(state1, sharded_batch, key)

    assert np.isfinite(float(dp_metrics["loss"]))
    # same program, same key: global reductions must agree closely
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(dp_metrics["batch_size"]),
        float(ref_metrics["batch_size"]),
    )
    # params updated identically (replicated output)
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params["nerf"])
    dp_leaves = jax.tree_util.tree_leaves(dp_state.params["nerf"])
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_sharded_occ_update(dp_setup):
    _, bundle, params, _ = dp_setup
    mesh = mesh_lib.make_mesh()
    occ_fn = data_parallel.make_sharded_occ_update(
        bundle.model, bundle.consts, mesh
    )
    occ_state = nerf_model.init_occupancy(bundle.model)
    out = occ_fn(
        data_parallel.replicate(mesh, params["nerf"]),
        data_parallel.replicate(mesh, occ_state),
        jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32),
    )
    rate = float(jnp.mean(out.binary))
    assert 0.0 < rate <= 1.0


@pytest.mark.slow
def test_trainer_mesh_path(tmp_path, dp_setup):
    """The user-facing Trainer trains end-to-end over the CPU mesh
    (run.py --mesh analog; VERDICT round-1 item 4)."""
    root, _, _, _ = dp_setup
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.model.pixel_bandwidth.it_sample_size = 4
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 2
    config.data.train_init_eff_batch_size = 64
    from deblur_e_nerf_tpu.training.trainer import Trainer
    tr = Trainer(config, str(tmp_path / "log"), batch_capacity=64,
                 sample_budget=4096, mesh_devices=8)
    assert tr.mesh is not None and tr.mesh.devices.size == 8
    tr.train()  # raises on non-finite loss
    assert tr.global_step == 2


@pytest.mark.slow
def test_multislice_mesh_numerics(dp_setup):
    """2-D ('replica', 'data') mesh (the reference num_nodes analog)
    matches the single-device step numerically."""
    root, bundle, params, tx = dp_setup
    mesh = mesh_lib.make_multislice_mesh(2)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)
    step_single = jax.jit(step_lib.make_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config,
    ))
    step_mesh = data_parallel.make_sharded_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config, mesh,
    )
    state = _make_state(bundle, params, tx)
    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=64, seed=3)
    batch = {k: jnp.asarray(v) for k, v in batcher.next_batch(64).items()}
    key = jax.random.PRNGKey(7)

    _, m_ref = step_single(state, batch, key)
    _, m_dp = step_mesh(
        data_parallel.replicate(mesh, state),
        data_parallel.shard_batch(mesh, batch), key,
    )
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_dp["loss"]), rtol=1e-4
    )


def test_multiprocess_batch_assembly_matches_device_put(dp_setup):
    """The multi-host feeding path (make_array_from_callback assembly,
    used when jax.process_count() > 1) must produce the same sharded
    global batch as the single-controller device_put path."""
    root, bundle, params, tx = dp_setup
    from deblur_e_nerf_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh(n_devices=8)
    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=64, seed=3,
                                    interleave=8)
    batch = batcher.next_batch(40)
    a = data_parallel.shard_batch(mesh, batch)
    b = data_parallel.shard_batch(mesh, batch, force_global_build=True)
    for k in batch:
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]),
                                      np.asarray(b[k]))


@pytest.mark.slow
def test_sharded_step_with_occlusion_prepass(dp_setup):
    """The prepass's per-shard compaction must be SPMD-clean: batch
    sharded over `data`, every cumsum/scatter shard-local, and the
    sharded loss must agree with the single-device prepass step."""
    root, _, _, _ = dp_setup
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.model.pixel_bandwidth.it_sample_size = 4
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.model.nerf["occlusion_prepass_div"] = 2
    bundle, params = setup.build(
        config, str(root), sample_budget=4096, batch_capacity=64,
    )
    assert bundle.model.render_config.prepass_div == 2
    tx, _ = optim.build(
        params, config.optimizer, config.lr_scheduler,
        float(config.loss.weight.nerf_mlp_weight_decay),
        float(bundle.consts["refractory_period"]
              ["max_refractory_period"]),
        steps_per_epoch=10,
        model_configs={
            c: config.model[c]
            for c in ("contrast_threshold", "refractory_period",
                      "pixel_bandwidth", "nerf")
        },
    )
    mesh = mesh_lib.make_mesh()
    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=64, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batcher.next_batch(64).items()}
    key = jax.random.PRNGKey(7)

    single_fn = jax.jit(step_lib.make_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config,
    ))
    _, ref_metrics = single_fn(_make_state(bundle, params, tx), batch, key)

    sharded_fn = data_parallel.make_sharded_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config, mesh,
    )
    state1 = data_parallel.replicate(mesh, _make_state(bundle, params, tx))
    dp_state, dp_metrics = sharded_fn(
        state1, data_parallel.shard_batch(mesh, batch), key
    )
    assert np.isfinite(float(dp_metrics["loss"]))
    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )

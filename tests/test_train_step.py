"""End-to-end training step on a tiny synthetic dataset (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.data import events as events_data
from deblur_e_nerf_tpu.data import synthetic
from deblur_e_nerf_tpu.models import nerf_model
from deblur_e_nerf_tpu.training import (optim, pipeline, setup,
                                        step as step_lib)
from deblur_e_nerf_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("tiny_ds")
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=20_000,
        num_poses=21,
    )
    config = load_config("/root/reference/configs/train/synthetic.yaml")
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
    return root, config, bundle, params


def test_setup_shapes(tiny_setup):
    _, config, bundle, params = tiny_setup
    assert "nerf" in params and "field" in params["nerf"]
    assert "render_bkgd_raw" in params["nerf"]  # alpha_over_white_bg
    assert "pixel_bandwidth" in params
    assert bundle.static_config.it_sample_size == 4
    assert bundle.model.radiance_dim == 1  # monochrome


@pytest.mark.slow
def test_occupancy_update_and_train_steps(tiny_setup):
    root, config, bundle, params = tiny_setup
    sc = bundle.static_config
    model = bundle.model

    tx, trainable = optim.build(
        params, config.optimizer, config.lr_scheduler,
        float(config.loss.weight.nerf_mlp_weight_decay),
        float(bundle.consts["refractory_period"]
              ["max_refractory_period"]),
        steps_per_epoch=10,
        model_configs={
            "contrast_threshold": config.model.contrast_threshold,
            "refractory_period": config.model.refractory_period,
            "pixel_bandwidth": config.model.pixel_bandwidth,
            "nerf": config.model.nerf,
        },
    )
    opt_state = tx.init(params)
    occ_state = nerf_model.init_occupancy(model)

    # occupancy warmup update marks cells occupied
    key = jax.random.PRNGKey(0)
    occ_state = nerf_model.update_occupancy(
        model, params["nerf"], occ_state, key,
        bundle.consts["trajectory"].T_wc_position, jnp.asarray(0),
    )
    occ_rate = float(jnp.mean(occ_state.binary))
    assert 0.0 < occ_rate <= 1.0

    state = step_lib.TrainState(
        params=params, opt_state=opt_state, occ_state=occ_state,
        step=jnp.asarray(0, jnp.int32),
    )
    step_fn = jax.jit(step_lib.make_train_step(
        model, bundle.consts, tx, sc, bundle.loss_config
    ))

    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=64, seed=0)
    losses = []
    for i in range(3):
        batch = batcher.next_batch(48)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert float(metrics["mean_num_samples_per_ray"]) >= 0
        assert int(metrics["batch_size"]) == 48

    # params actually changed (hash table + bkgd at least)
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["nerf"], params["nerf"],
    )
    assert max(jax.tree_util.tree_leaves(delta)) > 0

    # frozen components did not move (synthetic.yaml freezes CT + tau + PB)
    for comp in ("contrast_threshold", "refractory_period",
                 "pixel_bandwidth"):
        same = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.all(a == b)),
            state.params[comp], params[comp],
        )
        assert all(jax.tree_util.tree_leaves(same)), comp


@pytest.mark.slow
def test_no_pixel_bandwidth_path(tiny_setup):
    root, config0, _, _ = tiny_setup
    config = load_config("/root/reference/configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    bundle, params = setup.build(
        config, str(root), sample_budget=4096, batch_capacity=32,
    )
    assert "pixel_bandwidth" not in params

    occ_state = nerf_model.init_occupancy(bundle.model)
    occ_state = occ_state._replace(
        binary=jnp.ones_like(occ_state.binary)
    )
    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=32, seed=0)
    batch = {
        k: jnp.asarray(v) for k, v in batcher.next_batch(32).items()
    }
    loss_value, metrics = step_lib.compute_loss(
        bundle.model, params, bundle.consts, occ_state, batch,
        jax.random.PRNGKey(0), bundle.static_config,
        bundle.loss_config,
    )
    assert np.isfinite(float(loss_value))


def test_table_row_decay_transform():
    """Decoupled row decay: fine rows shrink by lr*wd*param, coarse rows
    untouched, even with zero gradients (the Adam-swallowing failure mode
    of the loss-term L2 it replaces)."""
    p = {"t": jnp.ones((6, 2), jnp.float32)}
    td = optim._table_row_decay(
        start_row=4, wd=0.5, base_lr=0.1, milestones=[], gamma=1.0
    )
    state = td.init(p)
    zero = jax.tree_util.tree_map(jnp.zeros_like, p)
    upd, state = td.update(zero, state, p)
    np.testing.assert_allclose(np.asarray(upd["t"][:4]), 0.0)
    np.testing.assert_allclose(
        np.asarray(upd["t"][4:]), -0.1 * 0.5 * 1.0, rtol=1e-6
    )
    # milestone schedule scales the decay with the lr
    td2 = optim._table_row_decay(
        start_row=0, wd=0.5, base_lr=0.1, milestones=[1], gamma=0.1
    )
    s2 = td2.init(p)
    _, s2 = td2.update(zero, s2, p)          # count 0 -> 1
    upd2, _ = td2.update(zero, s2, p)        # past milestone
    np.testing.assert_allclose(
        np.asarray(upd2["t"]), -0.1 * 0.5 * 0.1, rtol=1e-6
    )


@pytest.mark.slow
def test_density_sparsity_prior(tiny_setup):
    """The fog loss is reported, positive (trunc-exp density > 0
    everywhere), and adds gradient pressure on the field."""
    root, config, bundle, params = tiny_setup
    occ_state = nerf_model.init_occupancy(bundle.model)
    occ_state = occ_state._replace(
        binary=jnp.ones_like(occ_state.binary)
    )
    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=64, seed=0)
    batch = {
        k: jnp.asarray(v) for k, v in batcher.next_batch(32).items()
    }
    sc = bundle.static_config._replace(
        loss_weight_sparsity=0.5, sparsity_samples=512
    )
    key = jax.random.PRNGKey(0)
    loss_on, metrics = step_lib.compute_loss(
        bundle.model, params, bundle.consts, occ_state, batch, key,
        sc, bundle.loss_config,
    )
    sparsity = float(metrics["loss_density_sparsity"])
    assert 0.0 < sparsity < 1.0
    loss_off, _ = step_lib.compute_loss(
        bundle.model, params, bundle.consts, occ_state, batch, key,
        bundle.static_config, bundle.loss_config,
    )
    np.testing.assert_allclose(
        float(loss_on), float(loss_off) + 0.5 * sparsity, rtol=1e-5
    )

    # the prior's gradient reaches the density parameters
    def fog_only(p):
        _, m = step_lib.compute_loss(
            bundle.model, p, bundle.consts, occ_state, batch, key,
            sc, bundle.loss_config,
        )
        return m["loss_density_sparsity"]

    g = jax.grad(fog_only)(params)
    assert float(jnp.max(jnp.abs(g["nerf"]["field"]["table"]))) > 0


def test_batch_controller_floor():
    """min_batch floors the active batch during samples/ray explosions
    (fog bursts); the default keeps the reference rule (floor 1,
    reference: deblur_e_nerf.py:1252-1308)."""
    from deblur_e_nerf_tpu.training import pipeline
    c = pipeline.BatchSizeController(
        target_ray_samples=2048, init_batch_size=256, capacity=1024,
        min_batch=64,
    )
    assert c.update(8.0) == 256       # 2048 / 8
    assert c.update(1000.0) == 64     # floored (reference rule gives 2)
    assert c.update(1.0) == 1024      # still capped at capacity
    d = pipeline.BatchSizeController(
        target_ray_samples=2048, init_batch_size=256, capacity=1024,
    )
    assert d.update(1000.0) == 2      # default == reference behavior


def test_sample_budget_margin(tiny_setup):
    """data.train_sample_budget_margin scales the DERIVED sample budget
    (eff x S x render slices); margin 1.0 is the reference-equivalent
    default sizing. Framework extension: the batch controller drives
    demand to exactly the unscaled budget, so margin is what keeps
    ray-to-ray variance from truncating (masked) rays every step."""
    import copy

    root, config, _, _ = tiny_setup
    cfg = copy.deepcopy(config)
    cfg.data.train_eff_ray_sample_batch_size = 256
    S = int(cfg.model.pixel_bandwidth.it_sample_size)
    b1, _ = setup.build(cfg, str(root))
    assert b1.model.render_config.sample_budget == 256 * S * 4
    cfg.data.train_sample_budget_margin = 1.5
    b2, _ = setup.build(cfg, str(root))
    assert b2.model.render_config.sample_budget == int(256 * S * 4 * 1.5)

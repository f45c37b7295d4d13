"""Model-family variants: vanilla-NeRF arch and Bayer color training."""

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


def tiny_config(root, arch="ngp"):
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.arch = arch
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.model.nerf.mlp.net_depth = 2
    config.model.nerf.mlp.net_width = 32
    config.model.nerf.mlp.net_width_condition = 16
    return config


def run_steps(root, config, n_steps=2):
    bundle, params = setup.build(
        config, str(root), sample_budget=4096, batch_capacity=32,
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
    occ_state = nerf_model.init_occupancy(bundle.model)
    occ_state = occ_state._replace(
        binary=jnp.ones_like(occ_state.binary)
    )
    state = step_lib.TrainState(
        params=params, opt_state=tx.init(params), occ_state=occ_state,
        step=jnp.asarray(0, jnp.int32),
    )
    step_fn = jax.jit(step_lib.make_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config,
    ))
    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(
        events, capacity=32, seed=0,
        has_bayer=bundle.static_config.has_bayer,
    )
    losses = []
    for i in range(n_steps):
        batch = {
            k: jnp.asarray(v) for k, v in batcher.next_batch(24).items()
        }
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    return bundle, losses


@pytest.mark.slow
def test_vanilla_nerf_arch_trains(tmp_path):
    root = tmp_path / "ds"
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=10_000,
        num_poses=11,
    )
    bundle, losses = run_steps(root, tiny_config(root, arch="mlp"))
    assert bundle.model.field.__class__.__name__ == "VanillaNeRFField"
    assert all(np.isfinite(v) for v in losses)


@pytest.mark.slow
def test_bayer_color_training(tmp_path):
    root = tmp_path / "ds"
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=10_000,
        num_poses=11, bayer=True,
    )
    config = tiny_config(root)
    bundle, losses = run_steps(root, config)
    assert bundle.static_config.has_bayer
    assert bundle.model.radiance_dim == 3
    events = events_data.EventDataset(str(root)).events
    assert "channel_idx" in events
    assert set(np.unique(events["channel_idx"])) <= {0, 1, 2}
    assert all(np.isfinite(v) for v in losses)

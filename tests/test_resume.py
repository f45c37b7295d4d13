"""Full crash-resume roundtrip through the Trainer."""

import os

import numpy as np
import pytest

from deblur_e_nerf_tpu.data import synthetic
from deblur_e_nerf_tpu.training.trainer import Trainer
from deblur_e_nerf_tpu.utils.config import load_config


def tiny_config(root):
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 2
    return config


def test_trainer_resume_roundtrip(tmp_path):
    root = tmp_path / "ds"
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=10_000,
        num_poses=11,
    )
    config = tiny_config(root)

    log_a = tmp_path / "log_a"
    tr = Trainer(config, str(log_a), batch_capacity=32,
                 sample_budget=2048)
    tr.train()
    ckpt = os.path.join(str(log_a), "checkpoints", "epoch_0000")
    assert os.path.exists(ckpt)
    assert os.path.isfile(
        os.path.join(str(log_a), "checkpoints", "config.yaml")
    )
    trained_params = tr.state.params

    # fresh trainer; resume restores params, optimizer, counters
    tr2 = Trainer(config, str(tmp_path / "log_b"), batch_capacity=32,
                  sample_budget=2048)
    last_epoch = tr2.resume(ckpt)
    assert last_epoch == 0
    assert tr2.global_step == 2
    assert int(tr2.state.step) == 2
    import jax
    for a, b in zip(
        jax.tree_util.tree_leaves(trained_params["nerf"]),
        jax.tree_util.tree_leaves(tr2.state.params["nerf"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed training continues without error
    tr2.train(start_epoch=last_epoch + 1)  # no epochs left: no-op
    tr2.max_epochs = 2
    tr2.train(start_epoch=last_epoch + 1)
    assert tr2.global_step == 4

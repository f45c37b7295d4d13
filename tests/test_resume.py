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


@pytest.mark.slow
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


def test_monitor_scores_survive_resume(tmp_path):
    """Monitored-checkpoint ranking state is rebuilt from the sidecar on
    resume: without it, _prune_checkpoints would forget (and then delete)
    the genuinely best pre-resume checkpoint (reference semantics:
    Lightning ModelCheckpoint keeps best-k across restarts,
    scripts/run.py:69-73)."""
    root = tmp_path / "ds"
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=10_000,
        num_poses=11,
    )
    config = tiny_config(root)
    config.checkpoint = {
        "monitor": "val/psnr", "mode": "max", "save_top_k": 1,
    }

    log = tmp_path / "log"
    tr = Trainer(config, str(log), batch_capacity=32, sample_budget=2048)
    ckpt_dir = os.path.join(str(log), "checkpoints")
    # simulate three monitored saves (no training needed for the
    # bookkeeping path under test)
    for name, score in [("epoch_0000", 14.5), ("epoch_0001", 16.2),
                        ("epoch_0002", 13.1)]:
        os.makedirs(os.path.join(ckpt_dir, name), exist_ok=True)
        tr._ckpt_scores[name] = score
    tr._persist_ckpt_scores()

    tr2 = Trainer(config, str(log), batch_capacity=32,
                  sample_budget=2048)
    assert tr2._ckpt_scores == {}
    tr2._load_ckpt_scores()
    assert tr2._ckpt_scores == {
        "epoch_0000": 14.5, "epoch_0001": 16.2, "epoch_0002": 13.1,
    }
    assert tr2.best_checkpoint == os.path.join(ckpt_dir, "epoch_0001")

    # pruning after resume keeps the pre-resume best (+ the latest for
    # crash-resume), not just post-resume epochs
    tr2._prune_checkpoints(1, monitor="val/psnr", mode="max")
    kept = sorted(d for d in os.listdir(ckpt_dir)
                  if d.startswith("epoch_"))
    assert kept == ["epoch_0001", "epoch_0002"]

    # deleted checkpoints drop out of a later load
    tr3 = Trainer(config, str(log), batch_capacity=32,
                  sample_budget=2048)
    tr3._load_ckpt_scores()
    assert set(tr3._ckpt_scores) == {"epoch_0001", "epoch_0002"}

"""scripts/run.py end-to-end: train then val, metrics.yaml artifact."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from deblur_e_nerf_tpu.data import synthetic
from deblur_e_nerf_tpu.utils.config import load_config, save_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_run_cli_train_then_val(tmp_path):
    root = tmp_path / "ds"
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_poses=21,
        num_frames=60,
    )
    config = load_config(os.path.join(REPO,
                                      "configs/train/synthetic.yaml"))
    config.data.dataset_directory = str(root)
    config.data.train_init_eff_batch_size = 24
    config.data.train_eff_ray_sample_batch_size = 2048
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 1
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.model.nerf.test_chunk_size = 256
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 2
    config.trainer.check_val_every_n_epoch = 1  # in-training eval: the
    # val-stage restore below must reproduce its PSNR exactly
    config_path = tmp_path / "config.yaml"
    save_config(config, str(config_path))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    log_dir = tmp_path / "log"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run.py"), "train",
         str(config_path), "--log-dir", str(log_dir),
         "--platform", "cpu",
         "--batch-capacity", "32", "--sample-budget", "2048",
         "--max-eval-images", "1"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "training finished" in out.stdout
    assert (log_dir / "config.yaml").exists()
    ckpt = log_dir / "checkpoints" / "epoch_0000"
    assert ckpt.exists()
    import re
    m = re.search(r"'psnr': ([-+0-9.e]+|nan|inf)", out.stdout)
    assert m, out.stdout
    train_eval_psnr = float(m.group(1))
    assert np.isfinite(train_eval_psnr)

    # the checkpointed occupancy grid must have occupied cells — a blank
    # grid renders pure background and silently passes finiteness checks
    # (round-1 eval-restore bug)
    import orbax.checkpoint as ocp
    restored = ocp.StandardCheckpointer().restore(str(ckpt))
    assert np.asarray(restored["occ_state"]["binary"]).sum() > 0

    # val stage with the trained NeRF selectively restored
    config.model.checkpoint_filepath = str(ckpt)
    config.model.nerf.load_state_dict = True
    val_config_path = tmp_path / "val_config.yaml"
    save_config(config, str(val_config_path))
    val_log = tmp_path / "val_log"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run.py"), "val",
         str(val_config_path), "--log-dir", str(val_log),
         "--platform", "cpu",
         "--batch-capacity", "32", "--sample-budget", "2048",
         "--max-eval-images", "1"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    with open(val_log / "metrics.yaml") as f:
        metrics = yaml.safe_load(f)
    assert np.isfinite(metrics[0]["psnr"])
    assert np.isfinite(metrics[0]["ssim"])
    # eval-restore parity: val on the restored checkpoint must reproduce
    # the in-training eval of the same state (deterministic eval render +
    # correction), catching any silently-dropped restore
    assert abs(metrics[0]["psnr"] - train_eval_psnr) < 1e-3 \
        * max(1.0, abs(train_eval_psnr)), (
            metrics[0]["psnr"], train_eval_psnr
        )

"""Trainer loop semantics: accumulation-window batch sizing, occupancy
warmup cadence, and eval_target handling.

Reference semantics under test:
  - batch-size refresh only at accumulation boundaries
    (reference: deblur_e_nerf.py:1286-1291),
  - occupancy grid updates at EVERY opt step during warmup, every n-th
    afterwards (reference: nerfacc OccupancyGrid.every_n_step via
    models/nerf.py:200-204),
  - eval_target {event_view} -> train views, {novel_view} -> stage views,
    both evaluated when both are requested, unsupported values raise
    (reference: data/datamodule.py:107-118).
"""

import pytest

from deblur_e_nerf_tpu.data import synthetic
from deblur_e_nerf_tpu.training.trainer import Trainer
from deblur_e_nerf_tpu.utils.config import load_config


def tiny_config(root):
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.data.train_init_eff_batch_size = 24
    config.data.train_eff_ray_sample_batch_size = 512
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.occ_grid.n = 4
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.model.nerf.test_chunk_size = 256
    return config


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=10_000,
        num_poses=11,
    )
    return root


@pytest.mark.slow
def test_accumulation_window_constant_batch_and_warmup_occ(tmp_path,
                                                           dataset):
    config = tiny_config(dataset)
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 12
    config.trainer.accumulate_grad_batches = 2
    tr = Trainer(config, str(tmp_path / "log"), batch_capacity=32,
                 sample_budget=2048)

    active_log = []
    orig_next = tr.batcher.next_batch

    def logging_next(active):
        active_log.append(int(active))
        return orig_next(active)

    tr.batcher.next_batch = logging_next

    occ_steps = []
    orig_occ = tr.occ_update_fn

    def logging_occ(params, occ_state, key, step):
        occ_steps.append(int(step))
        return orig_occ(params, occ_state, key, step)

    tr.occ_update_fn = logging_occ
    tr.train()

    # micro-batches within one accumulation window are equal-sized
    assert len(active_log) == 12
    for w in range(0, 12, 2):
        assert active_log[w] == active_log[w + 1], active_log

    # warmup (opt steps 0,1): every opt step; then every n=4th (opt step 4)
    assert occ_steps == [0, 1, 4], occ_steps


def test_eval_target_both_and_invalid(tmp_path, dataset):
    config = tiny_config(dataset)
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 1
    config.eval_target = ["event_view", "novel_view"]
    tr = Trainer(config, str(tmp_path / "log"), batch_capacity=32,
                 sample_budget=2048)
    metric = tr.evaluate("val", epoch=0, max_images=1)
    assert "event_view/psnr" in metric
    assert "novel_view/psnr" in metric

    targets, _ = tr.build_evaluator("val")
    # event_view evaluates TRAIN views, novel_view the stage views
    assert set(targets) == {"event_view", "novel_view"}

    config.eval_target = ["event_view", "bogus_view"]
    tr.config = config
    with pytest.raises(NotImplementedError):
        tr.build_evaluator("val")


def test_nonfinite_loss_streak_semantics(tmp_path, dataset):
    """Isolated non-finite losses must not terminate training (the
    optimizer skips them via apply_if_finite); only a sustained streak
    raises. A finite step resets the streak."""
    config = tiny_config(dataset)
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 1
    tr = Trainer(config, str(tmp_path / "log"), batch_capacity=32,
                 sample_budget=2048)

    def metrics(loss):
        return {"loss": loss, "mean_num_samples_per_ray": 4.0}

    # 24 consecutive non-finite: tolerated
    for step in range(24):
        tr._consume_metrics(step, metrics(float("nan")))
    assert tr._nonfinite_streak == 24
    # a finite step resets
    tr._consume_metrics(24, metrics(0.5))
    assert tr._nonfinite_streak == 0
    # the 25th consecutive raises
    for step in range(24):
        tr._consume_metrics(25 + step, metrics(float("nan")))
    with pytest.raises(FloatingPointError):
        tr._consume_metrics(49, metrics(float("inf")))


def test_prune_checkpoints_monitor_semantics(tmp_path):
    """config.checkpoint with `monitor` set keeps the save_top_k BEST
    scored checkpoints (mode min/max) plus the latest epoch for resume,
    and tracks best_checkpoint (reference: Lightning ModelCheckpoint
    kwargs, scripts/run.py:69-73)."""
    import os

    tr = Trainer.__new__(Trainer)
    tr.log_dir = str(tmp_path)
    tr._ckpt_scores = {}
    tr.best_checkpoint = None
    ckpt_dir = tmp_path / "checkpoints"
    for e, score in enumerate([0.5, 0.2, 0.9, 0.4]):
        (ckpt_dir / f"epoch_{e:04d}").mkdir(parents=True)
        tr._ckpt_scores[f"epoch_{e:04d}"] = score

    # mode=min, k=1: best is epoch_0001 (0.2); latest (0003) kept for resume
    tr._prune_checkpoints(1, monitor="val/loss", mode="min")
    kept = sorted(d for d in os.listdir(ckpt_dir)
                  if d.startswith("epoch_"))
    assert kept == ["epoch_0001", "epoch_0003"], kept
    assert tr.best_checkpoint.endswith("epoch_0001")
    # pruned entries drop out of the score table
    assert set(tr._ckpt_scores) == {"epoch_0001", "epoch_0003"}

    # mode=max flips the ranking
    tr2 = Trainer.__new__(Trainer)
    tr2.log_dir = str(tmp_path / "b")
    tr2._ckpt_scores = {}
    tr2.best_checkpoint = None
    ckpt_dir2 = tmp_path / "b" / "checkpoints"
    for e, score in enumerate([15.0, 22.0, 18.0]):
        (ckpt_dir2 / f"epoch_{e:04d}").mkdir(parents=True)
        tr2._ckpt_scores[f"epoch_{e:04d}"] = score
    tr2._prune_checkpoints(1, monitor="val/psnr", mode="max")
    assert sorted(d for d in os.listdir(ckpt_dir2)
                  if d.startswith("epoch_")) == [
        "epoch_0001", "epoch_0002"]
    assert tr2.best_checkpoint.endswith("epoch_0001")

    # monitor-less recency semantics unchanged; k<=0 keeps all
    tr3 = Trainer.__new__(Trainer)
    tr3.log_dir = str(tmp_path / "c")
    tr3._ckpt_scores = {}
    tr3.best_checkpoint = None
    ckpt_dir3 = tmp_path / "c" / "checkpoints"
    for e in range(4):
        (ckpt_dir3 / f"epoch_{e:04d}").mkdir(parents=True)
    tr3._prune_checkpoints(-1)
    assert len(os.listdir(ckpt_dir3)) == 4
    tr3._prune_checkpoints(2)
    assert sorted(d for d in os.listdir(ckpt_dir3)
                  if d.startswith("epoch_")) == [
        "epoch_0002", "epoch_0003"]

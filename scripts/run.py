#!/usr/bin/env python
"""Run CLI: {train, val, test} <config.yaml> [overrides].

Mirrors the reference entry point (reference: scripts/run.py:17-147):
loads the YAML config, stamps the git HEAD hash, seeds RNGs, builds the
trainer, copies the config into the log dir, and dumps metrics.yaml for
val/test stages.
"""

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from deblur_e_nerf_tpu.utils.config import load_config, save_config  # noqa
from deblur_e_nerf_tpu.training.trainer import Trainer  # noqa

STAGES = ("train", "val", "test")
METRICS_FILENAME = "metrics.yaml"


def git_head_hash():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL,
        ).decode().strip()
    except Exception:
        return "unknown"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("stage", choices=STAGES)
    parser.add_argument("config")
    parser.add_argument("--log-dir", default=None)
    parser.add_argument("--batch-capacity", type=int, default=8192)
    parser.add_argument("--sample-budget", type=int, default=None)
    parser.add_argument("--field-chunk", type=int, default=0)
    parser.add_argument(
        "--mesh", type=int, default=None,
        help=("data-parallel mesh size: shard the event batch over N "
              "devices (TPU-native analog of the reference's DDP "
              "plugins); default single-device"),
    )
    parser.add_argument("--max-eval-images", type=int, default=None)
    parser.add_argument(
        "--platform", default=None,
        help=("force a jax platform (e.g. 'cpu'); needed where a "
              "site hook pre-selects an accelerator backend"),
    )
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    config = load_config(args.config)
    config.git_head_hash = git_head_hash()

    # `seed: null` -> fresh random seed, recorded in the config copy so
    # the run stays reproducible (reference: scripts/run.py:32
    # pl.seed_everything(config.seed) with seed=None drawing randomly)
    if config.get("seed") is None:
        import random
        config.seed = random.SystemRandom().randrange(1 << 31)

    # reference: torch.set_float32_matmul_precision(config.float32_...)
    precision = config.get("float32_matmul_precision")
    if precision is not None:
        import jax
        jax.config.update("jax_default_matmul_precision", {
            "highest": "float32",
            "high": "bfloat16_3x",
            "medium": "bfloat16",
        }[str(precision)])

    log_dir = args.log_dir
    if log_dir is None:
        base = config.logger.get("save_dir", "./logs")
        name = config.logger.get("name", "run")
        log_dir = os.path.join(base, name)
    os.makedirs(log_dir, exist_ok=True)
    shutil.copy(
        args.config, os.path.join(log_dir, os.path.basename(args.config))
    )

    trainer = Trainer(
        config, log_dir, batch_capacity=args.batch_capacity,
        sample_budget=args.sample_budget,
        field_chunk=args.field_chunk,
        mesh_devices=args.mesh,
    )

    start_epoch = 0
    resume_path = config.trainer.get("resume_from_checkpoint")
    if resume_path:
        start_epoch = trainer.resume(resume_path) + 1
        print(f"resumed from {resume_path} at epoch {start_epoch}")

    if args.stage == "train":
        def on_epoch_end(tr, epoch):
            if (epoch + 1) % int(
                config.trainer.get("check_val_every_n_epoch", 1)
            ) == 0:
                metric = tr.evaluate(
                    "val", epoch, max_images=args.max_eval_images
                )
                print(f"epoch {epoch}: val {metric}")

        elapsed = trainer.train(
            on_epoch_end=on_epoch_end, start_epoch=start_epoch
        )
        print(f"training finished in {elapsed:.1f}s")
    else:
        metric = trainer.evaluate(
            args.stage, epoch=0, max_images=args.max_eval_images
        )
        trainer.dump_metrics([metric], METRICS_FILENAME)
        print(metric)


if __name__ == "__main__":
    main()

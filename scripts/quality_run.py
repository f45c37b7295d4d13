#!/usr/bin/env python
"""Quality-parity harness: event-only training to a reported PSNR/SSIM.

Trains the flagship model from simulated events alone (no frame
supervision — the paper's setting, reference: configs/train/synthetic.yaml
schedule at configs/train/synthetic.yaml:190-195) on a dense textured-
sphere scene, evaluating novel-view PSNR/SSIM every epoch against the
FLAT-FIELD BASELINE (the best constant-image PSNR — the score of the
known training-collapse minimum). Emits:

  <log_dir>/psnr_vs_steps.csv   step, psnr, ssim, flat_psnr per epoch
  <log_dir>/metrics.yaml        final val+test metrics
"""

import argparse
import csv
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402

from deblur_e_nerf_tpu.utils.config import load_config  # noqa: E402


def flat_field_psnr(dataset):
    """Best-constant-image PSNR per eval view (mean over views).

    The flat minimum renders a constant intensity; after the eval
    pipeline's affine log correction the best it can score is the
    per-image-mean constant, whose PSNR this computes directly.
    """
    from deblur_e_nerf_tpu.training import metrics as metrics_lib
    data = dataset.posed_imgs
    rng = (dataset.max_normalized_pixel_value
           - dataset.min_normalized_pixel_value)
    vals = []
    for img in np.asarray(data["img"], np.float64):
        if img.ndim == 2:
            img = img[None]
        const = np.full_like(img, img.mean())
        vals.append(metrics_lib.psnr(const[None], img[None], rng))
    return float(np.mean(vals))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config",
                        default="configs/train/quality_sphere.yaml")
    parser.add_argument("--data-root", default="/tmp/denerf_quality_ds")
    parser.add_argument("--log-dir", default="/tmp/denerf_quality_log")
    parser.add_argument("--img-size", type=int, default=128)
    # NOTE: the event simulation renders at pose timestamps, so
    # num_frames is capped at num_poses — event-timestamp density comes
    # from dense POSES
    parser.add_argument("--num-poses", type=int, default=1501)
    parser.add_argument("--num-frames", type=int, default=1501)
    parser.add_argument("--contrast-threshold", type=float, default=0.1)
    parser.add_argument("--orbits", type=int, default=2)
    parser.add_argument(
        "--bandwidth-tau-ns", type=float, default=None,
        help=("simulate motion-blurred events: 1st-order pixel-bandwidth "
              "LPF time constant in ns (for blur-model quality runs)"),
    )
    parser.add_argument(
        "--pixel-filter", default=None, choices=["none", "full"],
        help=("'full': simulate events through the reference's full "
              "4th-order pixel circuit (the deblurring model's class)"),
    )
    parser.add_argument(
        "--bandwidth-scale", type=float, default=1.0,
        help=("scale every pixel-circuit time constant (heavier blur); "
              "written into the dataset calibration so the model "
              "calibrates to the generator"),
    )
    parser.add_argument("--batch-capacity", type=int, default=8192)
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--steps-per-epoch", type=int, default=None)
    parser.add_argument("--max-eval-images", type=int, default=2)
    parser.add_argument("--platform", default=None)
    parser.add_argument("--resume", default=None)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if not os.path.exists(os.path.join(args.data_root, "raw_events.npz")):
        from deblur_e_nerf_tpu.data import synthetic
        print("generating dataset...", flush=True)
        synthetic.make_dataset(
            args.data_root, img_height=args.img_size,
            img_width=args.img_size, num_poses=args.num_poses,
            num_frames=args.num_frames, num_views=8,
            contrast_threshold=args.contrast_threshold,
            orbits=args.orbits,
            bandwidth_tau_ns=args.bandwidth_tau_ns,
            pixel_filter=args.pixel_filter,
            bandwidth_scale=args.bandwidth_scale,
        )
    n_events = len(np.load(
        os.path.join(args.data_root, "raw_events.npz")
    )["timestamp"])
    print(f"dataset: {n_events} events", flush=True)

    config = load_config(args.config)
    config.data.dataset_directory = args.data_root
    if args.max_epochs is not None:
        config.trainer.max_epochs = args.max_epochs
    if args.steps_per_epoch is not None:
        config.trainer.limit_train_batches = args.steps_per_epoch

    from deblur_e_nerf_tpu.training.trainer import Trainer
    trainer = Trainer(config, args.log_dir,
                      batch_capacity=args.batch_capacity)

    targets, _ = trainer.build_evaluator("val")
    _, val_dataset = next(iter(targets.values()))
    flat_psnr = flat_field_psnr(val_dataset)
    print(f"flat-field baseline PSNR: {flat_psnr:.2f} dB", flush=True)

    csv_path = os.path.join(args.log_dir, "psnr_vs_steps.csv")
    write_header = not os.path.exists(csv_path)
    csv_f = open(csv_path, "a", newline="")
    writer = csv.writer(csv_f)
    if write_header:
        writer.writerow(["step", "psnr", "ssim", "flat_psnr"])

    def on_epoch_end(tr, epoch):
        metric = tr.evaluate("val", epoch,
                             max_images=args.max_eval_images)
        writer.writerow([
            tr.global_step, metric.get("psnr"), metric.get("ssim"),
            flat_psnr,
        ])
        csv_f.flush()
        print(
            f"epoch {epoch} step {tr.global_step}: "
            f"psnr={metric.get('psnr'):.2f} (flat {flat_psnr:.2f}) "
            f"ssim={metric.get('ssim'):.4f}", flush=True,
        )

    start_epoch = 0
    if args.resume:
        start_epoch = trainer.resume(args.resume) + 1
        print(f"resumed at epoch {start_epoch}", flush=True)

    elapsed = trainer.train(on_epoch_end=on_epoch_end,
                            start_epoch=start_epoch)
    print(f"training finished in {elapsed:.0f}s", flush=True)

    final_val = trainer.evaluate("val", epoch=config.trainer.max_epochs)
    final_test = trainer.evaluate("test", epoch=config.trainer.max_epochs)
    rows = [
        {"stage": "val", **{k: float(v) for k, v in final_val.items()}},
        {"stage": "test",
         **{k: float(v) for k, v in final_test.items()}},
        {"flat_field_psnr": flat_psnr},
    ]
    if "pixel_bandwidth" in trainer.state.params:
        # learned vs calibrated-init circuit parameters: the evidence
        # that the blur model is identifying the generator's filter
        from deblur_e_nerf_tpu.models import pixel_bandwidth
        learned = pixel_bandwidth.effective_params(
            trainer.state.params["pixel_bandwidth"]
        )
        init = pixel_bandwidth.effective_params(
            trainer.params["pixel_bandwidth"]
        )
        rows.append({
            "pixel_bandwidth_learned":
                {k: float(v) for k, v in learned.items()},
            "pixel_bandwidth_init":
                {k: float(v) for k, v in init.items()},
        })
    # supplementary: metrics at the BEST monitored checkpoint (when
    # checkpoint.monitor is set). The final-params rows above remain the
    # protocol numbers (the reference tests the last epoch's checkpoint,
    # ref configs/test/synthetic.yaml:28); these rows record the peak the
    # monitored ModelCheckpoint would have kept. Runs after the learned-
    # params row: trainer.resume overwrites the final-step state.
    if trainer.best_checkpoint and os.path.isdir(trainer.best_checkpoint):
        best_name = os.path.basename(trainer.best_checkpoint)
        final_ckpt = f"epoch_{config.trainer.max_epochs - 1:04d}"
        if best_name != final_ckpt:
            trainer.resume(trainer.best_checkpoint)
            best_val = trainer.evaluate(
                "val", epoch=config.trainer.max_epochs + 1)
            best_test = trainer.evaluate(
                "test", epoch=config.trainer.max_epochs + 1)
            rows.append({
                "stage": "val_best", "checkpoint": best_name,
                **{k: float(v) for k, v in best_val.items()}})
            rows.append({
                "stage": "test_best", "checkpoint": best_name,
                **{k: float(v) for k, v in best_test.items()}})
            print("best-checkpoint val:", best_name, best_val, flush=True)
    trainer.dump_metrics(rows, "metrics.yaml")
    print("final val:", final_val, flush=True)
    print("final test:", final_test, flush=True)
    print(
        f"PSNR margin over flat field: "
        f"{final_val['psnr'] - flat_psnr:+.2f} dB", flush=True,
    )
    csv_f.close()


if __name__ == "__main__":
    main()

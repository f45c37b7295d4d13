#!/usr/bin/env python
"""EDS-scale compile + HBM smoke (VERDICT r3 item 9).

Compiles and executes ONE full training step at the real-sequence scale
(reference: configs/train/07_ziggy_and_fuzz_hdr.yaml:195-203 — 2^17 eff
ray samples per micro-batch x accumulate 8 = 2^20 per optimizer step,
256^3 occupancy grid, pixel-bandwidth S=30) on the TPU, using a
synthetic event stream as the data source (the EDS rosbags are not
available in this container; the program SHAPES — grid, buffers, field,
filter — are what the smoke de-risks). Prints step time and peak HBM.

Usage:  python scripts/eds_compile_smoke.py [--steps 2]
"""

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2)
    parser.add_argument("--capacity", type=int, default=4096)
    parser.add_argument("--config",
                        default="configs/train/07_ziggy_and_fuzz_hdr.yaml")
    parser.add_argument("--data-root",
                        default="/tmp/denerf_bench_ds_v2")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from deblur_e_nerf_tpu.data import events as events_data
    from deblur_e_nerf_tpu.data import synthetic
    from deblur_e_nerf_tpu.models import nerf_model
    from deblur_e_nerf_tpu.training import (optim, pipeline, setup,
                                            step as step_lib)
    from deblur_e_nerf_tpu.utils.config import load_config

    root = args.data_root
    if not os.path.exists(os.path.join(root, "raw_events.npz")):
        os.makedirs(root, exist_ok=True)
        synthetic.make_dataset(root, img_height=64, img_width=64,
                               num_poses=41, num_frames=410)

    config = load_config(os.path.join(_REPO, args.config))
    config.data.dataset_directory = root
    # the EDS configs use auto aabb/near/far derived from poses; the
    # synthetic stand-in scene needs explicit bounds (as bench.py does)
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0

    events = events_data.EventDataset(root).events
    t0 = time.time()
    bundle, params = setup.build(
        config, root, batch_capacity=args.capacity,
        field_chunk=1 << 21,
    )
    sc = bundle.static_config
    tx, mask = optim.build(
        params, config.optimizer, config.lr_scheduler,
        float(config.loss.weight.nerf_mlp_weight_decay),
        float(bundle.consts["refractory_period"]
              ["max_refractory_period"]),
        steps_per_epoch=1000,
        model_configs={
            c: config.model[c]
            for c in ("contrast_threshold", "refractory_period",
                      "pixel_bandwidth", "nerf")
        },
        table_decay=bundle.model.table_decay,
    )
    state = step_lib.TrainState(
        params=params, opt_state=tx.init(params),
        occ_state=nerf_model.init_occupancy(bundle.model),
        step=jnp.asarray(0, jnp.int32),
    )
    step_fn = jax.jit(step_lib.make_train_step(
        bundle.model, bundle.consts, tx, sc, bundle.loss_config,
        trainable_mask=mask,
    ))
    print(f"build: {time.time() - t0:.1f}s; sample budget "
          f"{bundle.model.render_config.sample_budget}, occ grid "
          f"{bundle.model.render_config.grid_resolution}^3, S="
          f"{sc.it_sample_size}", file=sys.stderr, flush=True)

    batcher = pipeline.EventBatcher(events, capacity=args.capacity,
                                    seed=0)
    times = []
    for i in range(args.steps):
        batch = {k: jnp.asarray(v)
                 for k, v in batcher.next_batch(args.capacity // 4)
                 .items()}
        t0 = time.time()
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(metrics["loss"])
        times.append(time.time() - t0)
        print(f"step {i}: {times[-1]:.1f}s loss="
              f"{float(metrics['loss']):.4f}", file=sys.stderr,
              flush=True)

    stats = jax.devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
    print(json.dumps({
        "config": args.config,
        "compile_plus_first_step_s": round(times[0], 1),
        "steady_step_s": round(times[-1], 1),
        "peak_hbm_gib": round(peak / (1 << 30), 2),
        "sample_budget": int(bundle.model.render_config.sample_budget),
        "grid_resolution": int(
            bundle.model.render_config.grid_resolution),
    }))


if __name__ == "__main__":
    main()

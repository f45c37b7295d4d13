"""Compile-time bisect for the quality-scale train step on TPU.

The round-5 G=4 batched-group encode stalled the remote TPU compile of
the quality step > 37 min (the G=1 r4-shaped program compiles in
minutes). This harness times ONLY the jit lowering+compile of the full
train step under the current DENERF_* env, so the hazard can be
bisected without burning training budget:

    DENERF_ENCODE_GROUP=4 timeout 1800 python scripts/compile_bisect.py
    DENERF_DENSE_BWD=sort  timeout 1800 python scripts/compile_bisect.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from deblur_e_nerf_tpu.training import optim, setup, step as step_lib
from deblur_e_nerf_tpu.training import pipeline
from deblur_e_nerf_tpu.models import nerf_model
from deblur_e_nerf_tpu.utils.config import load_config


def main():
    root = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/denerf_blur32_dense_ds"
    cfg = load_config(
        "configs/train/quality_sphere_blur32_dense_r4.yaml")
    cfg.data.dataset_directory = root
    print("env:", {k: v for k, v in os.environ.items()
                   if k.startswith("DENERF_")}, flush=True)
    t0 = time.time()
    bundle, params = setup.build(cfg, root, batch_capacity=256)
    tx, mask = optim.build(
        params, cfg.optimizer, cfg.lr_scheduler,
        float(cfg.loss.weight.nerf_mlp_weight_decay),
        float(bundle.consts["refractory_period"]
              ["max_refractory_period"]),
        steps_per_epoch=500,
        model_configs={c: cfg.model[c] for c in (
            "contrast_threshold", "refractory_period",
            "pixel_bandwidth", "nerf")},
        table_decay=bundle.model.table_decay,
    )
    step_fn = step_lib.make_train_step(
        bundle.model, bundle.consts, tx, bundle.static_config,
        bundle.loss_config, trainable_mask=mask,
    )
    state = step_lib.TrainState(
        params=params, opt_state=tx.init(params),
        occ_state=nerf_model.init_occupancy(bundle.model),
        step=jax.numpy.asarray(0, jax.numpy.int32),
    )
    from deblur_e_nerf_tpu.data import events as events_data
    events = events_data.EventDataset(root).events
    batcher = pipeline.EventBatcher(events, capacity=256, seed=0)
    batch = {k: jax.numpy.asarray(v)
             for k, v in batcher.next_batch(128).items()}
    print(f"build: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    lowered = jax.jit(step_fn).lower(
        state, batch, jax.random.PRNGKey(0))
    print(f"lower: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    lowered.compile()
    print(f"compile: {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()

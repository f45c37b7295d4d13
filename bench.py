#!/usr/bin/env python
"""Training-throughput benchmark: rays/sec/chip on the flagship workload.

Workload (FLOP-equivalent to the reference synthetic config,
reference: configs/train/synthetic.yaml): NGP field (16-level HashGrid,
2^19 table, 1x64 base + 2x64 head MLPs, SH degree 4), pixel-bandwidth blur
model with S=30 intensity samples, occupancy-gated marching (128^3 grid),
4 renders per optimizer step. The reference has no published in-repo
throughput numbers, so vs_baseline is computed against a DERIVED
reference throughput — the nerfacc+tcnn stack the reference trains on,
priced at 19.4M occupancy-gated field samples/s (incl. backward) from
the NerfAcc paper's published instant-NGP benchmark; full derivation and
caveats in BASELINE.md ("Derived reference throughput"). Both systems
are priced in samples/s on the same marched-sample workload:
vs_baseline = samples_per_sec / 19.4e6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# workload knobs: the BASELINE protocol (reference synthetic config) —
# train_eff_ray_sample_batch_size = 2^17 event-ray samples per optimizer
# step (reference: configs/train/synthetic.yaml:19), which at S=30
# pixel-bandwidth samples and 4 interval endpoints is ~4*30*2^17 = 15.7M
# marched field samples per step (reference semantics:
# deblur_e_nerf.py:74,1293-1295 — batch_size = 2^17 / samples_per_ray,
# each of the 4 renders marches S * batch_size rays)
IMG_SIZE = 64
NUM_EVENTS = 200_000
# smoke-test overrides (CPU dry runs of the full two-phase flow); the
# protocol numbers below are the defaults and define the published bench
BATCH_CAPACITY = int(os.environ.get("DENERF_BENCH_CAPACITY", "4096"))
EFF_RAY_SAMPLES = int(os.environ.get("DENERF_BENCH_EFF_SAMPLES",
                                     "131072"))  # reference
# train_eff_ray_sample_batch_size
N_SLICES = 4                # interval endpoints rendered per step
S = 30                      # pixel-bandwidth intensity samples
SAMPLE_BUDGET = N_SLICES * S * EFF_RAY_SAMPLES  # flat sample buffer
FIELD_CHUNK = 1 << 21       # remat the field per 2M-sample chunk: the
                            # 15.7M-sample protocol buffer's activations
                            # exceed HBM without rematerialization
WARMUP_STEPS = 2
TIMED_STEPS = int(os.environ.get("DENERF_BENCH_TIMED_STEPS", "5"))
# convergence phase: the throughput number is for TRAINING STEADY STATE
# (the reference's published nerfacc numbers are steady-state too). A
# hand-crafted occupancy with a random-init field marches realistically
# but renders unrealistically: no early termination is possible and the
# samples-per-ray the controller sees never reaches the converged
# regime. So the bench first TRAINS the scene with a small cheap program
# (blur model off, fog prior on), then times the protocol program from
# that state with a demand-sized sample buffer.
CONVERGE_STEPS = int(os.environ.get("DENERF_BENCH_CONVERGE", "300"))
CONVERGE_BUDGET = int(os.environ.get("DENERF_BENCH_CONVERGE_BUDGET",
                                     str(1 << 21)))
CONVERGE_CAPACITY = int(os.environ.get("DENERF_BENCH_CONVERGE_CAPACITY",
                                       "2048"))
# occlusion-prepass divisor for the timed program (0 = off). Default 0
# since round 5: the converged bench scene has live ~= marched samples
# (r4 steps logged prepass_overflow ~1.0 at div=1 — early termination
# culls nearly nothing there), so the prepass' extra density-only
# forward over the full buffer was pure overhead; div=2 overflowed its
# buffer outright (live demand > budget/2, r4 first attempt). Real
# scenes with opaque surfaces DO cull — the prepass stays on in the
# quality configs.
PREPASS_DIV = int(os.environ.get("DENERF_BENCH_PREPASS_DIV", "0"))
# occupancy settle: the field converges long before a 0.95-EMA grid can
# carve (measured on TPU: loss 0.009 with occ-rate still 1.0 at converge
# step 250) — after the converge train loop, repeated FULL-GRID updates
# at a faster EMA let the grid catch up to the already-converged density
# in seconds instead of thousands of train steps, then a short
# re-equilibration recovers the true steady-state samples-per-ray
SETTLE_UPDATES = int(os.environ.get("DENERF_BENCH_SETTLE", "48"))
SETTLE_EMA = float(os.environ.get("DENERF_BENCH_SETTLE_EMA", "0.8"))
RESETTLE_STEPS = int(os.environ.get("DENERF_BENCH_RESETTLE", "24"))
# converged-state disk cache: phase A costs ~50 min on TPU, but the
# state is workload-determined, so it is persisted as a REPO-TRACKED
# npz artifact (results/bench_state/<key>.npz, hash tables stored f16)
# and every later bench run — including the driver's round-end run on a
# fresh machine — hits the cache (round-3 lesson: the /tmp cache
# evaporated and the driver's bench died reconverging, rc=124)
STATE_CACHE = os.environ.get("DENERF_BENCH_STATE_CACHE", "1") == "1"

# wall-clock budget: the bench MUST emit its JSON line within the
# driver's timeout. Budget accounting reserves PHASE_B_RESERVE_S for
# the timed protocol program (compile ~7 min + warmup + steps); phase A
# only runs if the cache missed AND enough budget remains, and aborts
# to the legacy analytic-occupancy mode if it overruns mid-loop.
BUDGET_S = float(os.environ.get("DENERF_BENCH_BUDGET_S", "2700"))
PHASE_B_RESERVE_S = float(os.environ.get("DENERF_BENCH_PHASE_B_RESERVE_S",
                                         "1100"))
_T_START = time.time()


def _remaining():
    return BUDGET_S - (time.time() - _T_START)


# relay-stall watchdog: the axon TPU relay can wedge a single client
# connection mid-run (observed round 3 AND round 4: converge stalls
# around step 150-200 with the device still serving fresh clients; the
# blocked RPC never returns, so no in-thread timeout can fire). A
# daemon thread watches a heartbeat the main loop touches after every
# device fetch; on a stall it prints the contract JSON line and
# force-exits 0 so the driver ALWAYS records a parsable result.
STALL_S = float(os.environ.get("DENERF_BENCH_STALL_S", "480"))
# compile-prone phases legitimately go silent for many minutes (the
# fused step compiles ~5-15 min through the relay): beats carry a grace
# override that widens the stall threshold until the next beat
COMPILE_GRACE_S = float(os.environ.get("DENERF_BENCH_COMPILE_GRACE_S",
                                       "2400"))
_HEARTBEAT = [time.time(), "startup", None]  # [t, tag, grace_override]
_HEARTBEAT[2] = COMPILE_GRACE_S  # process start -> first compile
_JSON_EMITTED = [False]


def _beat(tag, grace=None):
    _HEARTBEAT[0] = time.time()
    _HEARTBEAT[1] = tag
    _HEARTBEAT[2] = grace


def _start_watchdog():
    import threading

    def watch():
        while True:
            time.sleep(15.0)
            if _JSON_EMITTED[0]:
                return
            silent = time.time() - _HEARTBEAT[0]
            limit = _HEARTBEAT[2] or STALL_S
            if silent > limit:
                print(
                    f"WATCHDOG: no heartbeat for {silent:.0f}s "
                    f"(last: {_HEARTBEAT[1]}); TPU relay stall — "
                    "emitting error JSON and exiting",
                    file=sys.stderr, flush=True,
                )
                print(json.dumps({
                    "metric": "train_rays_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "rays/s",
                    "vs_baseline": 0.0,
                    "error": f"relay stall at {_HEARTBEAT[1]} "
                             f"({silent:.0f}s silent)",
                }), flush=True)
                # default rc 0: the driver's one-shot run must see a
                # clean parsable result; retry loops set
                # DENERF_BENCH_STALL_EXIT_RC=17 to detect-and-resume
                os._exit(int(os.environ.get(
                    "DENERF_BENCH_STALL_EXIT_RC", "0")))

    threading.Thread(target=watch, daemon=True).start()

# analytic per-marched-sample matmul FLOPs of the flagship field
# (fwd: enc-interp + mlp_base 32->64->16 + SH4 + mlp_head 31->64->64->1;
# bwd ~2x fwd), for the MFU estimate
FLOPS_PER_SAMPLE = 63_000
PEAK_FLOPS = 197e12         # v5e bf16 peak (conservative denominator)
# derived reference-stack throughput in marched field samples/s incl.
# backward (nerfacc 0.3.1 + tcnn instant-NGP training, NerfAcc paper's
# published benchmark: 20k steps x 2^18 samples in ~270 s on RTX 3090);
# see BASELINE.md "Derived reference throughput" for the derivation and
# why this is a LOWER bound on the true ratio
REF_SAMPLES_PER_SEC = 19.4e6


def main():
    _start_watchdog()
    import jax

    # CPU smoke runs: the container's sitecustomize pre-imports jax on
    # the axon TPU backend, so JAX_PLATFORMS in the environment is NOT
    # honored — an explicit config update before first device use is
    # the only way to keep a smoke run off the (possibly busy) TPU
    if os.environ.get("DENERF_BENCH_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["DENERF_BENCH_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np

    from deblur_e_nerf_tpu.data import events as events_data
    from deblur_e_nerf_tpu.data import synthetic
    from deblur_e_nerf_tpu.models import nerf_model
    from deblur_e_nerf_tpu.models import occupancy as occ_lib
    from deblur_e_nerf_tpu.training import (optim, pipeline, setup,
                                            step as step_lib)
    from deblur_e_nerf_tpu.utils.config import load_config

    root = os.environ.get("DENERF_BENCH_ROOT") \
        or os.path.join("/tmp", "denerf_bench_ds_v2")
    if not os.path.exists(os.path.join(root, "raw_events.npz")):
        os.makedirs(root, exist_ok=True)
        # simulated (physically consistent) events: training stays stable
        # under real gradients, so the timed steps are representative
        synthetic.make_dataset(
            root, img_height=IMG_SIZE, img_width=IMG_SIZE,
            num_poses=41, num_frames=410,
        )

    config = load_config(os.path.join(_REPO, "configs/train/synthetic.yaml"))
    config.data.dataset_directory = root
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    # experiment knob: measure an alternative encoding layout
    # (e.g. DENERF_BENCH_OTYPE=HybridHashGrid) without touching the
    # protocol config; default stays the reference HashGrid
    if os.environ.get("DENERF_BENCH_OTYPE"):
        config.model.nerf.ngp.pos_encoding.otype = \
            os.environ["DENERF_BENCH_OTYPE"]

    events = events_data.EventDataset(root).events

    # ---- phase A: converge to training steady state (cheap program) ----
    conv_nerf_params = None
    conv_occ = None
    m_est = None
    if CONVERGE_STEPS > 0:
        import copy
        cfg_a = copy.deepcopy(config)
        cfg_a.model.pixel_bandwidth.enable = False  # 30x cheaper steps;
        # the field/occupancy steady state is what phase B needs
        cfg_a.loss.weight["density_sparsity"] = 0.01  # fog prior (see
        # training/step.py): event-only training without it saturates the
        # occupancy grid and never reaches a surface-like steady state
        cfg_a.loss["density_sparsity_samples"] = 4096
        # absolute occupancy-threshold floor: the prior collapses the
        # mean occupancy, and nerfacc's relative threshold then latches
        # noise cells grid-wide (models/occupancy.py)
        # pure nerfacc threshold semantics: the round-3 guard sweep
        # (floors 1e-4/1e-3/1e-2, quantile cap, max-relative bar)
        # measured WORSE quality than the self-recovering baseline —
        # the pedestal (~5e-3) overlaps the growing-surface range by
        # value, so every fixed guard binds in the wrong phase
        # (results/round3/README.md). Guards stay available as
        # occ_grid knobs, default off.
        # field_chunk > 0 even here: the unchunked 2^21-sample encode
        # OOM'd HBM on TPU (XLA laid the per-level (K, 8) s32 corner-index
        # fusions out with the 8-corner dim on the 128-lane axis — 16x
        # padding, ~1 GiB per level, 26 GiB program); the remat-chunked
        # field path the protocol program uses has always compiled clean
        conv_chunk = int(os.environ.get("DENERF_BENCH_CONVERGE_CHUNK",
                                        str(1 << 19)))
        bundle_a, params_a = setup.build(
            cfg_a, root, sample_budget=CONVERGE_BUDGET,
            batch_capacity=CONVERGE_CAPACITY,
            field_chunk=min(conv_chunk, CONVERGE_BUDGET),
        )
        tx_a, mask_a = optim.build(
            params_a, cfg_a.optimizer, cfg_a.lr_scheduler,
            float(cfg_a.loss.weight.nerf_mlp_weight_decay),
            float(bundle_a.consts["refractory_period"]
                  ["max_refractory_period"]),
            steps_per_epoch=1000,
            model_configs={
                c: cfg_a.model[c]
                for c in ("contrast_threshold", "refractory_period",
                          "pixel_bandwidth", "nerf")
            },
            table_decay=bundle_a.model.table_decay,
        )
        occ_update_a = jax.jit(
            lambda p, s, k, i: nerf_model.update_occupancy(
                bundle_a.model, p, s, k,
                bundle_a.consts["trajectory"].T_wc_position, i,
            )
        )
        step_a = jax.jit(step_lib.make_train_step(
            bundle_a.model, bundle_a.consts, tx_a,
            bundle_a.static_config, bundle_a.loss_config,
            trainable_mask=mask_a,
        ))
        state_a = step_lib.TrainState(
            params=params_a, opt_state=tx_a.init(params_a),
            occ_state=nerf_model.init_occupancy(bundle_a.model),
            step=jnp.asarray(0, jnp.int32),
        )
        batcher_a = pipeline.EventBatcher(
            events, capacity=CONVERGE_CAPACITY, seed=0
        )
        ctrl_a = pipeline.BatchSizeController(
            target_ray_samples=1 << 16,
            init_batch_size=CONVERGE_CAPACITY // 4,
            capacity=CONVERGE_CAPACITY,
        )
        occ_n = int(config.model.nerf.occ_grid.n)
        cache_key = (
            "denerf_bench_conv_v1_"
            f"{config.model.nerf.ngp.pos_encoding.otype}_"
            f"{CONVERGE_STEPS}_{CONVERGE_BUDGET}_{CONVERGE_CAPACITY}_"
            f"{IMG_SIZE}_{SETTLE_UPDATES}_{SETTLE_EMA}"
        )
        cache_path = os.path.join(_REPO, "results", "bench_state",
                                  cache_key + ".npz")

        def _flatten_nerf(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return {jax.tree_util.keystr(k): np.asarray(v)
                    for k, v in flat}

        def _save_cache(path, nerf_params, occ, m_val, extra=None):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            arrays = {}
            for k, v in _flatten_nerf(nerf_params).items():
                # hash tables dominate (~64 MB f32); store f16 — the
                # timed phase only needs a realistic steady state, and
                # f16 round-trip shifts m by < 1%
                if v.dtype == np.float32 and v.size > 1 << 16:
                    v = v.astype(np.float16)
                arrays["nerf:" + k] = v
            arrays["occs"] = np.asarray(occ.occs)
            arrays["binary"] = np.asarray(occ.binary)
            arrays["m_est"] = np.asarray(m_val, np.float32)
            for k, v in (extra or {}).items():
                arrays["extra:" + k] = np.asarray(v)
            np.savez_compressed(path + ".tmp.npz", **arrays)
            os.replace(path + ".tmp.npz", path)

        def _load_cache(path, target_nerf, occ_template):
            with np.load(path) as z:
                target_flat = _flatten_nerf(target_nerf)
                loaded = {}
                for k, tv in target_flat.items():
                    v = z["nerf:" + k]
                    if v.shape != tv.shape:
                        raise ValueError(f"shape mismatch at {k}")
                    loaded[k] = v.astype(tv.dtype)
                leaves, treedef = jax.tree_util.tree_flatten(target_nerf)
                keys = [jax.tree_util.keystr(k) for k, _ in
                        jax.tree_util.tree_flatten_with_path(
                            target_nerf)[0]]
                nerf = jax.tree_util.tree_unflatten(
                    treedef, [jnp.asarray(loaded[k]) for k in keys])
                occ = occ_template._replace(
                    occs=jnp.asarray(z["occs"]),
                    binary=jnp.asarray(z["binary"]),
                )
                extra = {k[len("extra:"):]: z[k] for k in z.files
                         if k.startswith("extra:")}
                return nerf, occ, float(z["m_est"]), extra

        restored = None
        if STATE_CACHE and os.path.isfile(cache_path):
            try:
                restored = _load_cache(
                    cache_path, params_a["nerf"], state_a.occ_state)
                print(f"converged-state cache hit: {cache_path}",
                      file=sys.stderr, flush=True)
            except Exception as exc:  # stale/corrupt cache: reconverge
                print(f"state cache restore failed ({exc}); reconverging",
                      file=sys.stderr, flush=True)
        # phase A costs ~45-55 min uncached on TPU; do not even start it
        # unless the budget can absorb that AND the timed phase
        phase_a_est = float(os.environ.get("DENERF_BENCH_PHASE_A_EST_S",
                                           "3400"))
        if restored is not None:
            conv_nerf_params, conv_occ, m_est = restored[:3]
        elif _remaining() < phase_a_est + PHASE_B_RESERVE_S:
            print(
                f"budget ({_remaining():.0f}s left) cannot absorb an "
                f"uncached converge phase (~{phase_a_est:.0f}s) + timed "
                "phase; falling back to legacy analytic occupancy",
                file=sys.stderr, flush=True,
            )
        else:
            # partial-converge resume: relay stalls (see _start_watchdog)
            # kill runs mid-phase-A; periodic partial snapshots let the
            # retried run continue instead of reconverging from scratch
            partial_path = cache_path + ".partial.npz"
            start_step = 0
            if STATE_CACHE and os.path.isfile(partial_path):
                try:
                    nerf_p, occ_p, m_p, extra = _load_cache(
                        partial_path, params_a["nerf"],
                        state_a.occ_state)
                    state_a = state_a._replace(
                        params=dict(state_a.params, nerf=nerf_p),
                        occ_state=occ_p,
                    )
                    start_step = int(extra.get("step", 0))
                    if "active" in extra:
                        ctrl_a.active = int(extra["active"])
                    print(f"partial converge resume at step "
                          f"{start_step} (active={ctrl_a.active})",
                          file=sys.stderr, flush=True)
                except Exception as exc:
                    print(f"partial cache restore failed ({exc})",
                          file=sys.stderr, flush=True)
            aborted = False
            t0 = time.time()
            for i in range(start_step, CONVERGE_STEPS):
                if _remaining() < PHASE_B_RESERVE_S:
                    print(f"converge aborted at step {i}: budget "
                          f"exhausted; falling back to legacy mode",
                          file=sys.stderr, flush=True)
                    aborted = True
                    break
                if i % occ_n == 0:
                    occ = occ_update_a(
                        state_a.params["nerf"], state_a.occ_state,
                        jax.random.PRNGKey(100000 + i),
                        jnp.asarray(i, jnp.int32),
                    )
                    state_a = state_a._replace(occ_state=occ)
                batch = {
                    k: jnp.asarray(v)
                    for k, v in batcher_a.next_batch(ctrl_a.active).items()
                }
                if i == start_step:
                    _beat("converge compile", grace=COMPILE_GRACE_S)
                state_a, m_a = step_a(state_a, batch, jax.random.PRNGKey(i))
                m_val = float(m_a["mean_num_samples_per_ray"])
                ctrl_a.update(m_val)
                _beat(f"converge step {i}")
                if i % 50 == 0 or i == CONVERGE_STEPS - 1:
                    print(
                        f"converge {i}: loss={float(m_a['loss']):.4f} "
                        f"m={m_val:.1f} "
                        f"occ={float(m_a['mean_ray_occ_rate']):.3f} "
                        f"active={ctrl_a.active}",
                        file=sys.stderr, flush=True,
                    )
                if STATE_CACHE and i and i % 64 == 0:
                    try:
                        _save_cache(
                            partial_path, state_a.params["nerf"],
                            state_a.occ_state, m_val,
                            extra={"step": i + 1,
                                   "active": ctrl_a.active},
                        )
                    except Exception as exc:
                        print(f"partial cache save failed ({exc})",
                              file=sys.stderr, flush=True)
            print(f"converge phase: {time.time() - t0:.0f}s",
                  file=sys.stderr, flush=True)

            if not aborted:
                # occupancy settle (see SETTLE_UPDATES comment above):
                # force the full-grid warmup branch (step 0 <
                # warmup_steps 1) with a faster EMA so the grid reaches
                # the converged field's support
                rc_a = bundle_a.model.render_config
                occ_cfg_a = bundle_a.model.occ_grid_config
                settle_fn = jax.jit(lambda p, s, k: occ_lib.update(
                    s, k,
                    occ_lib.make_occ_eval_fn(
                        lambda x: nerf_model.density_fn(
                            bundle_a.model, p, x),
                        rc_a.render_step_size, rc_a.cone_angle,
                        rc_a.near_plane, rc_a.far_plane,
                    ),
                    bundle_a.consts["trajectory"].T_wc_position,
                    jnp.asarray(0, jnp.int32),
                    resolution=rc_a.grid_resolution, aabb=rc_a.aabb,
                    contraction_type=rc_a.contraction_type,
                    occ_thre=float(occ_cfg_a.occ_thre),
                    ema_decay=SETTLE_EMA, warmup_steps=1,
                ))
                t0 = time.time()
                _beat("settle compile", grace=COMPILE_GRACE_S)
                for j in range(SETTLE_UPDATES):
                    occ = settle_fn(
                        state_a.params["nerf"], state_a.occ_state,
                        jax.random.PRNGKey(5_000_000 + j),
                    )
                    state_a = state_a._replace(occ_state=occ)
                    jax.block_until_ready(occ.occs)
                    _beat(f"settle {j}")
                occ_rate = float(jnp.mean(state_a.occ_state.binary))
                print(f"settle: {SETTLE_UPDATES} full-grid updates in "
                      f"{time.time() - t0:.0f}s, occupied fraction "
                      f"{occ_rate:.4f}", file=sys.stderr, flush=True)

                # re-equilibrate the batch controller / samples-per-ray
                # estimate against the settled grid
                for j in range(RESETTLE_STEPS):
                    i = CONVERGE_STEPS + j
                    if j % occ_n == 0:
                        occ = occ_update_a(
                            state_a.params["nerf"], state_a.occ_state,
                            jax.random.PRNGKey(100000 + i),
                            jnp.asarray(i, jnp.int32),
                        )
                        state_a = state_a._replace(occ_state=occ)
                    batch = {
                        k: jnp.asarray(v)
                        for k, v in
                        batcher_a.next_batch(ctrl_a.active).items()
                    }
                    state_a, m_a = step_a(
                        state_a, batch, jax.random.PRNGKey(i))
                    m_val = float(m_a["mean_num_samples_per_ray"])
                    ctrl_a.update(m_val)
                    _beat(f"resettle {j}")
                print(f"re-equilibrated: m={m_val:.1f} "
                      f"occ={float(m_a['mean_ray_occ_rate']):.3f} "
                      f"active={ctrl_a.active}",
                      file=sys.stderr, flush=True)

                conv_nerf_params = state_a.params["nerf"]
                conv_occ = state_a.occ_state
                m_est = m_val
                if STATE_CACHE:
                    try:
                        _save_cache(cache_path, conv_nerf_params,
                                    conv_occ, m_est)
                        print(f"converged state cached: {cache_path}",
                              file=sys.stderr, flush=True)
                        partial = cache_path + ".partial.npz"
                        if os.path.isfile(partial):
                            os.remove(partial)
                    except Exception as exc:
                        print(f"state cache save failed ({exc})",
                              file=sys.stderr, flush=True)

    # ---- phase B: the timed protocol program ----
    # demand-sized sample buffer: demand/step =
    # min(eff_target, capacity * rays_per_event * m) with margin —
    # carrying the worst-case buffer at a converged m would spend most
    # field lanes on empty slots
    if m_est is not None and m_est > 0:
        demand = min(
            SAMPLE_BUDGET,
            int(BATCH_CAPACITY * N_SLICES * S * m_est),
        )
        MB = 1 << 20
        budget = min(SAMPLE_BUDGET, max(MB, -(-int(demand * 1.3) // MB) * MB))
    else:
        budget = SAMPLE_BUDGET
    if PREPASS_DIV:
        config.model.nerf.occlusion_prepass_div = PREPASS_DIV
    print(f"protocol sample budget: {budget} (demand est m={m_est})",
          file=sys.stderr, flush=True)

    bundle, params = setup.build(
        config, root, sample_budget=budget,
        batch_capacity=BATCH_CAPACITY,
        field_chunk=min(FIELD_CHUNK, budget),
    )
    sc = bundle.static_config
    tx, trainable_mask = optim.build(
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

    if conv_nerf_params is not None:
        params = dict(params, nerf=conv_nerf_params)
        occ_state = conv_occ
        print(f"converged occ rate="
              f"{float(jnp.mean(occ_state.binary)):.4f}",
              file=sys.stderr, flush=True)
    else:
        # legacy mode (DENERF_BENCH_CONVERGE=0): analytic sphere-shell
        # occupancy as a stand-in for the converged grid
        occ_state = nerf_model.init_occupancy(bundle.model)
        from deblur_e_nerf_tpu.models import occupancy as occ_lib
        res = bundle.model.render_config.grid_resolution
        aabb = np.asarray(bundle.model.render_config.aabb, np.float32)
        cell_u = (np.asarray(occ_lib.cell_coords(res)) + 0.5) / res
        centers = aabb[:3] + cell_u * (aabb[3:] - aabb[:3])
        radius = np.linalg.norm(centers, axis=-1)
        cell_diag = float(np.linalg.norm((aabb[3:] - aabb[:3]) / res))
        shell = np.abs(radius - 1.0) < 1.5 * cell_diag
        occ_state = occ_state._replace(binary=jnp.asarray(shell))
        print(f"occ rate={float(jnp.mean(occ_state.binary)):.4f}",
              file=sys.stderr, flush=True)
    state = step_lib.TrainState(
        params=params, opt_state=tx.init(params), occ_state=occ_state,
        step=jnp.asarray(0, jnp.int32),
    )
    step_fn = jax.jit(step_lib.make_train_step(
        bundle.model, bundle.consts, tx, sc, bundle.loss_config,
        trainable_mask=trainable_mask,
    ))

    batcher = pipeline.EventBatcher(events, capacity=BATCH_CAPACITY, seed=0)
    controller = pipeline.BatchSizeController(
        target_ray_samples=EFF_RAY_SAMPLES,
        init_batch_size=BATCH_CAPACITY // 4,
        capacity=BATCH_CAPACITY,
    )

    def run_step(i, active):
        batch = {
            k: jnp.asarray(v)
            for k, v in batcher.next_batch(active).items()
        }
        nonlocal state
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        jax.block_until_ready(metrics["loss"])
        _beat(f"protocol step {i}")
        return metrics

    step_est = 60.0
    _beat("protocol compile", grace=COMPILE_GRACE_S)
    # warmup runs until the samples-per-ray estimate is STATIONARY
    # (|dm|/m < 5% on consecutive steps, twice in a row): the timed
    # program differs from the converge program (blur on, stratified
    # timeline), so the controller/occupancy equilibrium shifts on the
    # first protocol steps — round 4 timed a drifting state
    # (m 194 -> 324 across its 5 timed steps, VERDICT weak #4)
    max_warmup = int(os.environ.get("DENERF_BENCH_MAX_WARMUP", "12"))
    m_prev = None
    stat_hits = 0
    warmup_done = 0
    for i in range(max(WARMUP_STEPS, max_warmup)):
        t0 = time.time()
        m = run_step(i, controller.active)
        m_val = float(m["mean_num_samples_per_ray"])
        controller.update(m_val)
        step_est = time.time() - t0
        drift = abs(m_val - m_prev) / max(m_val, 1e-6) \
            if m_prev is not None else 1.0
        print(f"warmup {i}: {step_est:.1f}s m={m_val:.1f} "
              f"drift={drift:.3f}",
              file=sys.stderr, flush=True)
        m_prev = m_val
        warmup_done = i + 1
        stat_hits = stat_hits + 1 if drift < 0.05 else 0
        if warmup_done >= WARMUP_STEPS and stat_hits >= 2:
            break  # stationary: safe to time
        if _remaining() < max(3 * step_est, PHASE_B_RESERVE_S / 6):
            break  # warmup 0 paid the compile; that is the essential one

    # adapt the timed-step count to the remaining budget (>= 2 steps so
    # a number is ALWAYS published, even over budget)
    timed_steps = max(2, min(
        TIMED_STEPS, int((_remaining() - 20.0) / max(step_est, 1e-3))))
    if timed_steps < TIMED_STEPS:
        print(f"budget: timing {timed_steps} steps instead of "
              f"{TIMED_STEPS} ({_remaining():.0f}s left, "
              f"~{step_est:.1f}s/step)", file=sys.stderr, flush=True)

    profile_dir = os.environ.get("DENERF_BENCH_PROFILE_DIR")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    total_rays = 0
    total_samples = 0
    t0 = time.time()
    m_first = m_last = None
    for i in range(timed_steps):
        active = controller.active
        m = run_step(warmup_done + i, active)
        controller.update(float(m["mean_num_samples_per_ray"]))
        print(f"step {i}: loss={float(m['loss']):.4f} active={active} "
              f"m={float(m['mean_num_samples_per_ray']):.1f} "
              f"ovf={float(m['sample_overflow_rate']):.2f} "
              f"pre={float(m['prepass_overflow_rate']):.2f}",
              file=sys.stderr, flush=True)
        # N_SLICES interval endpoints x S intensity samples x active events
        n_rays = N_SLICES * max(sc.it_sample_size, 1) * active
        total_rays += n_rays
        total_samples += int(
            n_rays * float(m["mean_num_samples_per_ray"])
        )
        m_last = float(m["mean_num_samples_per_ray"])
        if m_first is None:
            m_first = m_last
    elapsed = time.time() - t0
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"profile trace -> {profile_dir}", file=sys.stderr,
              flush=True)

    if not np.isfinite(float(m["loss"])):
        print("WARNING: non-finite loss in timed steps", file=sys.stderr,
              flush=True)
    if float(m["prepass_overflow_rate"]) > 1.0:
        print("WARNING: prepass buffer overflowed (live samples dropped);"
              " rerun with a smaller DENERF_BENCH_PREPASS_DIV",
              file=sys.stderr, flush=True)
    rays_per_sec = total_rays / elapsed
    samples_per_sec = total_samples / elapsed
    mfu_pct = samples_per_sec * FLOPS_PER_SAMPLE / PEAK_FLOPS * 100
    print(f"secondary: {samples_per_sec/1e6:.2f}M marched field "
          f"samples/s (incl. backward), est. MFU {mfu_pct:.3f}% "
          f"(matmul FLOPs only)", file=sys.stderr, flush=True)
    _JSON_EMITTED[0] = True
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        # same-workload samples/s ratio vs the derived reference stack
        # (BASELINE.md); conservative: denominator is the reference's
        # RAW nerfacc+tcnn core, without its torch event-physics wrapper
        "vs_baseline": round(samples_per_sec / REF_SAMPLES_PER_SEC, 4),
        # measurement context (BASELINE.md "Measurement state"):
        # marched samples/s at training steady state after the converge
        # phase, demand-sized buffer, occlusion prepass
        "samples_per_sec": round(samples_per_sec, 0),
        "mean_samples_per_ray": round(
            float(m["mean_num_samples_per_ray"]), 2
        ),
        # whether the timed phase ran from a converged steady state
        # (phase A or its durable cache) or the legacy analytic-occupancy
        # fallback (budget miss); legacy numbers are comparable to
        # BENCH_r01/r02's
        "converged": conv_nerf_params is not None,
        "converge_steps": CONVERGE_STEPS,
        "timed_steps": timed_steps,
        # stationarity of the timed window: |m_last - m_first| / m_last
        # (round-4's published number drifted 194 -> 324 = 0.40; the
        # warmup now gates on < 5% per-step drift before timing)
        "m_drift": round(
            abs(m_last - m_first) / max(m_last, 1e-6), 4
        ) if m_last is not None else None,
        "sample_budget": budget,
        "elapsed_s": round(time.time() - _T_START, 1),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # the driver's contract: ALWAYS one JSON line
        import traceback
        traceback.print_exc()
        _JSON_EMITTED[0] = True
        print(json.dumps({
            "metric": "train_rays_per_sec_per_chip",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": f"{type(exc).__name__}: {exc}",
        }))
        sys.exit(0)

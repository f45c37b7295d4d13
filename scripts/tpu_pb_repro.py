"""Repro: pixel_bandwidth.forward_fused per-stage finiteness on the
current default backend (ROADMAP round-4: non-finite on TPU with the
unit-test calibration tau_in=1e-4 / f_c_sf=500 while finite on CPU).

Prints one `STAGE <name> finite=<bool>` line per pipeline stage and
exits 1 if any stage is non-finite. Run with the default (TPU) backend
or JAX_PLATFORMS-equivalent override via --cpu.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from deblur_e_nerf_tpu.models import pixel_bandwidth as pb

CALIB = {
    pb.TAU_IN_IT_EFF_PROD_KEY: 1e-4,
    pb.TAU_MIL_IT_EFF_PROD_KEY: 2e-5,
    pb.A_AMP_KEY: 50.0,
    pb.A_CL_KEY: 10.0,
    pb.TAU_OUT_KEY: 1e-4,
    pb.F_C_SF_KEY: 500.0,
    pb.F_C_DIFF_KEY: 200.0,
}


def main():
    print("backend:", jax.default_backend(), jax.devices())
    params, consts = pb.init_pixel_bandwidth(
        CALIB, min_ts=0, f_c_dominant_min=21.0,
        target_cumprob_max_sample_lifetime=0.95,
    )
    S, N = 30, 64
    R = 4
    gen = jnp.full((S - 1, R * N), 0.5, jnp.float32)
    output_ts = (
        jnp.arange(R * N, dtype=jnp.int64) * 1_000_000
        + 2_000_000_000
    )
    output_delta = jnp.zeros((R * N,), jnp.float32)

    failures = []

    def check(name, value):
        ok = bool(jnp.all(jnp.isfinite(value)))
        print(f"STAGE {name} finite={ok} "
              f"min={float(jnp.min(value)):.3e} "
              f"max={float(jnp.max(value)):.3e}", flush=True)
        if not ok:
            failures.append(name)

    lt = jax.jit(pb.sample_lifetimes)(params, consts, gen)
    check("sample_lifetimes", lt)

    base, delta, dt = jax.jit(pb._sample_times)(
        params, consts, gen, output_ts, output_delta
    )
    check("sample_dt", dt)

    def sampling_fn(sample_base, sample_delta):
        t = sample_base.astype(jnp.float32) * 1e-9 + sample_delta * 1e-9
        return (1.5 + jnp.sin(t),)

    intensity = sampling_fn(base, delta)[0]
    check("intensity", intensity)

    weight = jax.jit(lambda p, c, it, dt: pb.intensity_sample_to_weight(
        p, c, it, dt, output_sf_log_it=True))(
        params, consts, intensity, dt)
    check("weight", weight)

    out, _, _ = jax.jit(
        lambda p, c, g, ts, d: pb.forward_fused(
            p, c, g, ts, d, sampling_fn, N)
    )(params, consts, gen, output_ts, output_delta)
    check("forward_fused", out)

    if failures:
        print("NONFINITE:", ",".join(failures))
        sys.exit(1)
    print("ALL_FINITE")


if __name__ == "__main__":
    main()

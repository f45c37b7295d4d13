#!/usr/bin/env python
"""Round-4 perf microbenchmarks: hash-grid gather/scatter strategies.

Measures, on the real TPU, the candidate replacements for the hash-table
backward (the measured wall: ~6.4 ns/element single-channel scatter-add,
BASELINE.md): sort+boundary-diff, multi-channel row scatters at several
widths, bf16 tables, and Pallas serial-accumulate probes. Each case is
timed with a scalar host fetch (the relay's block_until_ready is a no-op;
sync floor ~36 ms/call, so sizes are chosen >> that).

Usage: python scripts/perf_microbench.py [case ...]
"""

import functools
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 24            # contributions (16M)
T = 1 << 19            # table rows
REPS = 4


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    # force a scalar host fetch off the result
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32).ravel()[:1024].sum()
                      if leaf.ndim else leaf))
    return (time.time() - t0) / REPS


def case_scatter_baseline():
    """Per-channel scatter-add, the current backward primitive."""
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    val = jax.random.normal(key, (N,), jnp.float32)

    @jax.jit
    def f(idx, val):
        return jnp.zeros((T,), jnp.float32).at[idx].add(val)

    dt = timeit(f, idx, val)
    print(f"scatter_1ch: {dt*1e3:.1f} ms  {dt/N*1e9:.2f} ns/elem")


def case_scatter_rows():
    """Row scatter-adds at widths 2/8/16/32 (cell-row candidates)."""
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N // 8,), 0, T // 8, jnp.int32)
    for W in (2, 8, 16, 32):
        val = jax.random.normal(key, (N // 8, W), jnp.float32)

        @jax.jit
        def f(idx, val, W=W):
            return jnp.zeros((T // 8, W), jnp.float32).at[idx].add(val)

        dt = timeit(f, idx, val)
        n_rows = N // 8
        print(f"scatter_row w={W}: {dt*1e3:.1f} ms  "
              f"{dt/n_rows*1e9:.1f} ns/row  "
              f"{dt/(n_rows*W)*1e9:.2f} ns/elem")


def case_scatter_bf16():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    val = jax.random.normal(key, (N,), jnp.bfloat16)

    @jax.jit
    def f(idx, val):
        return jnp.zeros((T,), jnp.bfloat16).at[idx].add(val)

    dt = timeit(f, idx, val)
    print(f"scatter_1ch_bf16: {dt*1e3:.1f} ms  {dt/N*1e9:.2f} ns/elem")


def case_sort_boundary_diff():
    """sort by index + cumsum + per-row boundary gather (exact segment
    sum without ANY scatter): grad[t] = csum[hi(t)] - csum[lo(t)]."""
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    v0 = jax.random.normal(key, (N,), jnp.float32)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (N,), jnp.float32)

    @jax.jit
    def f(idx, v0, v1):
        sidx, s0, s1 = jax.lax.sort((idx, v0, v1), num_keys=1)
        c0 = jnp.cumsum(s0)
        c1 = jnp.cumsum(s1)
        # boundary positions for every table row: searchsorted on the
        # sorted index array
        bounds = jnp.searchsorted(
            sidx, jnp.arange(T + 1, dtype=jnp.int32), method="scan_unrolled"
        )
        lo, hi = bounds[:-1], bounds[1:]
        z0 = jnp.where(hi > lo, c0[jnp.maximum(hi - 1, 0)]
                       - jnp.where(lo > 0, c0[jnp.maximum(lo - 1, 0)], 0.0),
                       0.0)
        z1 = jnp.where(hi > lo, c1[jnp.maximum(hi - 1, 0)]
                       - jnp.where(lo > 0, c1[jnp.maximum(lo - 1, 0)], 0.0),
                       0.0)
        return z0, z1

    dt = timeit(f, idx, v0, v1)
    print(f"sort_boundary_diff (2ch): {dt*1e3:.1f} ms  "
          f"{dt/(2*N)*1e9:.2f} ns/elem-equiv")
    # correctness spot check
    z0, _ = f(idx, v0, v1)
    want = jnp.zeros((T,), jnp.float32).at[idx].add(v0)
    err = float(jnp.max(jnp.abs(z0 - want)))
    print(f"  max err vs scatter: {err:.2e}")


def case_gather_rows():
    """Row gathers at widths 2/16 (fwd cost model refresh)."""
    key = jax.random.PRNGKey(0)
    for W in (2, 16):
        tbl = jax.random.normal(key, (T, W), jnp.float32)
        idx = jax.random.randint(key, (N // 8,), 0, T, jnp.int32)

        @jax.jit
        def f(tbl, idx):
            return jnp.take(tbl, idx, axis=0)

        dt = timeit(f, tbl, idx)
        print(f"gather_row w={W}: {dt*1e3:.1f} ms  "
              f"{dt/(N//8)*1e9:.1f} ns/row")


def case_pallas_probe():
    """Can Mosaic (current libtpu) lower a serial dynamic-index
    accumulate loop? Table tile resident in VMEM; contributions stream
    as (idx, 16-float row)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = 1 << 16       # contributions in this probe
    TT = 4096            # table rows (VMEM resident: 4096 x 16 f32 = 256KB)

    def kernel(idx_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            r = idx_ref[i]
            out_ref[pl.ds(r, 1), :] += val_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, ROWS, body, 0)

    @jax.jit
    def f(idx, val):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((TT, 16), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, val)

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (ROWS,), 0, TT, jnp.int32)
    val = jax.random.normal(key, (ROWS, 16), jnp.float32)
    try:
        dt = timeit(f, idx, val)
        out = f(idx, val)
        want = jnp.zeros((TT, 16), jnp.float32).at[idx].add(val)
        err = float(jnp.max(jnp.abs(out - want)))
        print(f"pallas_serial_accum: {dt*1e3:.1f} ms  "
              f"{dt/ROWS*1e9:.1f} ns/row  err={err:.2e}")
    except Exception as exc:
        print(f"pallas_serial_accum: FAILED ({type(exc).__name__}: "
              f"{str(exc)[:300]})")


def case_pallas_gather_probe():
    """Mosaic dynamic row gather probe: out[i] = tbl[idx[i]]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = 1 << 16
    TT = 4096

    def kernel(idx_ref, tbl_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(idx_ref[i], 1), :]
            return 0
        jax.lax.fori_loop(0, ROWS, body, 0)

    @jax.jit
    def f(idx, tbl):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, 16), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, tbl)

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (ROWS,), 0, TT, jnp.int32)
    tbl = jax.random.normal(key, (TT, 16), jnp.float32)
    try:
        dt = timeit(f, idx, tbl)
        out = f(idx, tbl)
        err = float(jnp.max(jnp.abs(out - jnp.take(tbl, idx, axis=0))))
        print(f"pallas_serial_gather: {dt*1e3:.1f} ms  "
              f"{dt/ROWS*1e9:.1f} ns/row  err={err:.2e}")
    except Exception as exc:
        print(f"pallas_serial_gather: FAILED ({type(exc).__name__}: "
              f"{str(exc)[:300]})")


CASES = {
    "scatter_baseline": case_scatter_baseline,
    "scatter_rows": case_scatter_rows,
    "scatter_bf16": case_scatter_bf16,
    "sort_boundary_diff": case_sort_boundary_diff,
    "gather_rows": case_gather_rows,
    "pallas_probe": case_pallas_probe,
    "pallas_gather_probe": case_pallas_gather_probe,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    print(f"devices: {jax.devices()}")
    for name in names:
        CASES[name]()

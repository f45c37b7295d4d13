"""Pallas TPU row scatter-add: grad-table accumulation for cell-row
hash levels.

Replaces the XLA `zeros.at[idx].add(rows)` used by the hash-encoding
backward (models/hash_encoding.py) for cell-row levels, where XLA's
scatter costs ~6.4 ns per ELEMENT regardless of row width (BASELINE.md
microbenchmarks) — ~110 ns per 16-float row. This kernel keeps the
destination table resident in VMEM and serially accumulates rows with
scalar dynamic indexing (Mosaic lowers `ref[pl.ds(i, 1), :] +=` with an
SMEM scalar index); the loop is scalar-issued but each iteration is one
sublane RMW, targeting ~10-30 ns/row.

The kernel is an OPTIONAL fast path: `available()` probes whether the
current backend lowers it (round-2 Mosaic rejected every scatter form;
newer libtpu may not), and callers fall back to the XLA scatter.

Replaces (perf only, same math): tiny-cuda-nn's hash-grid gradient
kernel, reference dependency external/ngp.py:166-187.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_CHUNK = 1024  # contribution rows per grid step


def _kernel(idx_ref, val_ref, out_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        r = idx_ref[i]
        out_ref[pl.ds(r, 1), :] += val_ref[pl.ds(i, 1), :]
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _scatter_add_rows_pallas(idx, val, n_rows, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, width = val.shape
    pad = (-n) % _CHUNK
    if pad:
        # padded rows target row 0 with zero value (harmless add)
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        val = jnp.concatenate(
            [val, jnp.zeros((pad, width), val.dtype)])
    grid = (idx.shape[0] // _CHUNK,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_CHUNK, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, width), val.dtype),
        interpret=interpret,
    )(idx, val)


def scatter_add_rows(idx, val, n_rows, interpret=False):
    """out[idx[i], :] += val[i, :] over a fresh (n_rows, width) zeros.

    Args:
        idx: (N,) int32 row indices in [0, n_rows).
        val: (N, width) float32 contribution rows.
        n_rows: static output row count.
    """
    return _scatter_add_rows_pallas(idx, val, int(n_rows),
                                    bool(interpret))


@functools.lru_cache(maxsize=1)
def available():
    """Probe: does the current backend compile + correctly run the
    kernel? (Mosaic support for dynamic-index RMW varies by libtpu.)"""
    try:
        idx = jnp.asarray(np.array([1, 3, 1, 0], np.int32))
        val = jnp.asarray(
            np.arange(4 * 16, dtype=np.float32).reshape(4, 16))
        out = scatter_add_rows(idx, val, 8)
        want = np.zeros((8, 16), np.float32)
        np.add.at(want, np.asarray(idx), np.asarray(val))
        return bool(np.allclose(np.asarray(out), want))
    except Exception:
        return False

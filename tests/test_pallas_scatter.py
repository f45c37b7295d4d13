"""Pallas row scatter-add kernel (optional TPU fast path for the
hash-grid backward; falls back to XLA scatter when Mosaic rejects it)."""

import numpy as np
import jax.numpy as jnp

from deblur_e_nerf_tpu.ops import pallas_scatter as ps


def test_scatter_add_rows_interpret_matches_numpy():
    rng = np.random.default_rng(0)
    N, T, W = 5000, 512, 16
    idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
    val = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))
    out = ps.scatter_add_rows(idx, val, T, interpret=True)
    want = np.zeros((T, W), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(val))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6,
                               atol=1e-5)


def test_scatter_add_rows_nonmultiple_chunk_padding():
    rng = np.random.default_rng(1)
    N, T, W = 1025, 64, 16  # not a multiple of the kernel chunk
    idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
    val = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))
    out = ps.scatter_add_rows(idx, val, T, interpret=True)
    want = np.zeros((T, W), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(val))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6,
                               atol=1e-5)

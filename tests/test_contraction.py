"""Contractions: reference-formula parity and inverse round-trips."""

import jax.numpy as jnp
import numpy as np

from deblur_e_nerf_tpu.models.contraction import (
    ContractionType, contract, contract_inv,
)

AABB = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)


def reference_contract_to_unisphere(x, aabb):
    """Direct port of the reference math for the oracle
    (reference: external/ngp.py:68-93)."""
    aabb_min, aabb_max = aabb[:3], aabb[3:]
    x = (x - aabb_min) / (aabb_max - aabb_min)
    x = x * 2 - 1
    mag = np.linalg.norm(x, axis=-1, keepdims=True)
    mask = mag > 1
    x = np.where(mask, (2 - 1 / mag) * (x / mag), x)
    return x / 4 + 0.5


def test_sphere_matches_reference_formula():
    rng = np.random.default_rng(0)
    x = rng.uniform(-6, 6, (1000, 3))
    got = np.asarray(
        contract(jnp.asarray(x), jnp.asarray(AABB),
                 ContractionType.UN_BOUNDED_SPHERE)
    )
    want = reference_contract_to_unisphere(
        x, np.asarray(AABB, dtype=np.float64)
    )
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert np.all((got >= 0) & (got <= 1))


def test_tanh_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.uniform(-6, 6, (1000, 3))
    aabb = np.asarray(AABB, dtype=np.float64)
    u = (x - aabb[:3]) / (aabb[3:] - aabb[:3]) - 0.5
    want = (np.tanh(u) + 1) / 2
    got = np.asarray(
        contract(jnp.asarray(x), jnp.asarray(AABB),
                 ContractionType.UN_BOUNDED_TANH)
    )
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_inverse_roundtrip_all_types():
    rng = np.random.default_rng(2)
    for ctype, span in [
        (ContractionType.AABB, 1.5),
        (ContractionType.UN_BOUNDED_SPHERE, 20.0),
        (ContractionType.UN_BOUNDED_TANH, 4.0),
    ]:
        x = rng.uniform(-span, span, (500, 3))
        aabb = jnp.asarray(AABB, dtype=jnp.float64)
        u = contract(jnp.asarray(x), aabb, ctype)
        x_back = np.asarray(contract_inv(u, aabb, ctype))
        np.testing.assert_allclose(
            x_back, x, rtol=1e-5, atol=1e-5,
            err_msg=f"roundtrip failed for {ctype}",
        )


def test_inverse_grid_coverage():
    """Every grid-cell coordinate in [0,1]^3 must map to a finite world
    position (needed by occupancy-grid sampling)."""
    u = np.stack(np.meshgrid(*[np.linspace(0.001, 0.999, 9)] * 3),
                 axis=-1).reshape(-1, 3)
    for ctype in ContractionType:
        x = np.asarray(
            contract_inv(jnp.asarray(u), jnp.asarray(AABB), ctype)
        )
        assert np.isfinite(x).all(), ctype

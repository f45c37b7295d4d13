"""Quaternion ops vs scipy.spatial.transform oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from deblur_e_nerf_tpu.ops import quat


def random_unit_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_product_matches_scipy():
    rng = np.random.default_rng(0)
    p = random_unit_quats(rng, 32)
    q = random_unit_quats(rng, 32)
    got = np.asarray(quat.quat_product(p, q))
    want = (Rotation.from_quat(p) * Rotation.from_quat(q)).as_quat()
    # scipy composes r1 * r2 as rotation composition; quaternion product
    # p * q in Hamilton convention equals the composition of p after q
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, sign * want, atol=1e-12)


def test_unitquat_to_rotmat_matches_scipy():
    rng = np.random.default_rng(1)
    q = random_unit_quats(rng, 64)
    got = np.asarray(quat.unitquat_to_rotmat(q))
    want = Rotation.from_quat(q).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotvec_roundtrip():
    rng = np.random.default_rng(2)
    rotvec = rng.standard_normal((64, 3))
    q = np.asarray(quat.rotvec_to_unitquat(rotvec))
    want = Rotation.from_rotvec(rotvec).as_quat()
    sign = np.sign(np.sum(q * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * want, atol=1e-12)


def test_rotvec_small_angle():
    rotvec = np.array([[1e-7, -2e-7, 5e-8], [0.0, 0.0, 0.0]])
    q = np.asarray(quat.rotvec_to_unitquat(rotvec))
    want = Rotation.from_rotvec(rotvec).as_quat()
    np.testing.assert_allclose(q, want, atol=1e-15)


def test_full_rotvec_angle_range():
    """Full rotvec keeps angles in [0, 2*pi] (no shortest-path collapsing)."""
    rng = np.random.default_rng(3)
    # quaternions with negative w correspond to angles > pi
    q = random_unit_quats(rng, 128)
    rotvec = np.array(quat.unitquat_to_full_rotvec(q))
    angles = np.linalg.norm(rotvec, axis=-1)
    assert np.all(angles >= 0) and np.all(angles <= 2 * np.pi + 1e-9)
    # rotation equivalence: Rotation.from_rotvec reduces mod 2*pi
    want = Rotation.from_quat(q).as_matrix()
    got = Rotation.from_rotvec(rotvec).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize("shortest_path", [True, False])
def test_slerp_matches_scipy(shortest_path):
    rng = np.random.default_rng(4)
    n = 16
    q0 = random_unit_quats(rng, n)
    q1 = random_unit_quats(rng, n)
    if not shortest_path:
        # align hemispheres so scipy's (shortest-path) slerp is comparable
        dot = np.sum(q0 * q1, axis=-1, keepdims=True)
        q1 = np.where(dot < 0, -q1, q1)
    steps = rng.uniform(0, 1, size=n)
    got = np.asarray(
        quat.unitquat_slerp(q0, q1, steps, shortest_path=shortest_path)
    )
    for i in range(n):
        slerp = Slerp(
            [0.0, 1.0], Rotation.from_quat(np.stack([q0[i], q1[i]]))
        )
        want = slerp([steps[i]]).as_quat()[0]
        sign = np.sign(np.sum(got[i] * want))
        np.testing.assert_allclose(got[i], sign * want, atol=1e-9)


def test_slerp_endpoints():
    rng = np.random.default_rng(5)
    q0 = random_unit_quats(rng, 8)
    q1 = random_unit_quats(rng, 8)
    at0 = np.asarray(quat.unitquat_slerp(q0, q1, np.zeros(8)))
    np.testing.assert_allclose(at0, q0, atol=1e-12)
    at1 = np.asarray(
        quat.unitquat_slerp(q0, q1, np.ones(8), shortest_path=True)
    )
    dot = np.sum(q0 * q1, axis=-1, keepdims=True)
    q1_flipped = np.where(dot < 0, -q1, q1)
    np.testing.assert_allclose(at1, q1_flipped, atol=1e-9)


def test_slerp_gradient_finite_at_identical_quats():
    """Zero-rotation slerp (q0 == q1, or weight 0) must have finite
    gradients w.r.t. the interpolation weight — this is the refractory
    period's gradient path when timestamps clamp to a pose corner."""
    import jax
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0])

    def f(w):
        out = quat.unitquat_slerp(q, q, w, shortest_path=True)
        return jnp.sum(out)

    g = jax.grad(f)(jnp.asarray(0.3))
    assert np.isfinite(float(g))

    q2 = jnp.asarray([0.1, 0.2, 0.0, 0.97])
    q2 = q2 / jnp.linalg.norm(q2)

    def f2(w):
        return jnp.sum(quat.unitquat_slerp(q, q2, w))

    g2 = jax.grad(f2)(jnp.asarray(0.0))
    assert np.isfinite(float(g2))

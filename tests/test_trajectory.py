"""Trajectory interpolation: analytic lerp/slerp checks."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation, Slerp

from deblur_e_nerf_tpu.models import trajectory as traj


def make_poses(rng, C=10):
    ts = np.sort(rng.choice(np.arange(1, 10**9, dtype=np.int64), C,
                            replace=False))
    pos = rng.standard_normal((C, 3)).astype(np.float32)
    q = rng.standard_normal((C, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return {
        "T_wc_position": pos,
        "T_wc_orientation": q.astype(np.float32),
        "T_wc_timestamp": ts,
    }


@pytest.mark.slow
def test_interpolation_at_knots():
    rng = np.random.default_rng(0)
    poses = make_poses(rng)
    t = traj.make_trajectory(poses)
    p, R = traj.interpolate_pose(t, poses["T_wc_timestamp"])
    np.testing.assert_allclose(np.asarray(p), poses["T_wc_position"],
                               atol=1e-5)
    want = Rotation.from_quat(poses["T_wc_orientation"]).as_matrix()
    np.testing.assert_allclose(np.asarray(R), want, atol=1e-5)


@pytest.mark.slow
def test_interpolation_midpoints():
    rng = np.random.default_rng(1)
    poses = make_poses(rng, C=5)
    t = traj.make_trajectory(poses)
    ts = poses["T_wc_timestamp"]
    mid = (ts[:-1] + ts[1:]) // 2
    p, R = traj.interpolate_pose(t, mid)

    for i in range(len(mid)):
        w = (mid[i] - ts[i]) / (ts[i + 1] - ts[i])
        want_p = (1 - w) * poses["T_wc_position"][i] \
            + w * poses["T_wc_position"][i + 1]
        np.testing.assert_allclose(np.asarray(p[i]), want_p, atol=1e-5)
        q0, q1 = poses["T_wc_orientation"][i], poses["T_wc_orientation"][i+1]
        if np.dot(q0, q1) < 0:
            q1 = -q1
        slerp = Slerp([0, 1], Rotation.from_quat(np.stack([q0, q1])))
        want_R = slerp([w]).as_matrix()[0]
        np.testing.assert_allclose(np.asarray(R[i]), want_R, atol=1e-4)


def test_float64_weight_precision():
    """Interpolation weights must resolve ns offsets in second-long bins."""
    poses = {
        "T_wc_position": np.array([[0, 0, 0], [1, 0, 0]], np.float32),
        "T_wc_orientation": np.array(
            [[0, 0, 0, 1], [0, 0, 0, 1]], np.float32
        ),
        "T_wc_timestamp": np.array([0, 10**9], np.int64),
    }
    t = traj.make_trajectory(poses)
    p1, _ = traj.interpolate_pose(t, np.array([500_000_000], np.int64))
    p2, _ = traj.interpolate_pose(t, np.array([500_000_100], np.int64))
    # 100 ns in a 1 s bin = 1e-7 difference in weight, resolvable in f64
    # (f32 would quantize both weights to the same value)
    diff = float(np.asarray(p2[0, 0], dtype=np.float64)
                 - np.asarray(p1[0, 0], dtype=np.float64))
    assert 0 < diff < 1e-6

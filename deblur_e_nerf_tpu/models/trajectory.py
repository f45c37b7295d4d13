"""Continuous-time camera trajectory from discrete pose samples.

Functional JAX analog of the reference's LinearTrajectory
(reference: deblur_e_nerf/models/trajectories.py:8-90): binary-search the
pose timeline, lerp positions, slerp orientations with full-angle rotation
vectors and per-element steps
(reference: deblur_e_nerf/utils/tensor_ops.py:118-184).

Interpolation weights are computed in float64 (timestamps are int64 ns, and
pose bins can span milliseconds — float32 weight math would quantize to
~60 ns at 1 s timelines); positions/orientations are float32.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import quat


class Trajectory(NamedTuple):
    """Static (non-learnable) trajectory data; a pytree of device arrays."""
    T_wc_position: jnp.ndarray          # (C, 3) float32
    T_wc_orientation_quat: jnp.ndarray  # (C, 4) float32 XYZW
    T_wc_timestamp: jnp.ndarray         # (C,) int64 ns
    bin_width: jnp.ndarray              # (C-1,) float64 ns


def make_trajectory(camera_poses):
    """Build a Trajectory from a camera-poses dict (host numpy arrays)."""
    ts = np.asarray(camera_poses["T_wc_timestamp"], dtype=np.int64)
    return Trajectory(
        T_wc_position=jnp.asarray(
            camera_poses["T_wc_position"], dtype=jnp.float32
        ),
        T_wc_orientation_quat=jnp.asarray(
            camera_poses["T_wc_orientation"], dtype=jnp.float32
        ),
        T_wc_timestamp=jnp.asarray(ts),
        bin_width=jnp.asarray(np.diff(ts).astype(np.float64)),
    )


def interpolate_pose(trajectory, timestamp):
    """Interpolate camera pose at the given timestamps.

    Args:
        trajectory: Trajectory.
        timestamp: (...,) int64/float64 ns, within the trajectory's range.
    Returns:
        position: (..., 3) float32
        orientation: (..., 3, 3) float32 rotation matrices
    """
    ts_line = trajectory.T_wc_timestamp
    timestamp = jnp.asarray(timestamp)
    right = jnp.searchsorted(ts_line, timestamp)
    is_corner = timestamp == ts_line[0]
    left = jnp.where(is_corner, right, right - 1)
    right = jnp.clip(right, 0, ts_line.shape[0] - 1)
    left = jnp.clip(left, 0, ts_line.shape[0] - 1)

    t_left = ts_line[left]
    weight64 = (
        (timestamp - t_left).astype(jnp.float64)
        / trajectory.bin_width[jnp.clip(left, 0, ts_line.shape[0] - 2)]
    )
    weight = weight64.astype(jnp.float32)

    p0 = trajectory.T_wc_position[left]
    p1 = trajectory.T_wc_position[right]
    position = p0 + weight[..., None] * (p1 - p0)

    q0 = trajectory.T_wc_orientation_quat[left]
    q1 = trajectory.T_wc_orientation_quat[right]
    q = quat.unitquat_slerp(q0, q1, weight, shortest_path=True)
    orientation = quat.unitquat_to_rotmat(q)
    return position, orientation

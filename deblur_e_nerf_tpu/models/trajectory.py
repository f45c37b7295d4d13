"""Continuous-time camera trajectory from discrete pose samples.

Functional JAX analog of the reference's LinearTrajectory
(reference: deblur_e_nerf/models/trajectories.py:8-90): binary-search the
pose timeline, lerp positions, slerp orientations with full-angle rotation
vectors and per-element steps
(reference: deblur_e_nerf/utils/tensor_ops.py:118-184).

Timestamps are int64 nanoseconds END TO END: the TPU backend's float64 is
emulated with float32-precision multiplies (measured ~1.5e-5 relative
error — tens of microseconds at second-scale timelines, enough to
decorrelate event supervision), so interpolation uses exact int64
searchsorted/subtraction and only converts the small within-bin remainder
to float32. Differentiable sub-nanosecond offsets (learnable refractory
shifts, sampled interval positions) ride in a separate float32 `delta`
carried alongside the integer base (see training/step.py).
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
    bin_width: jnp.ndarray              # (C-1,) float32 ns


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
        bin_width=jnp.asarray(np.diff(ts).astype(np.float32)),
    )


def interpolate_pose(trajectory, timestamp, timestamp_delta=None):
    """Interpolate camera pose at the given timestamps.

    Args:
        trajectory: Trajectory.
        timestamp: (...,) int64 ns (floats accepted and truncated to ns),
            within the trajectory's range.
        timestamp_delta: optional (...,) float32 sub-nanosecond-scale
            differentiable offset added to `timestamp` (carries gradients
            for learnable time shifts; keep it small — it only enters the
            float32 within-bin remainder).
    Returns:
        position: (..., 3) float32
        orientation: (..., 3, 3) float32 rotation matrices
    """
    ts_line = trajectory.T_wc_timestamp
    timestamp = jnp.asarray(timestamp)
    if not jnp.issubdtype(timestamp.dtype, jnp.integer):
        timestamp = timestamp.astype(ts_line.dtype)
    # jnp.searchsorted's default 'scan' method lowers to a serial while
    # loop of gathers — profiled at ~1s/step on the training workload.
    # For short pose timelines a vectorized compare-against-all is ~free;
    # for long ones the unrolled binary search is log2(C) batched gathers.
    method = "compare_all" if ts_line.shape[0] <= 256 else "scan_unrolled"
    right = jnp.searchsorted(ts_line, timestamp, method=method)
    is_corner = timestamp == ts_line[0]
    left = jnp.where(is_corner, right, right - 1)
    right = jnp.clip(right, 0, ts_line.shape[0] - 1)
    left = jnp.clip(left, 0, ts_line.shape[0] - 1)

    t_left = ts_line[left]
    remainder = (timestamp - t_left).astype(jnp.float32)  # exact int math
    if timestamp_delta is not None:
        remainder = remainder + timestamp_delta
    weight = remainder / trajectory.bin_width[
        jnp.clip(left, 0, ts_line.shape[0] - 2)
    ]

    p0 = trajectory.T_wc_position[left]
    p1 = trajectory.T_wc_position[right]
    position = p0 + weight[..., None] * (p1 - p0)

    q0 = trajectory.T_wc_orientation_quat[left]
    q1 = trajectory.T_wc_orientation_quat[right]
    q = quat.unitquat_slerp(q0, q1, weight, shortest_path=True)
    orientation = quat.unitquat_to_rotmat(q)
    return position, orientation

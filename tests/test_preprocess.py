"""Preprocessing scripts: ESIM flagfile/physics and EDS conversion."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import eds_to_esim  # noqa: E402
import preprocess_esim  # noqa: E402


# ---------------------------------------------------------------- ESIM
def test_flagfile_parse(tmp_path):
    conf_path = tmp_path / "esim.conf"
    conf_path.write_text(
        "# ESIM config\n"
        "--renderer_type=4\n"
        "--blender_interm_color_space=1\n"
        "--contrast_threshold_pos=0.3\n"
        "--contrast_threshold_neg=0.2\n"
        "--refractory_period_ns=1000\n"
        "--I_p_to_intensity_ratio_fa=2000\n"
        "--dark_current_fa=4\n"
        "--photodiode_cap_ff=35\n"
        "--miller_cap_ff=0.6\n"
        "--thermal_voltage_mv=25\n"
        "--output_time_const_us=25\n"
        "--sf_cutoff_freq_hz=16400\n"
        "--diff_amp_cutoff_freq_hz=82000\n"
        "--simulate_color_events=true\n"
        "--unknown_flag=ignored\n"
    )
    conf = preprocess_esim.parse_flagfile(str(conf_path))
    assert conf.renderer_type == 4
    assert conf.contrast_threshold_pos == pytest.approx(0.3)
    assert conf.refractory_period_ns == 1000
    assert conf.simulate_color_events is True

    physics = preprocess_esim.derive_calibration_physics(conf)
    # tau_in * it_eff = C_p * V_T / ratio = 35 fF * 25 mV / 2000 fA
    assert physics["input_time_const_eff_it_prod"] == pytest.approx(
        35 * 25e-3 / 2000
    )
    assert physics["miller_time_const_eff_it_prod"] == pytest.approx(
        0.6 * 25e-3 / 2000
    )
    assert physics["black_level"] == pytest.approx(
        np.full(3, 4 / 2000, np.float32)
    )
    assert physics["closed_loop_gain"] == pytest.approx(1 / 0.7)
    assert physics["output_time_const"] == pytest.approx(25e-6)
    assert physics["bayer_pattern"] == "RGGB"

    params = preprocess_esim.renderer_params(conf)
    assert params["interm_color_space"] == "linear"


def test_nested_flagfile_and_bool_negation(tmp_path):
    inner = tmp_path / "inner.conf"
    inner.write_text("--contrast_threshold_pos=0.7\n")
    outer = tmp_path / "outer.conf"
    outer.write_text(
        f"--flagfile={inner.name}\n--nosimulate_color_events\n"
    )
    conf = preprocess_esim.parse_flagfile(str(outer))
    assert conf.contrast_threshold_pos == pytest.approx(0.7)
    assert conf.simulate_color_events is False


def test_pose_and_event_filters():
    ts = np.array([10, 20, 30, 40], np.int64)
    imu = np.array([20, 40], np.int64)
    pos = np.arange(12, dtype=np.float32).reshape(4, 3)
    quat = np.tile(np.array([0, 0, 0, 1], np.float32), (4, 1))
    p, q, t = preprocess_esim.filter_imu_synced_poses(pos, quat, ts, imu)
    np.testing.assert_array_equal(t, [20, 40])
    np.testing.assert_array_equal(p, pos[[1, 3]])

    ev_pos = np.array([[0, 0], [1, 1], [2, 2]], np.uint16)
    ev_ts = np.array([15, 25, 45], np.int64)
    ev_pol = np.array([True, False, True])
    fp, ft, fpol = preprocess_esim.filter_events_to_pose_window(
        ev_pos, ev_ts, ev_pol, t
    )
    np.testing.assert_array_equal(ft, [25])
    np.testing.assert_array_equal(fp, [[1, 1]])


def test_rosbag_gated():
    with pytest.raises(ImportError, match="rosbag"):
        preprocess_esim.extract_rosbag("/nonexistent.bag")


# ----------------------------------------------------------------- EDS
@pytest.fixture()
def raw_eds(tmp_path):
    import cv2
    import h5py

    calib_dir = tmp_path / "calib"
    raw_dir = tmp_path / "raw"
    (raw_dir / "images").mkdir(parents=True)
    calib_dir.mkdir()

    calib = {
        "cam0": {  # RGB
            "camera_model": "pinhole",
            "intrinsics": [40.0, 40.0, 16.0, 12.0],
            "distortion_model": "none",
            "distortion_coeffs": [0.0, 0.0, 0.0, 0.0],
            "resolution": [32, 24],
        },
        "cam1": {  # event
            "camera_model": "pinhole",
            "intrinsics": [30.0, 30.0, 8.0, 8.0],
            "distortion_model": "radtan",
            "distortion_coeffs": [0.01, 0.0, 0.0, 0.0],
            "resolution": [16, 16],
            "T_cn_cnm1": np.eye(4).tolist(),
        },
    }
    import yaml
    with open(calib_dir / eds_to_esim.CALIBRATION_CONFIG_FILENAME,
              "w") as f:
        yaml.safe_dump(calib, f)

    # poses at 0.0 .. 1.0 s
    n_poses = 11
    t = np.linspace(0.0, 1.0, n_poses)
    poses = np.zeros((n_poses, 8))
    poses[:, 0] = t
    poses[:, 1] = np.linspace(0, 1, n_poses)  # x moves
    poses[:, 7] = 1.0  # identity quat (xyzw)
    np.savetxt(raw_dir / "stamped_groundtruth.txt", poses)

    # events in us
    rng = np.random.default_rng(0)
    n_ev = 500
    with h5py.File(raw_dir / "events.h5", "w") as f:
        f["x"] = rng.integers(0, 16, n_ev).astype(np.uint16)
        f["y"] = rng.integers(0, 16, n_ev).astype(np.uint16)
        f["t"] = np.sort(rng.integers(0, 1_000_000, n_ev))
        f["p"] = rng.integers(0, 2, n_ev).astype(np.uint8)

    # images + times.txt: id, t, exposure_ms, gain_db, filename
    lines = []
    for i, ts in enumerate([0.1, 0.5, 0.9]):
        name = f"img{i:03d}.png"
        img = np.full((24, 32, 3), 100 + i, np.uint8)
        cv2.imwrite(str(raw_dir / "images" / name), img)
        lines.append(f"{i} {ts} 5.0 6.0 {name}")
    (raw_dir / "times.txt").write_text("\n".join(lines) + "\n")
    return calib_dir, raw_dir, tmp_path / "out"


def test_eds_to_esim_end_to_end(raw_eds):
    calib_dir, raw_dir, out_dir = raw_eds
    argv = sys.argv
    sys.argv = [
        "eds_to_esim.py", str(calib_dir), str(raw_dir), str(out_dir)
    ]
    try:
        eds_to_esim.main()
    finally:
        sys.argv = argv

    calib = dict(np.load(out_dir / "camera_calibration.npz",
                         allow_pickle=False))
    assert calib["intrinsics"].shape == (3, 3)
    assert str(calib["distortion_model"]) == "plumb_bob"
    # Prophesee bias-derived CT ratio: (414-300)/(300-194) * 0.25
    assert calib["pos_contrast_threshold"] == pytest.approx(
        (414 - 300) / (300 - 194) * 0.25, rel=1e-6
    )
    # refractory period: 4e-23 * exp(27.64 * 1.5) V -> ns
    assert calib["refractory_period"] == pytest.approx(
        1e9 * 4e-23 * np.exp(27.64 * 1.5), rel=1e-5
    )

    poses = dict(np.load(out_dir / "camera_poses.npz"))
    assert poses["T_wc_timestamp"][0] == 0  # re-zeroed
    assert poses["T_wc_timestamp"][-1] == 10 ** 9

    events = dict(np.load(out_dir / "raw_events.npz"))
    assert events["timestamp"].min() >= 0
    assert events["timestamp"].max() <= 10 ** 9
    assert events["position"].dtype == np.uint16
    assert events["polarity"].dtype == bool

    with open(out_dir / "views" / "transforms_train.json") as f:
        transforms = json.load(f)
    assert len(transforms["frames"]) == 3
    frame = transforms["frames"][1]
    assert frame["exposure_time"] == 5 * 10 ** 6  # 5 ms in ns
    assert frame["gain"] == pytest.approx(10 ** (6 / 20))
    # pose at t=0.5: x should be ~0.5 (lerped), OpenGL convention flips
    # y/z columns of the rotation
    tf = np.array(frame["transform_matrix"])
    assert tf[0, 3] == pytest.approx(0.5, abs=1e-5)
    np.testing.assert_allclose(
        tf[:3, :3], np.diag([1, -1, -1]), atol=1e-5
    )
    # undistorted images exist
    assert (out_dir / "views" / "train" / "img001.png").exists()


def test_preprocess_esim_write_dataset(tmp_path):
    conf = preprocess_esim.EsimConf(
        contrast_threshold_pos=0.5, contrast_threshold_neg=0.4,
        I_p_to_intensity_ratio_fa=1000.0, photodiode_cap_ff=10.0,
    )
    raw = {
        "event_position": np.array([[1, 2], [3, 4], [5, 6]], np.uint16),
        "event_timestamp": np.array([5, 15, 30], np.int64),
        "event_polarity": np.array([True, False, True]),
        "T_wc_position": np.zeros((3, 3), np.float32),
        "T_wc_orientation": np.tile(
            np.array([0, 0, 0, 1], np.float32), (3, 1)
        ),
        "T_wc_timestamp": np.array([10, 20, 30], np.int64),
        "imu_timestamp": np.array([10, 20, 30], np.int64),
        "img_height": np.array(16, np.uint16),
        "img_width": np.array(16, np.uint16),
        "intrinsics": np.eye(3, dtype=np.float32),
        "distortion_params": np.zeros(4, np.float32),
        "distortion_model": np.array("plumb_bob"),
    }
    preprocess_esim.write_dataset(str(tmp_path), raw, conf)
    events = dict(np.load(tmp_path / "raw_events.npz"))
    np.testing.assert_array_equal(events["timestamp"], [15, 30])
    calib = dict(np.load(tmp_path / "camera_calibration.npz",
                         allow_pickle=False))
    assert calib["pos_contrast_threshold"] == pytest.approx(0.5)
    assert calib["input_time_const_eff_it_prod"] == pytest.approx(
        10 * 25e-3 / 1000
    )


@pytest.mark.slow
def test_eds_converted_dataset_trains(raw_eds):
    """Dress rehearsal (round 3): the eds_to_esim output layout drives
    the REAL training stack end to end — Trainer build, event packing,
    a few optimizer steps, and an event_view evaluation with finite
    metrics (reference real-data path: configs/train/07_*.yaml with
    eval_target [event_view])."""
    calib_dir, raw_dir, out_dir = raw_eds
    argv = sys.argv
    sys.argv = [
        "eds_to_esim.py", str(calib_dir), str(raw_dir), str(out_dir)
    ]
    try:
        eds_to_esim.main()
    finally:
        sys.argv = argv

    from deblur_e_nerf_tpu.training.trainer import Trainer
    from deblur_e_nerf_tpu.utils.config import load_config

    config = load_config("configs/train/07_ziggy_and_fuzz_hdr.yaml")
    config.data.dataset_directory = str(out_dir)
    config.data.train_dataset_ratio = 1.0
    config.data.val_dataset_ratio = 1.0
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.aabb = [-2.0, -2.0, -2.0, 2.0, 2.0, 2.0]
    config.model.nerf.near_plane = 0.05
    config.model.nerf.far_plane = 4.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 6
    config.trainer.accumulate_grad_batches = 2
    tr = Trainer(config, str(out_dir / "log"), batch_capacity=64,
                 sample_budget=4096)
    tr.train()
    metric = tr.evaluate("val", epoch=0, max_images=1)
    assert np.isfinite(metric["psnr"]), metric

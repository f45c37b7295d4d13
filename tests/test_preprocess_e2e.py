"""ESIM-preprocessor dress rehearsal: a rosbag-free fixture drives the
production message loop end-to-end (extract_messages -> write_dataset ->
Trainer -> finite val PSNR).

The fixture synthesizes duck-typed ROS messages from a physically
consistent synthetic scene, so the resulting dataset is the EXACT layout
`extract_rosbag` would produce (reference main path:
scripts/preprocess_esim.py:382-456) and training on it is meaningful.
"""

import os
import shutil
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import preprocess_esim  # noqa: E402

from deblur_e_nerf_tpu.data import synthetic  # noqa: E402
from deblur_e_nerf_tpu.utils.config import load_config  # noqa: E402


class _Stamp:
    def __init__(self, ns):
        self._ns = int(ns)

    def to_nsec(self):
        return self._ns


class _Obj:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _messages_from_synthetic(root):
    """Duck-typed (topic, msg) stream mirroring ESIM's four topics."""
    ev = np.load(os.path.join(root, "raw_events.npz"))
    poses = np.load(os.path.join(root, "camera_poses.npz"))
    calib = np.load(os.path.join(root, "camera_calibration.npz"))

    msgs = []
    # events arrive chunked, like rosbag EventArray messages
    n = len(ev["timestamp"])
    for lo in range(0, n, max(n // 3, 1)):
        hi = min(lo + max(n // 3, 1), n)
        events = [
            _Obj(x=int(p[0]), y=int(p[1]), ts=_Stamp(t),
                 polarity=bool(pol))
            for p, t, pol in zip(ev["position"][lo:hi],
                                 ev["timestamp"][lo:hi],
                                 ev["polarity"][lo:hi])
        ]
        msgs.append((preprocess_esim.EVENT_TOPIC, _Obj(
            events=events, height=int(calib["img_height"]),
            width=int(calib["img_width"]),
        )))
    msgs.append((preprocess_esim.CAMERA_INFO_TOPIC, _Obj(
        K=np.asarray(calib["intrinsics"], np.float64).reshape(-1),
        D=np.zeros(0), distortion_model="plumb_bob",
    )))
    for p, q, t in zip(poses["T_wc_position"],
                       poses["T_wc_orientation"],
                       poses["T_wc_timestamp"]):
        msgs.append((preprocess_esim.POSE_TOPIC, _Obj(
            pose=_Obj(position=_Obj(x=p[0], y=p[1], z=p[2]),
                      orientation=_Obj(x=q[0], y=q[1], z=q[2], w=q[3])),
            header=_Obj(stamp=_Stamp(t)),
        )))
        # every pose is IMU-synced except the last (exercises the
        # intersect filter)
        if t != poses["T_wc_timestamp"][-1]:
            msgs.append((preprocess_esim.IMU_TOPIC,
                         _Obj(header=_Obj(stamp=_Stamp(t)))))
    return msgs


CONF_TEXT = (
    "--renderer_type=4\n"
    "--blender_interm_color_space=1\n"
    "--contrast_threshold_pos=0.25\n"
    "--contrast_threshold_neg=0.25\n"
    "--refractory_period_ns=100\n"
    "--I_p_to_intensity_ratio_fa=2000\n"
    "--dark_current_fa=4\n"
    "--photodiode_cap_ff=35\n"
    "--miller_cap_ff=0.6\n"
    "--thermal_voltage_mv=25\n"
    "--output_time_const_us=25\n"
    "--sf_cutoff_freq_hz=16400\n"
    "--diff_amp_cutoff_freq_hz=82000\n"
)


@pytest.mark.slow
def test_preprocess_main_path_to_training(tmp_path):
    src = tmp_path / "src_scene"
    synthetic.make_dataset(
        str(src), img_height=16, img_width=16, num_poses=41,
        num_frames=41, contrast_threshold=0.25, num_views=2,
    )
    conf_path = tmp_path / "esim.conf"
    conf_path.write_text(CONF_TEXT)

    # ---- the production preprocessing path, minus only rosbag I/O ----
    out = tmp_path / "processed"
    os.makedirs(out)
    conf = preprocess_esim.parse_flagfile(str(conf_path))
    np.savez(
        os.path.join(str(out), preprocess_esim.RENDERER_PARAMS_FILENAME),
        **preprocess_esim.renderer_params(conf),
    )
    raw = preprocess_esim.extract_messages(_messages_from_synthetic(
        str(src)
    ))
    preprocess_esim.write_dataset(str(out), raw, conf)

    # layout + filter semantics
    ev = np.load(out / "raw_events.npz")
    src_ev = np.load(src / "raw_events.npz")
    poses = np.load(out / "camera_poses.npz")
    src_poses = np.load(src / "camera_poses.npz")
    assert len(poses["T_wc_timestamp"]) \
        == len(src_poses["T_wc_timestamp"]) - 1  # imu-sync filter
    in_window = src_ev["timestamp"] <= poses["T_wc_timestamp"][-1]
    assert len(ev["timestamp"]) == int(in_window.sum())
    calib = np.load(out / "camera_calibration.npz", allow_pickle=False)
    assert float(calib["pos_contrast_threshold"]) == 0.25
    np.testing.assert_allclose(
        np.asarray(calib["intrinsics"], np.float32),
        np.asarray(np.load(src / "camera_calibration.npz")["intrinsics"],
                   np.float32),
    )

    # ---- train on the preprocessed output -> finite val PSNR ----
    shutil.copytree(src / "views", out / "views")
    from deblur_e_nerf_tpu.training.trainer import Trainer
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(out)
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.aabb = [-4.0, -4.0, -4.0, 4.0, 4.0, 4.0]
    config.model.nerf.near_plane = 0.1
    config.model.nerf.far_plane = 8.0
    config.model.nerf.occ_grid.resolution = 16
    config.model.nerf.occ_grid.warmup_steps = 2
    config.model.nerf.ngp.pos_encoding.n_levels = 4
    config.model.nerf.ngp.pos_encoding.log2_hashmap_size = 10
    config.trainer.max_epochs = 1
    config.trainer.limit_train_batches = 50
    tr = Trainer(config, str(tmp_path / "log"), batch_capacity=64,
                 sample_budget=4096)
    tr.train()
    metric = tr.evaluate("val", epoch=0, max_images=1)
    assert np.isfinite(metric["psnr"]), metric

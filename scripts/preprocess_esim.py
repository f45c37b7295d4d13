#!/usr/bin/env python
"""Pre-process an ESIM `.conf` file + ESIM-generated rosbag into the
on-disk dataset layout consumed by `deblur_e_nerf_tpu.data`
(reference: scripts/preprocess_esim.py).

Outputs, in `dataset_path`:
  - `renderer_params.npz`    (planar / blender renderer parameters)
  - `raw_events.npz`         {position (N,2) u16, timestamp (N) i64,
                              polarity (N) bool}
  - `camera_poses.npz`       {T_wc_position (P,3) f32,
                              T_wc_orientation quat xyzw (P,4) f32,
                              T_wc_timestamp (P) i64}
  - `camera_calibration.npz` (intrinsics, distortion, image size, and the
                              full pixel-circuit physics constants)

The `.conf` flagfile doubles as the ESIM camera-physics schema; every flag
the reference defines (reference: scripts/preprocess_esim.py:27-132) is
accepted here with the same name, default, and derivation:
  tau_in  * it_eff = C_p   * V_T / I_p_to_it_ratio
  tau_mil * it_eff = C_mil * V_T / I_p_to_it_ratio
  black_level      = I_dark / I_p_to_it_ratio
  A_cl             = 1 / kappa

`rosbag` is an optional dependency (ROS1 environments only); the flagfile
parsing, physics derivations, and event/pose filtering are importable and
testable without it.
"""

import argparse
import dataclasses
import os
import shlex
import sys
from typing import Optional, Tuple

import numpy as np

INTERM_COLOR_SPACE_NAMES = {0: "display", 1: "linear"}
BAYER_PATTERN = "RGGB"
NULL_BAYER_PATTERN = ""  # monochrome camera
FROM_MILLI = 1e-3
FROM_MICRO = 1e-6

EVENT_TOPIC = "/cam0/events"
POSE_TOPIC = "/cam0/pose"
CAMERA_INFO_TOPIC = "/cam0/camera_info"
IMU_TOPIC = "/imu"

EVENTS_FILENAME = "raw_events.npz"
CAMERA_POSES_FILENAME = "camera_poses.npz"
CAMERA_CALIBRATION_FILENAME = "camera_calibration.npz"
RENDERER_PARAMS_FILENAME = "renderer_params.npz"

GAUSSIAN_BLUR_KSIZE = (21, 21)


@dataclasses.dataclass
class EsimConf:
    """ESIM simulator flags relevant to dataset preprocessing, with the
    simulator's defaults (reference: scripts/preprocess_esim.py:27-132)."""
    # renderer
    renderer_type: int = 0          # 0 planar, 4 blender (others: n/a)
    renderer_texture: str = ""
    renderer_hfov_cam_source_deg: float = 130.0
    renderer_preprocess_median_blur: int = 0
    renderer_preprocess_gaussian_blur: float = 0.0
    renderer_plane_x: float = 0.0
    renderer_plane_y: float = 0.0
    renderer_plane_z: float = -1.0
    renderer_plane_qw: float = 0.0
    renderer_plane_qx: float = 1.0
    renderer_plane_qy: float = 0.0
    renderer_plane_qz: float = 0.0
    blender_interm_color_space: int = 0
    # event generation
    contrast_threshold_pos: float = 1.0
    contrast_threshold_neg: float = 1.0
    refractory_period_ns: int = 0
    # pixel circuit physics
    I_p_to_intensity_ratio_fa: float = float("inf")
    dark_current_fa: float = 0.0
    amplifier_gain: float = float("inf")
    back_gate_coeff: float = 0.7
    thermal_voltage_mv: float = 25.0
    photodiode_cap_ff: float = 0.0
    miller_cap_ff: float = 0.0
    output_time_const_us: float = 0.0
    lower_cutoff_freq_hz: float = 0.0
    sf_cutoff_freq_hz: float = float("inf")
    diff_amp_cutoff_freq_hz: float = float("inf")
    # image formation
    log_eps: float = 0.001
    simulate_color_events: bool = False


_BOOL_STRINGS = {
    "true": True, "1": True, "yes": True,
    "false": False, "0": False, "no": False,
}


def parse_flagfile(path) -> EsimConf:
    """Parse an absl-style flagfile (`--flag=value` / `--noflag` lines,
    `#` comments, nested `--flagfile=`); unknown flags are ignored like the
    reference's `known_only=True` parse."""
    conf = EsimConf()
    fields = {f.name: f for f in dataclasses.fields(EsimConf)}

    def apply_line(line):
        line = line.strip()
        if not line or line.startswith("#"):
            return
        if not line.startswith("--"):
            return
        body = line[2:]
        if "=" in body:
            name, value = body.split("=", 1)
        else:
            name, value = body, None
        name = name.strip()
        if name == "flagfile" and value:
            nested = value.strip()
            if not os.path.isabs(nested):
                nested = os.path.join(os.path.dirname(path), nested)
            with open(nested) as g:
                for nested_line in g:
                    apply_line(nested_line)
            return
        negated = False
        if name not in fields and name.startswith("no"):
            name, negated = name[2:], True
        if name not in fields:
            return  # known_only=True semantics
        ftype = fields[name].type
        if value is None:
            parsed = not negated
        elif ftype == "bool" or ftype is bool:
            parsed = _BOOL_STRINGS[value.strip().lower()]
        elif ftype == "int" or ftype is int:
            parsed = int(value)
        elif ftype == "float" or ftype is float:
            parsed = float(value)
        else:
            parsed = shlex.split(value)[0] if value.strip() else ""
        setattr(conf, name, parsed)

    with open(path) as f:
        for line in f:
            apply_line(line)
    return conf


def derive_calibration_physics(conf: EsimConf) -> dict:
    """Pixel-circuit physics entries of `camera_calibration.npz`
    (reference: scripts/preprocess_esim.py:212-255)."""
    if conf.simulate_color_events:
        bayer_pattern, intensity_shape = BAYER_PATTERN, 3
    else:
        bayer_pattern, intensity_shape = NULL_BAYER_PATTERN, 1
    v_t = FROM_MILLI * conf.thermal_voltage_mv
    return {
        "pos_contrast_threshold": np.float32(conf.contrast_threshold_pos),
        "neg_contrast_threshold": np.float32(conf.contrast_threshold_neg),
        "refractory_period": np.array(conf.refractory_period_ns),
        "bayer_pattern": bayer_pattern,
        "input_time_const_eff_it_prod": np.float32(
            conf.photodiode_cap_ff * v_t / conf.I_p_to_intensity_ratio_fa
        ),
        "miller_time_const_eff_it_prod": np.float32(
            conf.miller_cap_ff * v_t / conf.I_p_to_intensity_ratio_fa
        ),
        "black_level": np.full(
            intensity_shape,
            conf.dark_current_fa / conf.I_p_to_intensity_ratio_fa,
            np.float32,
        ),
        "amplifier_gain": np.float32(conf.amplifier_gain),
        "closed_loop_gain": np.float32(1.0 / conf.back_gate_coeff),
        "output_time_const": np.float32(
            FROM_MICRO * conf.output_time_const_us
        ),
        "lower_cutoff_freq": np.float32(conf.lower_cutoff_freq_hz),
        "sf_cutoff_freq": np.float32(conf.sf_cutoff_freq_hz),
        "diff_amp_cutoff_freq": np.float32(conf.diff_amp_cutoff_freq_hz),
    }


def renderer_params(conf: EsimConf) -> dict:
    """Renderer-parameter entries of `renderer_params.npz`
    (reference: scripts/preprocess_esim.py:156-210)."""
    if conf.renderer_type == 0:  # planar
        import cv2
        planar_img = cv2.imread(conf.renderer_texture)
        if planar_img is None:
            raise FileNotFoundError(conf.renderer_texture)
        height, width = planar_img.shape[:2]
        focal = (width / 2) / np.tan(
            np.deg2rad(conf.renderer_hfov_cam_source_deg / 2)
        )
        intrinsics = np.array(
            [[focal, 0, width / 2], [0, focal, height / 2], [0, 0, 1]],
            np.float32,
        )
        return {
            "planar_img_filename": os.path.basename(conf.renderer_texture),
            "planar_intrinsics": intrinsics,
            "median_blur_ksize": np.array(
                conf.renderer_preprocess_median_blur
            ),
            "gaussian_blur_ksize": np.array(GAUSSIAN_BLUR_KSIZE),
            "gaussian_blur_sigma": np.array(
                conf.renderer_preprocess_gaussian_blur
            ),
            "T_wp_position": np.array(
                [conf.renderer_plane_x, conf.renderer_plane_y,
                 conf.renderer_plane_z], np.float32,
            ),
            "T_wp_orientation": np.array(
                [conf.renderer_plane_qx, conf.renderer_plane_qy,
                 conf.renderer_plane_qz, conf.renderer_plane_qw],
                np.float32,
            ),
        }
    if conf.renderer_type == 4:  # blender
        return {
            "interm_color_space": INTERM_COLOR_SPACE_NAMES[
                conf.blender_interm_color_space
            ],
            "log_eps": conf.log_eps,
        }
    raise NotImplementedError(
        f"renderer_type {conf.renderer_type} (only planar=0 and "
        f"blender=4 are supported)"
    )


def filter_imu_synced_poses(T_wc_position, T_wc_orientation,
                            T_wc_timestamp, imu_timestamp):
    """Keep only poses whose timestamp also appears in the IMU stream
    (reference: scripts/preprocess_esim.py:410-422; unlike the reference,
    the returned timestamps are the intersected pose timestamps rather
    than the raw IMU stream, which is equivalent when every IMU sample has
    a pose and robust when it does not)."""
    _, pose_idx, _ = np.intersect1d(
        T_wc_timestamp, imu_timestamp, assume_unique=True,
        return_indices=True,
    )
    pose_idx.sort()
    return (
        np.ascontiguousarray(T_wc_position[pose_idx]),
        np.ascontiguousarray(T_wc_orientation[pose_idx]),
        np.ascontiguousarray(T_wc_timestamp[pose_idx]),
    )


def filter_events_to_pose_window(position, timestamp, polarity,
                                 T_wc_timestamp):
    """Drop events outside [first, last] pose timestamp
    (reference: scripts/preprocess_esim.py:425-437)."""
    valid = (T_wc_timestamp[0] <= timestamp) \
        & (timestamp <= T_wc_timestamp[-1])
    return (
        np.ascontiguousarray(position[valid]),
        np.ascontiguousarray(timestamp[valid]),
        np.ascontiguousarray(polarity[valid]),
    )


def extract_rosbag(rosbag_path):
    """Stream the four ESIM topics out of a ROS1 bag. Requires `rosbag`
    (ROS environments only)."""
    try:
        import rosbag
    except ImportError as e:
        raise ImportError(
            "reading ESIM rosbags requires the ROS1 `rosbag` package "
            "(source a ROS environment); the rest of this module works "
            "without it"
        ) from e
    import tqdm

    topics = [EVENT_TOPIC, POSE_TOPIC, CAMERA_INFO_TOPIC, IMU_TOPIC]
    bag = rosbag.Bag(rosbag_path)
    return extract_messages(tqdm.tqdm(
        ((topic, msg) for topic, msg, _ in
         bag.read_messages(topics=topics)),
        total=bag.get_message_count(topic_filters=topics),
    ))


def extract_messages(messages):
    """Accumulate the four ESIM streams from (topic, msg) pairs.

    The message-loop core of the preprocessor
    (reference: scripts/preprocess_esim.py:382-437), factored to take
    ANY iterator of duck-typed ROS messages so rosbag-free fixtures can
    drive the exact production path end-to-end (`extract_rosbag` is a
    thin rosbag adapter over this).
    """
    event_position, event_timestamp, event_polarity = [], [], []
    T_wc_position, T_wc_orientation, T_wc_timestamp = [], [], []
    imu_timestamp = []
    img_height = img_width = None
    intrinsics = distortion_params = distortion_model = None

    for topic, msg in messages:
        if topic == EVENT_TOPIC:
            for event in msg.events:
                event_position.append((event.x, event.y))
                event_timestamp.append(event.ts.to_nsec())
                event_polarity.append(event.polarity)
            img_height = np.array(msg.height, np.uint16)
            img_width = np.array(msg.width, np.uint16)
        elif topic == POSE_TOPIC:
            p, q = msg.pose.position, msg.pose.orientation
            T_wc_position.append((p.x, p.y, p.z))
            T_wc_orientation.append((q.x, q.y, q.z, q.w))
            T_wc_timestamp.append(msg.header.stamp.to_nsec())
        elif topic == CAMERA_INFO_TOPIC:
            intrinsics = np.array(msg.K, np.float32).reshape(3, 3).copy()
            distortion_params = np.array(msg.D, np.float32)
            distortion_model = np.array(msg.distortion_model)
        elif topic == IMU_TOPIC:
            imu_timestamp.append(msg.header.stamp.to_nsec())

    return {
        "event_position": np.array(event_position, np.uint16),
        "event_timestamp": np.array(event_timestamp),
        "event_polarity": np.array(event_polarity),
        "T_wc_position": np.array(T_wc_position, np.float32),
        "T_wc_orientation": np.array(T_wc_orientation, np.float32),
        "T_wc_timestamp": np.array(T_wc_timestamp),
        "imu_timestamp": np.array(imu_timestamp),
        "img_height": img_height,
        "img_width": img_width,
        "intrinsics": intrinsics,
        "distortion_params": distortion_params,
        "distortion_model": distortion_model,
    }


def write_dataset(dataset_path, raw, conf: EsimConf):
    """Filter extracted streams and write the three dataset npz files."""
    T_wc_position, T_wc_orientation, T_wc_timestamp = \
        filter_imu_synced_poses(
            raw["T_wc_position"], raw["T_wc_orientation"],
            raw["T_wc_timestamp"], raw["imu_timestamp"],
        )
    position, timestamp, polarity = filter_events_to_pose_window(
        raw["event_position"], raw["event_timestamp"],
        raw["event_polarity"], T_wc_timestamp,
    )
    np.savez(
        os.path.join(dataset_path, EVENTS_FILENAME),
        position=position, timestamp=timestamp, polarity=polarity,
    )
    np.savez(
        os.path.join(dataset_path, CAMERA_POSES_FILENAME),
        T_wc_position=T_wc_position,
        T_wc_orientation=T_wc_orientation,
        T_wc_timestamp=T_wc_timestamp,
    )
    np.savez(
        os.path.join(dataset_path, CAMERA_CALIBRATION_FILENAME),
        intrinsics=raw["intrinsics"],
        distortion_params=raw["distortion_params"],
        distortion_model=raw["distortion_model"],
        img_height=raw["img_height"],
        img_width=raw["img_width"],
        **derive_calibration_physics(conf),
    )


def main():
    parser = argparse.ArgumentParser(
        description=("Pre-process an ESIM .conf file & ESIM-generated "
                     "rosbag into a dataset"),
    )
    parser.add_argument("conf_path", help="Path to the ESIM conf file.")
    parser.add_argument("rosbag_path",
                        help="Path to the ESIM-generated rosbag.")
    parser.add_argument("dataset_path",
                        help="Desired path to the pre-processed dataset.")
    args = parser.parse_args()

    os.makedirs(args.dataset_path, exist_ok=True)
    conf = parse_flagfile(args.conf_path)
    np.savez(
        os.path.join(args.dataset_path, RENDERER_PARAMS_FILENAME),
        **renderer_params(conf),
    )
    raw = extract_rosbag(args.rosbag_path)
    write_dataset(args.dataset_path, raw, conf)
    print("Done!")


if __name__ == "__main__":
    main()

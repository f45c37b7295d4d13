"""Event stream loading and packed event-interval construction.

Replaces the reference's O(N)-Python-loop event packing
(reference: deblur_e_nerf/data/datasets.py:189-284) with a vectorized host
pipeline: a stable lexicographic sort by (pixel, stream order) turns the
per-pixel sliding windows into shifted-array operations — minutes become
seconds at 100M-event scale. Semantics are bit-identical:

For each event i at pixel p with timestamp t_i and polarity pol_i, the packed
interval is {position=pos_i, start_ts=prev_ts(p), end_ts=t_i,
num_pos=pol_i, num_neg=1-pol_i}; the event is valid iff a previous event at p
exists with a strictly smaller timestamp
(reference: data/datasets.py:252-274).

The maximum refractory period is the minimum inter-event interval across all
per-pixel substreams after de-duplicating consecutive equal timestamps
(reference: data/datasets.py:132-187).

An optional C++ packer (native/evpack.cpp, loaded via ctypes) provides a
streaming single-pass implementation for very large event files; the numpy
path is the reference-tested default.
"""

import os

import numpy as np
import cv2

RAW_EVENTS_FILENAME = "raw_events.npz"
CAMERA_CALIBRATION_FILENAME = "camera_calibration.npz"
PACKED_EVENTS_FILENAME = "events_tpu.npz"
MAX_REFRACTORY_PERIOD_FILENAME = "max_refractory_period_tpu.npy"

RAW_EVENT_POSITION_KEY = "position"
RAW_EVENT_TIMESTAMP_KEY = "timestamp"
RAW_EVENT_POLARITY_KEY = "polarity"
IMG_HEIGHT_KEY = "img_height"
IMG_WIDTH_KEY = "img_width"
DISTORTION_MODEL_KEY = "distortion_model"
DISTORTION_PARAMS_KEY = "distortion_params"
INTRINSICS_KEY = "intrinsics"
BAYER_PATTERN_KEY = "bayer_pattern"
NULL_BAYER_PATTERN = ""
COLOR_CHANNEL_NAME_TO_INDEX = {"R": 0, "G": 1, "B": 2}


def load_raw_events(root_directory):
    return np.load(os.path.join(root_directory, RAW_EVENTS_FILENAME))


def load_camera_calibration(root_directory):
    return np.load(
        os.path.join(root_directory, CAMERA_CALIBRATION_FILENAME),
        allow_pickle=False,
    )


def _pixel_runs(positions, img_width):
    """Stable-sort event indices by pixel id; return (order, run-start mask).

    Events are assumed time-ordered within the stream (as produced by ESIM /
    camera drivers); the stable sort therefore preserves per-pixel time order.
    """
    pixel_id = (
        positions[:, 1].astype(np.int64) * np.int64(img_width)
        + positions[:, 0].astype(np.int64)
    )
    order = np.argsort(pixel_id, kind="stable")
    sorted_pid = pixel_id[order]
    run_start = np.empty(len(order), dtype=bool)
    if len(order):
        run_start[0] = True
        run_start[1:] = sorted_pid[1:] != sorted_pid[:-1]
    return order, run_start


def pack_events(positions, timestamps, polarities, img_height, img_width):
    """Build packed event intervals from a raw (x, y, t, p) stream.

    Returns a dict of arrays in original stream order (valid events only):
        position (V, 2) int64, start_ts (V,) int64, end_ts (V,) int64,
        num_pos (V,) int64, num_neg (V,) int64
    """
    assert len(positions) == len(timestamps) == len(polarities)
    positions = positions.astype(np.int64)
    polarities = polarities.astype(np.int64)

    order, run_start = _pixel_runs(positions, img_width)
    sorted_ts = timestamps[order]

    prev_ts = np.empty_like(sorted_ts)
    if len(sorted_ts):
        prev_ts[1:] = sorted_ts[:-1]
        prev_ts[0] = sorted_ts[0]
    # valid: previous event at the same pixel exists with distinct timestamp
    valid_sorted = (~run_start) & (prev_ts != sorted_ts)

    # scatter back to stream order
    start_ts = np.empty_like(timestamps)
    start_ts[order] = prev_ts
    valid = np.empty(len(timestamps), dtype=bool)
    valid[order] = valid_sorted

    return {
        "position": positions[valid],
        "start_ts": start_ts[valid],
        "end_ts": timestamps[valid],
        "num_pos": polarities[valid],
        "num_neg": 1 - polarities[valid],
    }


def extract_max_refractory_period(positions, timestamps, img_height,
                                  img_width):
    """Min inter-event interval across per-pixel substreams (distinct ts)."""
    order, run_start = _pixel_runs(positions, img_width)
    sorted_ts = timestamps[order]

    # de-duplicate consecutive equal timestamps within each pixel run
    distinct = np.empty(len(sorted_ts), dtype=bool)
    if len(sorted_ts):
        distinct[0] = True
        distinct[1:] = run_start[1:] | (sorted_ts[1:] != sorted_ts[:-1])
    dedup_ts = sorted_ts[distinct]
    dedup_run_start = run_start[distinct]

    if len(dedup_ts) < 2:
        return np.array(float("inf"))
    intervals = dedup_ts[1:] - dedup_ts[:-1]
    same_pixel = ~dedup_run_start[1:]
    if not np.any(same_pixel):
        return np.array(float("inf"))
    return np.asarray(intervals[same_pixel].min())


def colorize_events(events, bayer_pattern):
    """Assign a Bayer color-channel index per event from pixel parity
    (reference: data/datasets.py:286-328)."""
    if bayer_pattern == NULL_BAYER_PATTERN:
        return events
    assert len(bayer_pattern) == 4
    assert set(COLOR_CHANNEL_NAME_TO_INDEX.keys()) == set(bayer_pattern)
    channel_of_quadrant = np.array(
        [COLOR_CHANNEL_NAME_TO_INDEX[c] for c in bayer_pattern],
        dtype=np.uint8,
    )
    is_x_odd = (events["position"][:, 0] % 2).astype(np.int64)
    is_y_odd = (events["position"][:, 1] % 2).astype(np.int64)
    # quadrant order: top-left, top-right, bottom-left, bottom-right
    quadrant = is_y_odd * 2 + is_x_odd
    events = dict(events)
    events["channel_idx"] = channel_of_quadrant[quadrant]
    return events


def undistort_events(events, distortion_model, distortion_params,
                     intrinsics):
    """Undistort event pixel positions via OpenCV (host, bit-parity with the
    reference; reference: data/datasets.py:330-364)."""
    events = dict(events)
    events["position"] = events["position"].astype(np.float64)
    if distortion_params is None or len(distortion_params) == 0:
        return events

    pts = events["position"].astype(np.float64)
    if str(distortion_model) == "plumb_bob":
        und = cv2.undistortPoints(
            pts.reshape(-1, 1, 2), np.asarray(intrinsics),
            np.asarray(distortion_params), P=np.asarray(intrinsics)
        ).reshape(-1, 2)
    elif str(distortion_model) == "equidistant":
        und = cv2.fisheye.undistortPoints(
            pts.reshape(-1, 1, 2), np.asarray(intrinsics),
            np.asarray(distortion_params), P=np.asarray(intrinsics)
        ).reshape(-1, 2)
    else:
        raise NotImplementedError(
            f"distortion model {distortion_model!r} not supported"
        )
    events["position"] = und
    return events


class EventDataset:
    """Packed event-interval dataset with on-disk caching.

    Mirrors the reference Event dataset's public behavior
    (reference: data/datasets.py:14-373): packed intervals are cached next to
    the raw stream; an optional permutation seed reshuffles the whole dataset
    deterministically.
    """

    def __init__(self, root_directory, permutation_seed=None):
        self.root_directory = root_directory
        self.events = self._load_or_build(root_directory)
        if permutation_seed is not None:
            n = len(self.events["position"])
            rng = np.random.Generator(np.random.Philox(permutation_seed))
            indices = rng.permutation(n)
            self.events = {
                k: v[indices] for k, v in self.events.items()
            }

    @staticmethod
    def _load_or_build(root_directory):
        cache_path = os.path.join(root_directory, PACKED_EVENTS_FILENAME)
        if os.path.isfile(cache_path):
            with np.load(cache_path) as f:
                return {k: f[k] for k in f.files}

        calib = load_camera_calibration(root_directory)
        raw = load_raw_events(root_directory)
        from . import native_evpack
        events = native_evpack.pack_events(
            raw[RAW_EVENT_POSITION_KEY],
            raw[RAW_EVENT_TIMESTAMP_KEY],
            raw[RAW_EVENT_POLARITY_KEY],
            int(calib[IMG_HEIGHT_KEY]),
            int(calib[IMG_WIDTH_KEY]),
        )
        if events is None:  # no native toolchain: vectorized numpy path
            events = pack_events(
                raw[RAW_EVENT_POSITION_KEY],
                raw[RAW_EVENT_TIMESTAMP_KEY],
                raw[RAW_EVENT_POLARITY_KEY],
                int(calib[IMG_HEIGHT_KEY]),
                int(calib[IMG_WIDTH_KEY]),
            )
        events = colorize_events(events, str(calib[BAYER_PATTERN_KEY]))
        events = undistort_events(
            events,
            calib[DISTORTION_MODEL_KEY],
            calib[DISTORTION_PARAMS_KEY],
            calib[INTRINSICS_KEY],
        )
        np.savez(cache_path, **events)
        return events

    def __len__(self):
        return len(self.events["position"])


def load_max_refractory_period(root_directory):
    """Load (or extract and cache) the dataset's maximum refractory period."""
    cache_path = os.path.join(
        root_directory, MAX_REFRACTORY_PERIOD_FILENAME
    )
    if os.path.isfile(cache_path):
        return np.load(cache_path)
    calib = load_camera_calibration(root_directory)
    raw = load_raw_events(root_directory)
    from . import native_evpack
    max_rp = native_evpack.max_refractory_period(
        raw[RAW_EVENT_POSITION_KEY],
        raw[RAW_EVENT_TIMESTAMP_KEY],
        int(calib[IMG_HEIGHT_KEY]),
        int(calib[IMG_WIDTH_KEY]),
    )
    if max_rp is None:  # no native toolchain: vectorized numpy path
        max_rp = extract_max_refractory_period(
            raw[RAW_EVENT_POSITION_KEY],
            raw[RAW_EVENT_TIMESTAMP_KEY],
            int(calib[IMG_HEIGHT_KEY]),
            int(calib[IMG_WIDTH_KEY]),
        )
    np.save(cache_path, max_rp)
    return max_rp

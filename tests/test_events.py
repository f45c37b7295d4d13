"""Event packing vs a brute-force per-pixel sliding-window oracle that
mirrors the reference semantics (reference: data/datasets.py:189-284)."""

import collections

import numpy as np

from deblur_e_nerf_tpu.data import events as ev


def brute_force_pack(positions, timestamps, polarities, H, W):
    windows_ts = [[collections.deque(maxlen=2) for _ in range(W)]
                  for _ in range(H)]
    windows_pol = [[collections.deque(maxlen=2) for _ in range(W)]
                   for _ in range(H)]
    out = {"position": [], "start_ts": [], "end_ts": [], "num_pos": [],
           "num_neg": []}
    for i in range(len(positions)):
        x, y = positions[i]
        wts = windows_ts[y][x]
        wpol = windows_pol[y][x]
        wts.append(timestamps[i])
        wpol.append(int(polarities[i]))
        if len(wts) < 2 or wts[0] == wts[-1]:
            continue
        out["position"].append([x, y])
        out["start_ts"].append(wts[0])
        out["end_ts"].append(timestamps[i])
        num_pos = sum(wpol) - wpol[0]
        out["num_pos"].append(num_pos)
        out["num_neg"].append(1 - num_pos)
    return {k: np.asarray(v) for k, v in out.items()}


def brute_force_max_refractory(positions, timestamps, H, W):
    windows = [[collections.deque(maxlen=2) for _ in range(W)]
               for _ in range(H)]
    best = float("inf")
    for i in range(len(positions)):
        x, y = positions[i]
        w = windows[y][x]
        if len(w) > 0 and timestamps[i] == w[-1]:
            continue
        w.append(timestamps[i])
        if len(w) < 2:
            continue
        best = min(best, w[1] - w[0])
    return best


def random_stream(rng, n=2000, H=6, W=8):
    positions = np.stack(
        [rng.integers(0, W, n), rng.integers(0, H, n)], axis=1
    ).astype(np.uint16)
    # non-decreasing timestamps with repeats
    timestamps = np.cumsum(rng.integers(0, 3, n)).astype(np.int64)
    polarities = rng.integers(0, 2, n).astype(bool)
    return positions, timestamps, polarities


def test_pack_events_matches_reference_semantics():
    rng = np.random.default_rng(0)
    positions, timestamps, polarities = random_stream(rng)
    got = ev.pack_events(positions, timestamps, polarities, 6, 8)
    want = brute_force_pack(positions, timestamps, polarities, 6, 8)
    assert len(got["position"]) == len(want["position"])
    for key in want:
        np.testing.assert_array_equal(got[key], want[key],
                                      err_msg=f"mismatch in {key}")


def test_pack_events_empty_and_tiny():
    empty = ev.pack_events(
        np.zeros((0, 2), np.uint16), np.zeros(0, np.int64),
        np.zeros(0, bool), 4, 4
    )
    assert len(empty["position"]) == 0
    single = ev.pack_events(
        np.array([[1, 1]], np.uint16), np.array([5], np.int64),
        np.array([True]), 4, 4
    )
    assert len(single["position"]) == 0


def test_max_refractory_period():
    rng = np.random.default_rng(1)
    positions, timestamps, polarities = random_stream(rng, n=5000)
    got = ev.extract_max_refractory_period(positions, timestamps, 6, 8)
    want = brute_force_max_refractory(positions, timestamps, 6, 8)
    assert float(got) == float(want)


def test_colorize_events():
    events = {
        "position": np.array(
            [[0, 0], [1, 0], [0, 1], [1, 1], [2, 2], [3, 3]], np.int64
        )
    }
    out = ev.colorize_events(events, "GBRG")
    # GBRG: top-left=G(1), top-right=B(2), bottom-left=R(0), bottom-right=G(1)
    np.testing.assert_array_equal(
        out["channel_idx"], np.array([1, 2, 0, 1, 1, 1], np.uint8)
    )


def test_colorize_monochrome_passthrough():
    events = {"position": np.zeros((4, 2), np.int64)}
    out = ev.colorize_events(events, "")
    assert "channel_idx" not in out


def test_undistort_identity_and_plumb_bob():
    events = {
        "position": np.array([[10, 20], [30, 5], [0, 0]], np.int64)
    }
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    out = ev.undistort_events(events, "plumb_bob", np.zeros(4), K)
    np.testing.assert_allclose(
        out["position"], events["position"].astype(np.float64), atol=1e-6
    )
    # with distortion, output should move points but stay finite
    out2 = ev.undistort_events(
        {"position": events["position"]}, "plumb_bob",
        np.array([-0.1, 0.01, 0.0, 0.0]), K
    )
    assert np.all(np.isfinite(out2["position"]))
    assert not np.allclose(out2["position"],
                           events["position"].astype(np.float64))

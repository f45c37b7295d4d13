"""Native C++ event packer vs. the vectorized numpy reference path."""

import numpy as np
import pytest

from deblur_e_nerf_tpu.data import events as events_lib
from deblur_e_nerf_tpu.data import native_evpack


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(42)
    n = 50_000
    h = w = 32
    positions = np.stack(
        [rng.integers(0, w, n), rng.integers(0, h, n)], axis=1
    ).astype(np.uint16)
    timestamps = np.sort(rng.integers(0, 10 ** 7, n)).astype(np.int64)
    # inject duplicate timestamps at the same pixel to exercise the
    # strictly-distinct-timestamp validity rule
    positions[1] = positions[0]
    timestamps[1] = timestamps[0]
    polarities = rng.integers(0, 2, n).astype(bool)
    return positions, timestamps, polarities, h, w


def test_native_available():
    assert native_evpack.available(), "native toolchain should build"


def test_pack_parity(stream):
    positions, timestamps, polarities, h, w = stream
    ref = events_lib.pack_events(positions, timestamps, polarities, h, w)
    nat = native_evpack.pack_events(positions, timestamps, polarities,
                                    h, w)
    assert nat is not None
    assert set(ref.keys()) == set(nat.keys())
    # both emit valid events in original stream order
    for key in ref:
        np.testing.assert_array_equal(ref[key], nat[key], err_msg=key)


def test_max_refractory_parity(stream):
    positions, timestamps, _, h, w = stream
    ref = events_lib.extract_max_refractory_period(
        positions, timestamps, h, w
    )
    nat = native_evpack.max_refractory_period(positions, timestamps, h, w)
    assert nat is not None
    assert float(ref) == float(nat)


def test_max_refractory_empty():
    positions = np.array([[0, 0]], np.uint16)
    timestamps = np.array([5], np.int64)
    nat = native_evpack.max_refractory_period(positions, timestamps, 4, 4)
    assert np.isinf(float(nat))

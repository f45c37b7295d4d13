import jax
import numpy as np

from deblur_e_nerf_tpu.ops import samplers


def test_uniform_range_and_dtype():
    key = jax.random.PRNGKey(0)
    s = samplers.uniform(key, (10000,))
    s = np.asarray(s)
    assert s.dtype == np.float32  # device-native; see samplers docstring
    assert np.all((0 <= s) & (s < 1))
    assert abs(s.mean() - 0.5) < 0.02


def test_triangular_mode_zero():
    key = jax.random.PRNGKey(1)
    s = np.asarray(samplers.triangular(key, (200000,), mode=0.0))
    assert np.all((0 <= s) & (s <= 1))
    # mean of triangular(0, 1, mode=0) = 1/3
    assert abs(s.mean() - 1 / 3) < 0.01
    # CDF at x: 1 - (1-x)^2; check quartile
    assert abs(np.mean(s <= 0.5) - 0.75) < 0.01


def test_dirac_delta():
    s = np.asarray(samplers.dirac_delta((5, 3), 0.5))
    assert s.shape == (5, 3)
    assert np.all(s == 0.5)

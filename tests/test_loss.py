"""Loss terms on hand-computed batches (reference: loss_metric/loss.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.training import loss as loss_lib
from deblur_e_nerf_tpu.utils.config import ConfigDict


def make_config(diff_fn="huber", tv_fn="l1", w_diff=1.0, w_tv=1e-3,
                norm_diff=False, norm_tv=False):
    return ConfigDict({
        "error_fn": {"log_intensity_diff": diff_fn,
                     "log_intensity_tv": tv_fn},
        "weight": {"log_intensity_diff": w_diff,
                   "log_intensity_tv": w_tv,
                   "nerf_mlp_weight_decay": 0.0},
        "normalize": {"log_intensity_diff": norm_diff,
                      "log_intensity_tv": norm_tv},
    })


def test_error_fns():
    pred = jnp.asarray([0.0, 2.0, -3.0])
    target = jnp.asarray([1.0, 0.0, 0.0])
    np.testing.assert_allclose(loss_lib.l1(pred, target), [1, 2, 3])
    np.testing.assert_allclose(loss_lib.mse(pred, target), [1, 4, 9])
    # huber delta=1: quadratic inside, linear outside
    np.testing.assert_allclose(
        loss_lib.huber(pred, target), [0.5, 1.5, 2.5]
    )
    np.testing.assert_allclose(
        loss_lib.mape(jnp.asarray([2.0]), jnp.asarray([4.0])), [0.5]
    )


def test_masked_mean_empty_mask_is_finite():
    v = jnp.asarray([1.0, 2.0])
    m = jnp.asarray([False, False])
    assert float(loss_lib.masked_mean(v, m)) == 0.0


def test_diff_loss_hand_computed():
    """Target = ts_diff * event_grad; event_grad = dlogI / (end - start)."""
    event = {
        "log_intensity_diff": jnp.asarray([0.6, -0.4]),
        "dt": jnp.asarray([200.0, 200.0]),
    }
    # grads: 0.6/200 = 0.003, -0.4/200 = -0.002
    diff = {
        "log_intensity_diff": jnp.asarray([0.35, -0.1]),
        "ts_diff": jnp.asarray([100.0, 100.0]),
        "is_valid": jnp.asarray([True, True]),
    }
    out = loss_lib.compute(
        make_config(diff_fn="l1", w_tv=0.0), event, diff, None, 1.0
    )
    # targets: 0.3, -0.2 -> l1 errors 0.05, 0.1 -> mean 0.075
    assert float(out["log_intensity_diff"]) == pytest.approx(0.075)
    assert "log_intensity_tv" not in out


def test_diff_loss_ct_normalization():
    event = {
        "log_intensity_diff": jnp.asarray([0.5]),
        "dt": jnp.asarray([100.0]),
    }
    diff = {
        "log_intensity_diff": jnp.asarray([0.7]),
        "ts_diff": jnp.asarray([100.0]),
        "is_valid": jnp.asarray([True]),
    }
    mean_ct = 0.25
    out = loss_lib.compute(
        make_config(diff_fn="l1", w_tv=0.0, norm_diff=True),
        event, diff, None, mean_ct,
    )
    # normalized: |0.7/0.25 - 0.5/0.25| = 0.2/0.25 = 0.8
    assert float(out["log_intensity_diff"]) == pytest.approx(0.8)


def test_tv_loss_is_error_to_zero_and_masks():
    event = {
        "log_intensity_diff": jnp.asarray([0.0, 0.0, 0.0]),
        "dt": jnp.asarray([1.0, 1.0, 1.0]),
    }
    subdiff = {
        "log_intensity_diff": jnp.asarray([0.2, -0.4, 100.0]),
        "is_valid": jnp.asarray([True, True, False]),
    }
    out = loss_lib.compute(
        make_config(w_diff=0.0, tv_fn="l1"), event, None, subdiff, 1.0
    )
    # masked mean of |0.2|, |-0.4| -> 0.3; the invalid 100.0 is excluded
    assert float(out["log_intensity_tv"]) == pytest.approx(0.3)

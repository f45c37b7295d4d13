"""Contrast-threshold and refractory-period parameter models."""

import jax
import jax.numpy as jnp
import numpy as np

from deblur_e_nerf_tpu.models import event_gen

CALIB = {
    event_gen.POS_CONTRAST_THRESHOLD_KEY: np.asarray(0.25),
    event_gen.NEG_CONTRAST_THRESHOLD_KEY: np.asarray(0.2),
    event_gen.REFRACTORY_PERIOD_KEY: np.asarray(1e3),
}


def test_contrast_threshold_init_roundtrip():
    for parameterize_mean_ct in (True, False):
        params, consts = event_gen.init_contrast_threshold(
            CALIB, parameterize_mean_ct
        )
        pos, neg, mean = event_gen.contrast_thresholds(params, consts)
        np.testing.assert_allclose(float(pos), 0.25, rtol=1e-5)
        np.testing.assert_allclose(float(neg), 0.2, rtol=1e-5)
        np.testing.assert_allclose(float(mean), 0.225, rtol=1e-5)


def test_contrast_threshold_forward():
    params, consts = event_gen.init_contrast_threshold(CALIB, True)
    num_pos = jnp.asarray([1, 0, 1, 0])
    num_neg = jnp.asarray([0, 1, 0, 1])
    diff = np.asarray(
        event_gen.apply_contrast_threshold(
            params, consts, num_pos, num_neg
        )
    )
    np.testing.assert_allclose(diff, [0.25, -0.2, 0.25, -0.2],
                               rtol=1e-5)


def test_contrast_threshold_gradients():
    params, consts = event_gen.init_contrast_threshold(CALIB, True)

    def loss(p):
        return jnp.sum(
            event_gen.apply_contrast_threshold(
                p, consts, jnp.asarray([3.0]), jnp.asarray([2.0])
            )
        )

    g = jax.grad(loss)(params)
    assert all(
        np.isfinite(np.asarray(v)).all() and np.any(np.asarray(v) != 0)
        for v in jax.tree_util.tree_leaves(g)
    )


def test_refractory_period_init_and_clamp():
    params, consts = event_gen.init_refractory_period(CALIB, 5e3)
    tau = float(event_gen.refractory_period(params, consts))
    np.testing.assert_allclose(tau, 1e3, rtol=1e-6)

    # push the logit far out; clamping must pull it back so the sigmoid
    # gradient stays above the configured minimum
    blown = {
        "refractory_period_logit": jnp.asarray(1e12, jnp.float64)
    }
    clamped = event_gen.clamp_refractory_logit(blown, consts)
    scaled = float(
        clamped["refractory_period_logit"]
        / consts["max_refractory_period"]
    )
    assert abs(scaled) <= float(consts["max_scaled_logit_magnitude"]) \
        + 1e-9
    sig_grad = jax.grad(
        lambda x: float(consts["max_refractory_period"])
        * jax.nn.sigmoid(x / consts["max_refractory_period"])
    )(clamped["refractory_period_logit"])
    assert float(sig_grad) >= 0.9e-4  # non-vanishing


def test_refractory_period_out_of_range_calibration(recwarn):
    calib = dict(CALIB)
    calib[event_gen.REFRACTORY_PERIOD_KEY] = np.asarray(1e4)  # >= max
    params, consts = event_gen.init_refractory_period(calib, 5e3)
    tau = float(event_gen.refractory_period(params, consts))
    np.testing.assert_allclose(tau, 0.999 * 5e3, rtol=1e-6)
    assert len(recwarn) >= 1


def test_apply_refractory_period_shifts_start():
    params, consts = event_gen.init_refractory_period(CALIB, 5e3)
    start = jnp.asarray([0.0, 1e6], jnp.float64)
    shifted = np.asarray(
        event_gen.apply_refractory_period(params, consts, start)
    )
    np.testing.assert_allclose(shifted - np.asarray(start), 1e3,
                               rtol=1e-6)

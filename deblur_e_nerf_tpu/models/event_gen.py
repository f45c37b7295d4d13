"""Learnable event-generation parameters: contrast thresholds + refractory
period.

Functional analog of the reference's parametrize-based modules
(reference: deblur_e_nerf/models/event_generation_params.py:8-237): raw
parameters live in the train pytree, bijectors (softplus / scaled-shifted
sigmoid) are applied on read, and the reference's in-place logit clamping —
which keeps the sigmoid gradient from vanishing
(reference: event_generation_params.py:204-219) — becomes an explicit
post-update projection (`clamp_refractory_logit`) applied by the optimizer
step.
"""

import warnings
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..ops import activations

POS_CONTRAST_THRESHOLD_KEY = "pos_contrast_threshold"
NEG_CONTRAST_THRESHOLD_KEY = "neg_contrast_threshold"
REFRACTORY_PERIOD_KEY = "refractory_period"
REDEFINED_CALIBRATED_REFRACTORY_PERIOD_FACTOR = 0.999
MIN_SCALED_SHIFTED_SIGMOID_GRAD_MAGNITUDE = 1e-4


# ---------------------------------------------------------------------------
# contrast threshold
# ---------------------------------------------------------------------------

def init_contrast_threshold(camera_calibration, parameterize_mean_ct):
    """Build {params, consts} for the contrast-threshold model."""
    pos_ct = float(camera_calibration[POS_CONTRAST_THRESHOLD_KEY])
    neg_ct = float(camera_calibration[NEG_CONTRAST_THRESHOLD_KEY])
    p2n = pos_ct / neg_ct
    mean_ct = (pos_ct + neg_ct) / 2
    assert p2n > 0 and mean_ct > 0

    params = {
        "p2n_contrast_threshold_ratio_raw": activations.softplus_inverse(
            jnp.asarray(p2n, jnp.float32)
        ),
    }
    consts = {
        "init_p2n_contrast_threshold_ratio": jnp.asarray(p2n, jnp.float32),
        "init_mean_contrast_threshold": jnp.asarray(mean_ct, jnp.float32),
        "parameterize_mean_ct": parameterize_mean_ct,
    }
    if parameterize_mean_ct:
        params["mean_contrast_threshold_raw"] = (
            activations.softplus_inverse(jnp.asarray(mean_ct, jnp.float32))
        )
    else:
        consts["neg_contrast_threshold"] = jnp.asarray(neg_ct, jnp.float32)
    return params, consts


def contrast_thresholds(params, consts):
    """Derived (pos, neg, mean) contrast thresholds
    (reference: event_generation_params.py:86-104)."""
    p2n = activations.softplus(params["p2n_contrast_threshold_ratio_raw"])
    if consts["parameterize_mean_ct"]:
        mean_ct = activations.softplus(
            params["mean_contrast_threshold_raw"]
        )
        neg = 2 * mean_ct / (p2n + 1)
        pos = p2n * neg
    else:
        neg = consts["neg_contrast_threshold"]
        pos = p2n * neg
        mean_ct = (pos + neg) / 2
    return pos, neg, mean_ct


def apply_contrast_threshold(params, consts, num_pos, num_neg):
    """Event counts -> effective log-intensity change
    (reference: event_generation_params.py:106-118)."""
    pos, neg, _ = contrast_thresholds(params, consts)
    return num_pos * pos - num_neg * neg


# ---------------------------------------------------------------------------
# refractory period
# ---------------------------------------------------------------------------

def init_refractory_period(camera_calibration, max_refractory_period):
    """Build {params, consts}; raw logit is float64 (ns-scale precision)."""
    calibrated = float(camera_calibration[REFRACTORY_PERIOD_KEY])
    max_rp = float(max_refractory_period)
    if not (0 <= calibrated < max_rp):
        warnings.warn(
            f"Calibrated refractory period ({calibrated}) >= max possible"
            f" refractory period ({max_rp}); redefining to"
            f" {REDEFINED_CALIBRATED_REFRACTORY_PERIOD_FACTOR} * max."
        )
        calibrated = (
            REDEFINED_CALIBRATED_REFRACTORY_PERIOD_FACTOR * max_rp
        )

    max_logit_mag = float(
        np.abs(
            np.log(
                MIN_SCALED_SHIFTED_SIGMOID_GRAD_MAGNITUDE
                / (1 - MIN_SCALED_SHIFTED_SIGMOID_GRAD_MAGNITUDE)
            )
        )
    )
    # right-inverse of the scaled-shifted sigmoid: logit scaled by max_rp
    p = np.clip(calibrated / max_rp, 1e-12, 1 - 1e-12)
    raw = max_rp * float(np.log(p / (1 - p)))
    params = {"refractory_period_logit": jnp.asarray(raw, jnp.float64)}
    consts = {
        "init_refractory_period": jnp.asarray(calibrated, jnp.float64),
        "max_refractory_period": jnp.asarray(max_rp, jnp.float64),
        "max_scaled_logit_magnitude": jnp.asarray(
            max_logit_mag, jnp.float64
        ),
    }
    params["refractory_period_logit"] = clamp_refractory_logit(
        params, consts
    )["refractory_period_logit"]
    return params, consts


def clamp_refractory_logit(params, consts):
    """Project the raw logit so the sigmoid gradient never vanishes —
    apply after every optimizer update
    (reference: event_generation_params.py:204-219 clamps in-place)."""
    max_rp = consts["max_refractory_period"]
    raw = params["refractory_period_logit"]
    limit = consts["max_scaled_logit_magnitude"]
    scaled = raw / max_rp
    clamped = jnp.clip(scaled, -limit, limit)
    # exact no-op when the clamp does not bind (avoids f64 round-trip drift)
    out = dict(params)
    out["refractory_period_logit"] = jnp.where(
        jnp.abs(scaled) > limit, max_rp * clamped, raw
    )
    return out


def refractory_period(params, consts):
    """Scaled-shifted sigmoid read of tau in [0, max_refractory_period)."""
    max_rp = consts["max_refractory_period"]
    from jax.nn import sigmoid
    return max_rp * sigmoid(params["refractory_period_logit"] / max_rp)


def apply_refractory_period(params, consts, start_ts):
    """Delay event-interval start timestamps by tau
    (reference: event_generation_params.py:230-237)."""
    return start_ts + refractory_period(params, consts)

"""Normalized random samplers as pure functions of a PRNG key.

TPU-native analog of the reference's iterable sampler datasets
(reference: deblur_e_nerf/data/samplers.py:4-69): instead of stateful
torch.Generator streams on the host, each training step derives its
normalized interval samples from the step's PRNG key on device. Samples are
float32: interval math operates on exact int64 differences (split
timestamps, training/step.py), so the reference's float64 samplers
(reference: data/datamodule.py:178-196) are unnecessary — and the TPU
backend's emulated float64 multiply is itself only f32-accurate.
"""

import jax
import jax.numpy as jnp


def uniform(key, shape, dtype=jnp.float32, low=0.0, high=1.0):
    return jax.random.uniform(
        key, shape, dtype=dtype, minval=low, maxval=high
    )


def triangular(key, shape, dtype=jnp.float32, low=0.0, high=1.0, mode=0.0):
    """Triangular distribution via inverse-CDF of a uniform sample.

    Matches the reference's construction
    (reference: deblur_e_nerf/data/samplers.py:23-54).
    """
    u = jax.random.uniform(key, shape, dtype=dtype)
    mode_cum_prob = (mode - low) / (high - low)
    k1 = (high - low) * (mode - low)
    k2 = (high - low) * (high - mode)
    return jnp.where(
        u <= mode_cum_prob,
        low + jnp.sqrt(u * k1),
        high - jnp.sqrt((1 - u) * k2),
    )


def dirac_delta(shape, center, dtype=jnp.float32):
    return jnp.full(shape, center, dtype=dtype)

"""Density / radiance activations.

`trunc_exp` matches the reference's custom autograd exp with a gradient
clamped at exp(15) (reference: deblur_e_nerf/external/ngp.py:45-65), which
prevents fp32 overflow in the density head early in training.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def shifted_trunc_exp(x, shift=1.0):
    return trunc_exp(x - shift)


def softplus(x, beta=1.0, threshold=20.0):
    """torch-semantics softplus: linear above `threshold` for stability."""
    scaled = x * beta
    return jnp.where(
        scaled > threshold, x, jax.nn.softplus(scaled) / beta
    )


def softplus_inverse(y, beta=1.0, threshold=20.0):
    """Right-inverse of `softplus` (for bijector parameter initialization;
    reference: deblur_e_nerf/utils/modules.py:67-75)."""
    scaled = y * beta
    return jnp.where(
        scaled > threshold,
        y,
        jnp.log(jnp.expm1(jnp.minimum(scaled, threshold))) / beta,
    )


def shifted_softplus(x, shift=1.0, beta=1.0, threshold=20.0):
    """mip-NeRF density activation (reference: models/nerf.py:8-13)."""
    return softplus(x - shift, beta, threshold)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": lambda x: softplus(x, beta=1.0),
    "softplus100": lambda x: softplus(x, beta=100.0),
    "shifted_trunc_exp": shifted_trunc_exp,
    "shifted_softplus": shifted_softplus,
    "identity": lambda x: x,
}


def hidden_activation(name):
    """Reference hidden-activation registry (models/nerf.py:17-20):
    'softplus' hidden layers use beta=100."""
    return {"softplus": ACTIVATIONS["softplus100"],
            "relu": jax.nn.relu}[name]


def density_activation(name):
    return {
        "shifted_trunc_exp": shifted_trunc_exp,
        "softplus": ACTIVATIONS["softplus"],
        "shifted_softplus": shifted_softplus,
    }[name]


def radiance_activation(name):
    return {"softplus": ACTIVATIONS["softplus"],
            "sigmoid": jax.nn.sigmoid}[name]

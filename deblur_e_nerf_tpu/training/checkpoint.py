"""Orbax checkpointing with per-component selective restore.

TPU-native analog of the reference's Lightning checkpoints + per-component
`load_state_dict` flags (reference: deblur_e_nerf/models/deblur_e_nerf.py:
322-343, utils/modules.py:16-35): a checkpoint is one pytree
{params, opt_state, occ_state, step}; selective restore swaps whole
component subtrees of a freshly-initialized param tree, so evaluation
configs can pull just the trained NeRF (or physics params) out of a
training checkpoint (reference: configs/test/synthetic.yaml:28-76).
"""

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save(path, state_dict):
    """Save a pytree checkpoint (creates parent dirs)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state_dict, force=True)
    ckptr.wait_until_finished()


def restore(path, target=None):
    """Restore a pytree checkpoint (shapes/dtypes from `target` if given)."""
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), target)
    return ckptr.restore(os.path.abspath(path))


def selective_restore_params(init_params, checkpoint_params,
                             component_flags):
    """Replace component subtrees of `init_params` from a checkpoint.

    Args:
        component_flags: {component_name: bool load_state_dict}
            (reference config schema: model.<component>.load_state_dict).
    """
    out = dict(init_params)
    for component, load in component_flags.items():
        if not load:
            continue
        if component not in checkpoint_params:
            raise KeyError(
                f"component {component!r} not in checkpoint"
            )
        out[component] = checkpoint_params[component]
        print(f"Loaded the state of {component!r} from checkpoint")
    return out

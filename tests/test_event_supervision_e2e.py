"""Golden-scene end-to-end check of the event-supervision pipeline.

An analytic radiance field (the synthetic generator's textured sphere,
hard-coded — no learning) is rendered through the real march/composite/
trajectory/interval pipeline via `compute_loss`. If packing, interval
derivation, split timestamps, ray geometry, and compositing are all
consistent, the event loss must be near the simulation's quantization
floor — far below the ~0.4-0.5 a constant (flat) field scores.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.data import synthetic
from deblur_e_nerf_tpu.models import nerf_model
from deblur_e_nerf_tpu.data import events as events_data
from deblur_e_nerf_tpu.training import pipeline, setup, step as step_lib
from deblur_e_nerf_tpu.utils.config import load_config


class AnalyticSphereField(nn.Module):
    """Ground-truth field: hard shell at |x| = 1 with the generator's
    texture; high density inside a thin shell so rays saturate at the
    surface (radiance is defined everywhere via the nearest-point
    texture, matching what a converged NeRF would represent)."""
    radiance_dim: int = 1

    @nn.compact
    def __call__(self, x, direction):
        _ = self.param("dummy", lambda k: jnp.zeros((1,)))
        r = jnp.linalg.norm(x, axis=-1, keepdims=True)
        density = jnp.where(r <= 1.0, 5000.0, 0.0)
        p = x / jnp.maximum(r, 1e-6)  # project onto the sphere
        tex = (
            0.55
            + 0.15 * jnp.sin(6.0 * p[..., 0]) * jnp.sin(6.0 * p[..., 1])
            + 0.12 * jnp.sin(4.0 * p[..., 2])
            # keep in sync with data/synthetic.py analytic_image
            + 0.10 * jnp.sin(14.0 * p[..., 0] + 7.0 * p[..., 2])
            * jnp.sin(11.0 * p[..., 1])
            + 0.06 * jnp.sin(23.0 * p[..., 0])
            * jnp.sin(19.0 * p[..., 2])
        )
        radiance = tex[..., None] - 1e-3  # dataset log_eps offset
        return radiance, density

    def density(self, x):
        r = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return jnp.where(r <= 1.0, 5000.0, 0.0)


@pytest.mark.slow
def test_event_loss_near_oracle_with_analytic_scene(tmp_path):
    root = tmp_path / "ds"
    synthetic.make_dataset(
        str(root), img_height=32, img_width=32, num_poses=61,
        num_frames=240,
    )
    config = load_config("configs/train/synthetic.yaml")
    config.data.dataset_directory = str(root)
    config.model.pixel_bandwidth.enable = False
    config.model.nerf.aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    config.model.nerf.near_plane = 1.43
    config.model.nerf.far_plane = 6.63
    config.model.nerf.occ_grid.resolution = 64
    bundle, params = setup.build(
        config, str(root), sample_budget=262144, batch_capacity=96,
    )
    # swap in the analytic field; learnable background -> true 0.15-1e-3
    # (the renderer adds min_modeled_intensity=1e-3 back)
    field = AnalyticSphereField()
    variables = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                           jnp.zeros((4, 3)))
    model = bundle.model._replace(field=field)
    from deblur_e_nerf_tpu.ops import activations
    params = dict(params)
    params["nerf"] = {
        "field": variables["params"],
        "render_bkgd_raw": jnp.asarray(
            [float(activations.softplus_inverse(
                jnp.asarray(0.15 - 1e-3, jnp.float32)))]
        ),
    }

    occ_state = nerf_model.init_occupancy(model)
    occ_state = occ_state._replace(
        binary=jnp.ones_like(occ_state.binary)
    )
    events = events_data.EventDataset(str(root)).events
    batcher = pipeline.EventBatcher(events, capacity=96, seed=0)
    losses = []
    for trial in range(3):
        batch = {
            k: jnp.asarray(v) for k, v in batcher.next_batch(96).items()
        }
        loss, metrics = step_lib.compute_loss(
            model, params, bundle.consts, occ_state, batch,
            jax.random.PRNGKey(trial), bundle.static_config,
            bundle.loss_config,
        )
        assert float(metrics["sample_overflow_rate"]) < 1.0
        losses.append(float(loss))
    mean_loss = float(np.mean(losses))
    # flat field scores ~0.4-0.5 (normalized huber of +-1 targets);
    # the true scene must be far below that
    assert mean_loss < 0.1, losses

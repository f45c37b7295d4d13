"""Coarse-to-fine grid-level curriculum (TPU-framework extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.models import fields, hash_encoding, nerf_model
from deblur_e_nerf_tpu.models.contraction import ContractionType


def test_level_mask_schedule():
    model = nerf_model.NeRFModel(
        field=fields.NGPField(
            aabb=(-1, -1, -1, 1, 1, 1),
            contraction_type=ContractionType.AABB,
            n_levels=8, log2_hashmap_size=10,
        ),
        render_config=None, occ_grid_config=None, render_bkgd_mode=None,
        radiance_dim=1, test_chunk_size=16, curriculum=(3, 100, 8),
    )
    m0 = nerf_model.level_mask_for_step(model, jnp.asarray(0))
    np.testing.assert_array_equal(
        np.asarray(m0), [1, 1, 1, 0, 0, 0, 0, 0]
    )
    m250 = nerf_model.level_mask_for_step(model, jnp.asarray(250))
    np.testing.assert_array_equal(
        np.asarray(m250), [1, 1, 1, 1, 1, 0, 0, 0]
    )
    m_full = nerf_model.level_mask_for_step(model, jnp.asarray(10_000))
    np.testing.assert_array_equal(np.asarray(m_full), np.ones(8))

    capped = model._replace(curriculum=(3, 100, 6))
    m_cap = nerf_model.level_mask_for_step(capped, jnp.asarray(10_000))
    np.testing.assert_array_equal(
        np.asarray(m_cap), [1, 1, 1, 1, 1, 1, 0, 0]
    )

    no_cur = model._replace(curriculum=None)
    assert nerf_model.level_mask_for_step(no_cur, jnp.asarray(0)) is None


@pytest.mark.slow
def test_masked_levels_get_zero_table_gradient():
    field = fields.NGPField(
        aabb=(-1, -1, -1, 1, 1, 1),
        contraction_type=ContractionType.AABB,
        n_levels=4, log2_hashmap_size=8, base_resolution=4,
        per_level_scale=2.0, radiance_dim=1,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (64, 3), minval=-0.9, maxval=0.9)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (64, 1))
    variables = field.init(key, x, d)
    levels, _ = hash_encoding.grid_layout("HashGrid", 4, 4, 2.0, 8)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])

    def loss(params):
        rgb, sigma = field.apply(
            {"params": params}, x, d, level_mask=mask
        )
        return jnp.sum(rgb ** 2) + jnp.sum(sigma ** 2)

    grads = jax.grad(loss)(variables["params"])
    gtab = np.asarray(grads["table"])
    # masked levels (2, 3) receive exactly zero gradient
    for li in (2, 3):
        res, size, offset, mode = levels[li]
        assert np.all(gtab[offset:offset + size] == 0), li
    # active levels receive gradient
    res, size, offset, mode = levels[0]
    assert np.any(gtab[offset:offset + size] != 0)

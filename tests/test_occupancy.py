"""Occupancy grid: EMA update, warmup, thresholding (nerfacc semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.models import contraction as cl
from deblur_e_nerf_tpu.models import occupancy

AABB = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
RES = 8


def sphere_occ_eval(key, x, camera_positions):
    """Occupied inside |x| < 0.5 with value 1.0."""
    return (jnp.linalg.norm(x, axis=-1) < 0.5).astype(jnp.float32)


def run_update(state, step, key=0):
    return occupancy.update(
        state, jax.random.PRNGKey(key), sphere_occ_eval,
        jnp.zeros((2, 3)), jnp.asarray(step, jnp.int32),
        resolution=RES, aabb=AABB,
        contraction_type=cl.ContractionType("aabb"),
        occ_thre=0.01, ema_decay=0.5, warmup_steps=4,
    )


def test_warmup_marks_sphere_cells():
    state = occupancy.init_state(RES)
    state = run_update(state, step=0)
    binary = np.asarray(state.binary).reshape(RES, RES, RES)
    # center cells occupied, corner cells empty
    assert binary[RES // 2, RES // 2, RES // 2]
    assert not binary[0, 0, 0]
    # occupancy rate ~ sphere volume / box volume = (4/3)pi 0.5^3 / 8
    rate = binary.mean()
    assert 0.02 < rate < 0.2


@pytest.mark.slow
def test_ema_decay_prunes_emptied_cells():
    state = occupancy.init_state(RES)
    state = run_update(state, step=0)

    def empty_eval(key, x, camera_positions):
        return jnp.zeros(x.shape[:-1], jnp.float32)

    # full-grid (warmup) updates with zero density decay occs by 0.5 each
    for step in range(1, 4):
        state = occupancy.update(
            state, jax.random.PRNGKey(step), empty_eval,
            jnp.zeros((2, 3)), jnp.asarray(step, jnp.int32),
            resolution=RES, aabb=AABB,
            contraction_type=cl.ContractionType("aabb"),
            occ_thre=0.01, ema_decay=0.5, warmup_steps=4,
        )
    # after 3 halvings: 1.0 -> 0.125; still above thre... keep decaying
    for step in range(4, 10):
        state = occupancy.update(
            state, jax.random.PRNGKey(step), empty_eval,
            jnp.zeros((2, 3)), jnp.asarray(step, jnp.int32),
            resolution=RES, aabb=AABB,
            contraction_type=cl.ContractionType("aabb"),
            occ_thre=0.01, ema_decay=0.5, warmup_steps=100,
        )
    assert float(jnp.max(state.occs)) < 0.01


def test_query_matches_binary():
    state = occupancy.init_state(RES)
    state = run_update(state, step=0)
    # query at the center (occupied) and far corner (empty), plus
    # out-of-grid coordinates are always False
    u = jnp.asarray([[0.5, 0.5, 0.5], [0.01, 0.01, 0.01],
                     [1.5, 0.5, 0.5]])
    out = np.asarray(occupancy.query(state, u, RES))
    assert out[0]
    assert not out[1]
    assert not out[2]


def test_thre_floor_blocks_mean_collapse():
    """When the mean occupancy collapses (density sparsity prior), the
    relative threshold min(mean, occ_thre) marks noise cells occupied;
    thre_floor bounds the threshold by an absolute per-step opacity."""
    def tiny_noise_eval(key, x, camera_positions):
        # all cells far below any visible opacity, with slight variation
        return 1e-6 * (1.0 + jnp.sin(jnp.sum(x, axis=-1)))

    def run(floor):
        state = occupancy.init_state(RES)
        return occupancy.update(
            state, jax.random.PRNGKey(0), tiny_noise_eval,
            jnp.zeros((2, 3)), jnp.asarray(0, jnp.int32),
            resolution=RES, aabb=AABB,
            contraction_type=cl.ContractionType("aabb"),
            occ_thre=0.01, ema_decay=0.5, warmup_steps=4,
            thre_floor=floor,
        )

    # nerfacc semantics: ~half the noise cells latch occupied
    assert float(jnp.mean(run(0.0).binary)) > 0.2
    # floored: nothing is above an absolute visible-opacity bar
    assert float(jnp.mean(run(1e-4).binary)) == 0.0

    # the floor must NOT kill genuinely-occupied early-training grids
    state = occupancy.init_state(RES)
    state = occupancy.update(
        state, jax.random.PRNGKey(0), sphere_occ_eval,
        jnp.zeros((2, 3)), jnp.asarray(0, jnp.int32),
        resolution=RES, aabb=AABB,
        contraction_type=cl.ContractionType("aabb"),
        occ_thre=0.01, ema_decay=0.5, warmup_steps=4,
        thre_floor=1e-4,
    )
    assert float(jnp.mean(state.binary)) > 0.02


def test_max_occupied_fraction_caps_pedestal_latch():
    """A pedestal ABOVE the absolute floor latches the whole grid (the
    round-3 burst mechanism at any fixed floor); the quantile cap bounds
    the occupied fraction structurally while keeping the top-occupancy
    (surface) cells marching."""
    def pedestal_plus_surface_eval(key, x, camera_positions):
        # pedestal at 5e-3 everywhere (above a 1e-3 floor), real
        # surface shell at |x| ~ 0.5 with opacity 0.9
        surface = (jnp.abs(jnp.linalg.norm(x, axis=-1) - 0.5)
                   < 0.12).astype(jnp.float32)
        return 5e-3 + 0.9 * surface

    def run(**kw):
        state = occupancy.init_state(RES)
        return occupancy.update(
            state, jax.random.PRNGKey(0), pedestal_plus_surface_eval,
            jnp.zeros((2, 3)), jnp.asarray(0, jnp.int32),
            resolution=RES, aabb=AABB,
            contraction_type=cl.ContractionType("aabb"),
            ema_decay=0.5, warmup_steps=4,
            **{"occ_thre": 0.01, **kw},
        )

    # base threshold below the pedestal (the real runs get there when
    # mean(occs) decays under the pedestal; forced here via occ_thre):
    # the pedestal latches EVERY cell despite the floor
    assert float(jnp.mean(
        run(occ_thre=1e-3, thre_floor=1e-3).binary)) == 1.0
    capped = run(occ_thre=1e-3, thre_floor=1e-3,
                 max_occupied_fraction=0.3)
    frac = float(jnp.mean(capped.binary))
    assert frac <= 0.3 + 1e-6, frac
    # the cap keeps exactly the TOP-occupancy cells (the surface):
    # every surviving cell outranks every culled cell
    occs = np.asarray(capped.occs)
    binary = np.asarray(capped.binary)
    assert binary.any()
    assert occs[binary].min() >= occs[~binary].max()
    # and the survivors are surface-valued, not pedestal-valued
    assert occs[binary].min() > 0.5
    # no-op when the occupied set is already under the cap
    sphere = run(max_occupied_fraction=0.3)
    sphere_ref = run()
    np.testing.assert_array_equal(
        np.asarray(sphere.binary), np.asarray(sphere_ref.binary)
    )


def test_thre_rel_max_rides_the_field_dynamic_range():
    """No FIXED threshold separates init (~2e-3, must bootstrap),
    pedestal (~5e-3, must not latch) and surface (~0.5+, must latch):
    the max-relative bar is ~free at init and rises above the pedestal
    once a surface exists."""
    def run(eval_fn, **kw):
        state = occupancy.init_state(RES)
        return occupancy.update(
            state, jax.random.PRNGKey(0), eval_fn,
            jnp.zeros((2, 3)), jnp.asarray(0, jnp.int32),
            resolution=RES, aabb=AABB,
            contraction_type=cl.ContractionType("aabb"),
            ema_decay=0.5, warmup_steps=4,
            **{"occ_thre": 0.01, "thre_rel_max": 0.03, **kw},
        )

    # init-like field: uniform 2e-3 + tiny noise -> the rel-max bar
    # (0.03 * 2e-3) does not bind; nerfacc bootstrap semantics hold
    # (threshold = mean, ~half the cells latch)
    def init_like(key, x, camera_positions):
        return 2e-3 * (1.0 + 0.1 * jnp.sin(7.0 * jnp.sum(x, axis=-1)))

    frac = float(jnp.mean(run(init_like).binary))
    assert 0.2 < frac < 0.8, frac

    # converged-like field: surface 0.9 + pedestal 5e-3. Base threshold
    # below the pedestal (mean-collapse regime, forced via occ_thre):
    # without rel-max the pedestal latches everything, with it only the
    # surface stays.
    def surface_plus_pedestal(key, x, camera_positions):
        surface = (jnp.abs(jnp.linalg.norm(x, axis=-1) - 0.5)
                   < 0.12).astype(jnp.float32)
        return 5e-3 + 0.9 * surface

    all_latched = run(surface_plus_pedestal, thre_rel_max=0.0,
                      occ_thre=1e-3)
    assert float(jnp.mean(all_latched.binary)) == 1.0
    guarded = run(surface_plus_pedestal, occ_thre=1e-3)
    occs = np.asarray(guarded.occs)
    binary = np.asarray(guarded.binary)
    assert binary.any()
    assert occs[binary].min() > 0.1      # only surface-valued cells
    assert not binary[occs < 6e-3].any()  # no pedestal cell latched

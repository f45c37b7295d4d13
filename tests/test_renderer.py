"""Ray marching + compositing vs brute-force dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.models import occupancy, renderer
from deblur_e_nerf_tpu.models.contraction import ContractionType

AABB = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)
RES = 16


def make_rc(**kwargs):
    defaults = dict(
        aabb=AABB,
        contraction_type=ContractionType.AABB,
        grid_resolution=RES,
        near_plane=0.0,
        far_plane=None,
        render_step_size=0.02,
        cone_angle=0.0,
        early_stop_eps=0.0,
        alpha_thre=0.0,
        stratified=False,
        max_samples_per_ray=256,
        sample_budget=8192,
    )
    defaults.update(kwargs)
    return renderer.RenderConfig(**defaults)


def all_occupied():
    return jnp.ones((RES ** 3,), bool)


def random_rays(rng, n):
    o = rng.uniform(-3, -2, (n, 3)).astype(np.float32)
    target = rng.uniform(-0.5, 0.5, (n, 3))
    d = target - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32))


def gaussian_field(x, d=None):
    """Analytic density blob + direction-independent rgb."""
    sigma = 20.0 * jnp.exp(-10.0 * jnp.sum(x ** 2, axis=-1,
                                           keepdims=True))
    rgb = jnp.stack(
        [0.5 + 0.5 * jnp.tanh(x[..., 0]),
         0.5 + 0.5 * jnp.tanh(x[..., 1]),
         jnp.full_like(x[..., 0], 0.25)], axis=-1
    )
    return rgb, sigma


def brute_force_render(o, d, rc, binary=None):
    """Dense numpy quadrature with the same timeline as the marcher."""
    o = np.asarray(o)
    d = np.asarray(d)
    R = len(o)
    aabb = np.asarray(rc.aabb)
    safe_d = np.where(np.abs(d) < 1e-10, 1e-10, d)
    t0 = (aabb[:3] - o) / safe_d
    t1 = (aabb[3:] - o) / safe_d
    t_in = np.maximum(np.minimum(t0, t1).max(-1), rc.near_plane or 0.0)
    t_out = np.maximum(np.maximum(t0, t1).min(-1), 0.0)
    colors = np.zeros((R, 3))
    opac = np.zeros(R)
    depth = np.zeros(R)
    for r in range(R):
        t = t_in[r]
        T = 1.0
        while t + rc.render_step_size / 2 < t_out[r]:
            tm = t + rc.render_step_size / 2
            x = o[r] + d[r] * tm
            occupied = True
            if binary is not None:
                cell = np.floor(
                    (x - aabb[:3]) / (aabb[3:] - aabb[:3]) * RES
                ).astype(int)
                if np.all((cell >= 0) & (cell < RES)):
                    occupied = bool(
                        np.asarray(binary)[
                            (cell[2] * RES + cell[1]) * RES + cell[0]
                        ]
                    )
                else:
                    occupied = False
            if occupied:
                rgb, sigma = gaussian_field(jnp.asarray(x[None]))
                sigma = float(np.asarray(sigma)[0, 0])
                rgb = np.asarray(rgb)[0]
                alpha = 1 - np.exp(-sigma * rc.render_step_size)
                w = T * alpha
                colors[r] += w * rgb
                opac[r] += w
                depth[r] += w * tm
                T *= 1 - alpha
            t += rc.render_step_size
    return colors, opac, depth


@pytest.mark.slow
def test_render_matches_brute_force_all_occupied():
    rng = np.random.default_rng(0)
    o, d = random_rays(rng, 8)
    rc = make_rc()
    out = renderer.render_rays(
        gaussian_field, all_occupied(), o, d,
        jnp.ones(8, bool), jax.random.PRNGKey(0), rc,
    )
    colors, opac, depth = brute_force_render(o, d, rc)
    np.testing.assert_allclose(np.asarray(out["radiance"]), colors,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["opacity"]), opac,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["depth"]) * np.asarray(out["opacity"] + 1e-10),
        depth, rtol=1e-4, atol=1e-5,
    )


def test_render_with_sparse_occupancy():
    """Occupancy pruning must exactly skip unoccupied cells."""
    rng = np.random.default_rng(1)
    o, d = random_rays(rng, 6)
    rc = make_rc()
    binary = jnp.asarray(rng.uniform(size=RES ** 3) < 0.3)
    out = renderer.render_rays(
        gaussian_field, binary, o, d, jnp.ones(6, bool),
        jax.random.PRNGKey(0), rc,
    )
    colors, opac, _ = brute_force_render(o, d, rc, binary=binary)
    np.testing.assert_allclose(np.asarray(out["radiance"]), colors,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["opacity"]), opac,
                               rtol=1e-4, atol=1e-5)


def test_masked_rays_produce_nothing():
    rng = np.random.default_rng(2)
    o, d = random_rays(rng, 8)
    mask = jnp.asarray([True, False] * 4)
    rc = make_rc()
    out = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, mask,
        jax.random.PRNGKey(0), rc,
    )
    counts = np.asarray(out["counts"])
    assert np.all(counts[1::2] == 0)
    assert np.all(counts[0::2] > 0)
    np.testing.assert_allclose(
        np.asarray(out["radiance"])[1::2], 0.0, atol=1e-7
    )


@pytest.mark.slow
def test_sample_budget_overflow_is_reported():
    rng = np.random.default_rng(3)
    o, d = random_rays(rng, 8)
    rc = make_rc(sample_budget=64)
    out = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, jnp.ones(8, bool),
        jax.random.PRNGKey(0), rc,
    )
    assert int(out["num_marched_samples"]) > 64


def test_early_stop_reduces_sample_count():
    rng = np.random.default_rng(4)
    o, d = random_rays(rng, 8)
    out_full = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, jnp.ones(8, bool),
        jax.random.PRNGKey(0), make_rc(early_stop_eps=0.0),
    )
    out_es = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, jnp.ones(8, bool),
        jax.random.PRNGKey(0), make_rc(early_stop_eps=1e-2),
    )
    assert int(out_es["num_rendering_samples"]) \
        < int(out_full["num_rendering_samples"])
    # radiance changes only marginally (terminated tail carries < eps weight)
    np.testing.assert_allclose(
        np.asarray(out_es["radiance"]), np.asarray(out_full["radiance"]),
        atol=2e-2,
    )


@pytest.mark.slow
def test_render_differentiable_wrt_field():
    """Gradient flows through compositing into a parametrized field."""
    rng = np.random.default_rng(5)
    o, d = random_rays(rng, 4)
    rc = make_rc(max_samples_per_ray=128, sample_budget=1024)

    def loss(scale):
        def field(x, dd):
            rgb, sigma = gaussian_field(x, dd)
            return rgb * scale, sigma * scale

        out = renderer.render_rays(
            field, all_occupied(), o, d, jnp.ones(4, bool),
            jax.random.PRNGKey(0), rc,
        )
        return jnp.sum(out["radiance"])

    g = jax.grad(loss)(jnp.asarray(1.0, jnp.float32))
    assert np.isfinite(float(g)) and float(g) != 0.0
    eps = 1e-3
    fd = (float(loss(jnp.asarray(1.0 + eps)))
          - float(loss(jnp.asarray(1.0 - eps)))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-2)


def test_cone_angle_step_growth():
    t = renderer._step_sequence(
        jnp.asarray([1.0], jnp.float32),
        make_rc(cone_angle=0.01, render_step_size=0.02,
                max_samples_per_ray=64),
    )
    t = np.asarray(t)[0]
    dt = np.diff(t)
    assert np.all(dt >= 0.02 - 1e-6)
    # late steps grow geometrically
    assert dt[-1] > dt[0]
    # recurrence check: dt_k == max(step, cone * t_k) approximately
    want = np.maximum(0.02, 0.01 * t[:-1])
    np.testing.assert_allclose(dt, want, rtol=1e-2)


def test_stratified_jitter_changes_samples():
    rng = np.random.default_rng(6)
    o, d = random_rays(rng, 4)
    rc = make_rc(stratified=True)
    out1 = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, jnp.ones(4, bool),
        jax.random.PRNGKey(1), rc,
    )
    out2 = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, jnp.ones(4, bool),
        jax.random.PRNGKey(2), rc,
    )
    assert not np.allclose(np.asarray(out1["radiance"]),
                           np.asarray(out2["radiance"]))
    # but radiance stays close to the unjittered render
    out0 = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, jnp.ones(4, bool),
        jax.random.PRNGKey(0), make_rc(stratified=False),
    )
    np.testing.assert_allclose(
        np.asarray(out1["radiance"]), np.asarray(out0["radiance"]),
        atol=0.1,
    )


@pytest.mark.slow
def test_precise_excl_segment_cumsum_16m():
    """Double-f32 exclusive segment cumsum vs a float64 oracle at an
    eval-scale buffer (16M+ samples) — the size that used to fall back
    to the noisy pure-f32 path behind the old `K+1 <= 2^20` gate."""
    rng = np.random.default_rng(0)
    n_rays = 34_000
    counts = rng.integers(0, 1025, n_rays)
    total = int(counts.sum())
    assert total > (1 << 24)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
        np.int32
    )
    ray_idx = np.repeat(
        np.arange(n_rays, dtype=np.int32), counts
    )
    sdt = rng.uniform(0.0, 0.2, total).astype(np.float32)

    got = np.asarray(renderer.excl_segment_cumsum_precise(
        jnp.asarray(sdt), jnp.asarray(offsets), jnp.asarray(ray_idx),
        n_rays,
    ))

    cum64 = np.cumsum(sdt.astype(np.float64))
    seg_base = np.where(
        offsets > 0, cum64[np.maximum(offsets - 1, 0)], 0.0
    )
    want = cum64 - sdt.astype(np.float64) - seg_base[ray_idx]
    # pure f32 would err by ~ulp(1e6) ~ 0.06-0.25 here; the double-f32
    # path must stay well below one sample's scale everywhere
    err = np.abs(got - want)
    assert err.max() < 2e-3, err.max()
    assert np.mean(err) < 2e-4


def test_precise_excl_cumsum_matches_f32_when_small():
    rng = np.random.default_rng(1)
    n_rays = 64
    counts = rng.integers(0, 64, n_rays)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
        np.int32
    )
    ray_idx = np.repeat(np.arange(n_rays, dtype=np.int32), counts)
    sdt = rng.uniform(0.0, 0.5, int(counts.sum())).astype(np.float32)
    got = np.asarray(renderer.excl_segment_cumsum_precise(
        jnp.asarray(sdt), jnp.asarray(offsets), jnp.asarray(ray_idx),
        n_rays,
    ))
    cum64 = np.cumsum(sdt.astype(np.float64))
    seg_base = np.where(
        offsets > 0, cum64[np.maximum(offsets - 1, 0)], 0.0
    )
    want = cum64 - sdt - seg_base[ray_idx]
    np.testing.assert_allclose(got, want, atol=1e-4)


def _gaussian_density_only(x):
    return gaussian_field(x)[1]


@pytest.mark.slow
def test_occlusion_prepass_matches_full_render():
    """Prepass culling + compaction must be output- AND gradient-exact:
    dead samples (trans <= eps) carry zero weight and zero cotangent in
    the full path, so removing them changes nothing but the compute."""
    rng = np.random.default_rng(11)
    o, d = random_rays(rng, 16)
    mask = jnp.ones(16, bool)
    key = jax.random.PRNGKey(0)
    rc_full = make_rc(early_stop_eps=1e-4, sample_budget=4096)
    # the soft gaussian culls only ~6% at eps=1e-4: div=2 keeps the
    # buffer above live demand so this test isolates EXACTNESS;
    # compaction under saturation is tested below with a dense field
    rc_pre = make_rc(early_stop_eps=1e-4, sample_budget=4096,
                     prepass_div=2)

    def run(rc, scale, with_density_fn=True):
        def field(x, dd):
            rgb, sigma = gaussian_field(x, dd)
            return rgb * scale, sigma * scale

        return renderer.render_rays(
            field, all_occupied(), o, d, mask, key, rc,
            density_only_fn=(
                (lambda x: _gaussian_density_only(x) * scale)
                if with_density_fn else None
            ),
        )

    one = jnp.asarray(1.0, jnp.float32)
    out_full = run(rc_full, one)
    out_pre = run(rc_pre, one)
    for k in ("radiance", "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(out_pre[k]), np.asarray(out_full[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
    assert int(out_pre["num_rendering_samples"]) \
        == int(out_full["num_rendering_samples"])
    assert float(out_pre["prepass_overflow_rate"]) <= 1.0
    assert float(out_full["prepass_overflow_rate"]) == 0.0

    # a saturating (opaque) field: rays terminate early, the live set
    # fits a 4x-smaller buffer, and outputs still match the full path
    dense = jnp.asarray(50.0, jnp.float32)
    out_full_d = run(rc_full, dense)
    out_pre_d = run(make_rc(early_stop_eps=1e-4, sample_budget=4096,
                            prepass_div=4), dense)
    assert float(out_pre_d["prepass_overflow_rate"]) < 1.0
    assert int(out_pre_d["num_rendering_samples"]) \
        < int(out_full_d["num_marched_samples"])
    # looser tolerance: within a 32k block the optical depth is a plain
    # f32 cumsum, and the full buffer carries the culled samples'
    # 25-clamped sigma*dt through it (cum ~5e4, ulp ~4e-3), so the two
    # LAYOUTS round differently — the compacted path is the *less* noisy
    # one (dead mass removed from the prefix sums)
    for k in ("radiance", "opacity", "depth"):
        np.testing.assert_allclose(
            np.asarray(out_pre_d[k]), np.asarray(out_full_d[k]),
            rtol=5e-4, atol=1e-5, err_msg=k,
        )

    # gradient exactness w.r.t. a field parameter
    g_full = jax.grad(
        lambda s: jnp.sum(run(rc_full, s)["radiance"])
    )(one)
    g_pre = jax.grad(
        lambda s: jnp.sum(run(rc_pre, s)["radiance"])
    )(one)
    np.testing.assert_allclose(float(g_pre), float(g_full), rtol=1e-5)

    # without a density_only_fn the prepass silently disables
    out_nofn = run(rc_pre, one, with_density_fn=False)
    np.testing.assert_allclose(
        np.asarray(out_nofn["radiance"]), np.asarray(out_full["radiance"]),
        rtol=1e-6,
    )


def test_occlusion_prepass_overflow_reported():
    """A too-small prepass buffer drops live tail samples and reports
    demand/capacity > 1 instead of failing silently."""
    rng = np.random.default_rng(12)
    o, d = random_rays(rng, 16)
    rc = make_rc(early_stop_eps=1e-6, sample_budget=4096,
                 prepass_div=16)  # 256 live slots: holds ray 0's ~150
    #                               live samples but not all 16 rays

    def field_thin(x, dd):
        rgb, sigma = gaussian_field(x, dd)
        return rgb, sigma * 1e-3  # nearly transparent: nothing culls

    out = renderer.render_rays(
        field_thin, all_occupied(), o, d, jnp.ones(16, bool),
        jax.random.PRNGKey(0), rc,
        density_only_fn=lambda x: _gaussian_density_only(x) * 1e-3,
    )
    assert float(out["prepass_overflow_rate"]) > 1.0
    # truncated rays are flagged: compaction is ray-ordered, so a
    # leading prefix stays complete and the tail loses live samples
    complete = np.asarray(out["ray_complete"])
    assert complete[0]
    assert not complete.all()


@pytest.mark.slow
def test_march_truncation_flags_incomplete_rays():
    """A too-small SAMPLE budget drops trailing rays' samples; those
    rays must be flagged incomplete while the leading complete rays
    render identically to an un-truncated reference."""
    rng = np.random.default_rng(13)
    o, d = random_rays(rng, 16)
    mask = jnp.ones(16, bool)
    key = jax.random.PRNGKey(0)
    rc_big = make_rc(sample_budget=4096)
    rc_small = make_rc(sample_budget=256)

    full = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, mask, key, rc_big
    )
    trunc = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, mask, key, rc_small
    )
    assert np.asarray(full["ray_complete"]).all()
    complete = np.asarray(trunc["ray_complete"])
    assert complete[0]
    assert not complete.all()
    np.testing.assert_allclose(
        np.asarray(trunc["radiance"])[complete],
        np.asarray(full["radiance"])[complete],
        rtol=1e-5, atol=1e-6,
    )


def test_coarse_truncation_flags_incomplete_rays():
    """Block/superblock buffer overflow drops whole ray SEGMENTS before
    the sample stage, where per-ray counts undercount true demand — the
    04:02 r5fix failure: superblock demand 16x capacity with
    ray_complete reading all-true. Coarse drops must flag ray_complete
    exactly like sample-stage drops, and the flagged-complete prefix
    must render identically to an un-truncated reference."""
    rng = np.random.default_rng(14)
    o, d = random_rays(rng, 16)
    mask = jnp.ones(16, bool)
    key = jax.random.PRNGKey(0)
    full = renderer.render_rays(
        gaussian_field, all_occupied(), o, d, mask, key,
        make_rc(sample_budget=4096),
    )
    assert np.asarray(full["ray_complete"]).all()
    for name, rc in [
        # block buffer too small (superblock stage on)
        ("block", make_rc(sample_budget=4096, block_budget=64)),
        # superblock buffer too small
        ("superblock", make_rc(sample_budget=4096, block_budget=1024,
                               superblock_budget=16)),
        # dense block pass (stage 0 disabled), block buffer too small
        ("dense-block", make_rc(sample_budget=4096, block_budget=64,
                                superblock_budget=0)),
    ]:
        out = renderer.render_rays(
            gaussian_field, all_occupied(), o, d, mask, key, rc
        )
        complete = np.asarray(out["ray_complete"])
        assert complete[0], name
        assert not complete.all(), name
        np.testing.assert_allclose(
            np.asarray(out["radiance"])[complete],
            np.asarray(full["radiance"])[complete],
            rtol=1e-5, atol=1e-6, err_msg=name,
        )


def test_superblock_disable_parity():
    """superblock_budget=0 (dense block pass) must march the identical
    sample set as the superblock path at ample budgets."""
    rng = np.random.default_rng(15)
    o, d = random_rays(rng, 8)
    mask = jnp.ones(8, bool)
    key = jax.random.PRNGKey(3)
    binary = all_occupied()
    rc_sb = make_rc(sample_budget=4096)
    rc_dense = make_rc(sample_budget=4096, superblock_budget=0)
    a = renderer.march_rays(binary, o, d, mask, key, rc_sb)
    b = renderer.march_rays(binary, o, d, mask, key, rc_dense)
    assert a.num_superblocks is not None
    assert b.num_superblocks is None
    np.testing.assert_array_equal(np.asarray(a.counts),
                                  np.asarray(b.counts))
    np.testing.assert_array_equal(np.asarray(a.ray_idx),
                                  np.asarray(b.ray_idx))
    np.testing.assert_allclose(np.asarray(a.t_mid), np.asarray(b.t_mid),
                               rtol=0, atol=0)
    assert np.asarray(a.coarse_complete).all()
    assert np.asarray(b.coarse_complete).all()


@pytest.mark.slow
def test_composite_precise_path_at_training_collapse_scale():
    """Regression pin for the round-2 training collapse: at a ~2M-sample
    buffer the GLOBAL f32 cumsum reaches ~1e4-1e5 where f32 ulp noise
    (~1e-2-1e-1) is of the order of a whole sample's optical depth —
    enough to corrupt per-ray transmittance and stall training at the
    flat-field minimum. composite() must route the optical-depth VALUE
    through the double-f32 precise path at every size; removing it (the
    DENERF_NO_PRECISE_OPTICAL escape hatch simulates the revert) must
    show the failure this test pins."""
    import os

    rng = np.random.default_rng(7)
    n_rays = 16_384
    counts = rng.integers(64, 192, n_rays)
    K = int(counts.sum())
    assert K > (1 << 21) - (1 << 19)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
        np.int32
    )
    ray_idx = np.repeat(np.arange(n_rays, dtype=np.int32), counts)
    dt = np.full(K, 0.02, np.float32)
    t_mid = rng.uniform(0.1, 4.0, K).astype(np.float32)
    # moderate densities: per-sample optical depth ~0.002-0.2, global
    # cumsum ~ 1e4 (the collapse regime)
    sigma = rng.uniform(0.1, 10.0, K).astype(np.float32)
    rgb = rng.uniform(0.0, 1.0, (K, 1)).astype(np.float32)

    samples = renderer.RaySamples(
        t_mid=jnp.asarray(np.append(t_mid, 0.0).astype(np.float32)),
        dt=jnp.asarray(np.append(dt, 0.0).astype(np.float32)),
        ray_idx=jnp.asarray(
            np.append(ray_idx, n_rays).astype(np.int32)
        ),
        counts=jnp.asarray(counts.astype(np.int32)),
        offsets=jnp.asarray(offsets),
        num_samples=jnp.asarray(K, jnp.int32),
    )
    rc = make_rc(sample_budget=K)
    sig = jnp.asarray(np.append(sigma, 0.0).astype(np.float32))
    col = jnp.asarray(
        np.concatenate([rgb, np.zeros((1, 1), np.float32)])
    )

    # float64 oracle (per-ray serial compositing semantics)
    sdt64 = (sigma * 0.02).astype(np.float64)
    cum64 = np.cumsum(sdt64)
    seg_base = np.where(offsets > 0, cum64[np.maximum(offsets - 1, 0)],
                        0.0)
    optical64 = cum64 - sdt64 - seg_base[ray_idx]
    w64 = np.exp(-optical64) * (1.0 - np.exp(-sdt64))
    want = np.zeros((n_rays,), np.float64)
    np.add.at(want, ray_idx, w64 * rgb[:, 0])

    colors, _, _, _ = renderer.composite(sig, col, samples, n_rays, rc)
    err_precise = np.abs(np.asarray(colors)[:, 0] - want).max()
    assert err_precise < 1e-3, err_precise

    # the revert (pure f32 value path) visibly corrupts rays: if this
    # branch ever stops showing the failure, the pin is stale
    os.environ["DENERF_NO_PRECISE_OPTICAL"] = "1"
    try:
        colors32, _, _, _ = renderer.composite(
            sig, col, samples, n_rays, rc
        )
        err_f32 = np.abs(np.asarray(colors32)[:, 0] - want).max()
    finally:
        del os.environ["DENERF_NO_PRECISE_OPTICAL"]
    assert err_f32 > 10 * err_precise, (err_f32, err_precise)

"""Hash-encoding custom-VJP table gradient vs autodiff reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.models import hash_encoding


@pytest.fixture(scope="module")
def setup():
    levels, total = hash_encoding.grid_layout("HashGrid", 4, 4, 1.5, 8)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (total, 2), jnp.float32) * 0.1
    u = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    return levels, table, u


def test_forward_paths_agree(setup):
    levels, table, u = setup
    a = hash_encoding.encode(table, u, levels,
                             differentiable_positions=True)
    b = hash_encoding.encode(table, u, levels,
                             differentiable_positions=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_table_gradient_matches_autodiff(setup):
    levels, table, u = setup
    cotangent = jax.random.normal(
        jax.random.PRNGKey(2),
        (257, len(levels) * 2), jnp.float32,
    )

    def loss_ref(t):
        out = hash_encoding.encode(t, u, levels,
                                   differentiable_positions=True)
        return jnp.sum(out * cotangent)

    def loss_fast(t):
        out = hash_encoding.encode(t, u, levels,
                                   differentiable_positions=False)
        return jnp.sum(out * cotangent)

    g_ref = jax.grad(loss_ref)(table)
    g_fast = jax.grad(loss_fast)(table)
    # the default sort+cumsum backward accumulates in sorted order while
    # autodiff's scatter accumulates in occurrence order; f32 summation
    # order differs (exact in exact arithmetic)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=2e-3, atol=2e-5
    )


def test_position_cotangent_is_zero_in_frozen_mode(setup):
    levels, table, u = setup

    def loss(uu):
        out = hash_encoding.encode(table, uu, levels,
                                   differentiable_positions=False)
        return jnp.sum(out)

    g_u = jax.grad(loss)(u)
    np.testing.assert_array_equal(np.asarray(g_u), 0.0)


@pytest.fixture(scope="module")
def cellhash_setup():
    # base res 8 with scale 2: level 0 dense, levels 1-3 over capacity
    # -> cellhash
    levels, total = hash_encoding.grid_layout(
        "CellHashGrid", 4, 8, 2.0, 10
    )
    assert any(lv[3] == "cellhash" for lv in levels)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (total, 2), jnp.float32) * 0.1
    u = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    return levels, table, u


def test_cellhash_forward_paths_agree(cellhash_setup):
    levels, table, u = cellhash_setup
    a = hash_encoding.encode(table, u, levels,
                             differentiable_positions=True)
    b = hash_encoding.encode(table, u, levels,
                             differentiable_positions=False)
    assert a.shape == (257, len(levels) * 2)
    assert np.all(np.isfinite(np.asarray(a)))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_cellhash_table_gradient_matches_autodiff(cellhash_setup):
    levels, table, u = cellhash_setup
    cotangent = jax.random.normal(
        jax.random.PRNGKey(2), (257, len(levels) * 2), jnp.float32
    )

    def loss_ref(t):
        out = hash_encoding.encode(t, u, levels,
                                   differentiable_positions=True)
        return jnp.sum(out * cotangent)

    def loss_fast(t):
        out = hash_encoding.encode(t, u, levels,
                                   differentiable_positions=False)
        return jnp.sum(out * cotangent)

    g_ref = jax.grad(loss_ref)(table)
    g_fast = jax.grad(loss_fast)(table)
    # the default sort+cumsum backward accumulates in sorted order while
    # autodiff's scatter accumulates in occurrence order; f32 summation
    # order differs (exact in exact arithmetic)
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_fast), rtol=2e-3, atol=2e-5
    )
    assert float(jnp.sum(jnp.abs(g_fast))) > 0


def test_hybrid_layout_mode_split():
    """HybridHashGrid: dense while in capacity, vertex-hash while
    moderately over capacity, cellhash once vertices >= min_load x
    table size."""
    levels, _ = hash_encoding.grid_layout(
        "HybridHashGrid", 8, 4, 2.0, 8, cellhash_min_load=8.0
    )
    modes = [m for _, _, _, m in levels]
    sizes = 1 << 8
    for (res, size, _, mode) in levels:
        n_vert = (res + 1) ** 3
        if n_vert <= sizes:
            assert mode == "dense", (res, mode)
        elif n_vert >= 8.0 * sizes:
            assert mode == "cellhash", (res, mode)
        else:
            assert mode == "hash", (res, mode)
    assert "hash" in modes and "cellhash" in modes and "dense" in modes


def test_hybrid_gradient_matches_autodiff():
    levels, total = hash_encoding.grid_layout(
        "HybridHashGrid", 8, 4, 2.0, 8, cellhash_min_load=8.0
    )
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (total, 2), jnp.float32) * 0.1
    u = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    cotangent = jax.random.normal(
        jax.random.PRNGKey(2), (257, len(levels) * 2), jnp.float32
    )

    def loss(t, differentiable):
        out = hash_encoding.encode(
            t, u, levels, differentiable_positions=differentiable
        )
        return jnp.sum(out * cotangent)

    np.testing.assert_allclose(
        np.asarray(loss(table, True)), np.asarray(loss(table, False)),
        rtol=1e-5,
    )
    g_ref = jax.grad(lambda t: loss(t, True))(table)
    g_fast = jax.grad(lambda t: loss(t, False))(table)
    # f32 summation-order tolerance (sort+cumsum default backward)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_ref), rtol=5e-4, atol=1e-5
    )

def test_sort_backward_matches_scatter(setup, monkeypatch):
    """DENERF_HASH_BWD=sort (sort+cumsum+boundary-diff segment sum,
    hash_encoding.py) must produce the same table gradient as the
    default per-channel scatter path (up to f32 summation order)."""
    levels, table, u = setup
    cotangent = jax.random.normal(
        jax.random.PRNGKey(3), (257, len(levels) * 2), jnp.float32
    )

    def loss(t):
        out = hash_encoding.encode(t, u, levels,
                                   differentiable_positions=False)
        return jnp.sum(out * cotangent)

    monkeypatch.setenv("DENERF_HASH_BWD", "scatter")
    g_scatter = jax.grad(loss)(table)
    monkeypatch.setenv("DENERF_HASH_BWD", "sort")
    g_sort = jax.grad(loss)(table)
    # boundary-diff accumulates through a global cumsum, so its f32
    # rounding differs from direct per-segment accumulation; the method
    # is exact in exact arithmetic (tolerance covers summation order)
    np.testing.assert_allclose(
        np.asarray(g_sort), np.asarray(g_scatter), rtol=1e-3, atol=1e-5
    )
    assert float(jnp.sum(jnp.abs(g_sort))) > 0


@pytest.mark.slow
def test_sort_backward_precision_at_scale():
    """ADVICE r4 (medium): the sort backward's boundary-diff used a
    global f32 cumsum whose per-row error scales with eps * |running
    prefix| — late-offset rows with few contributions got large relative
    gradient error at production N. The blocked compensated cumsum
    (ops/compensated.py) must keep the error near direct-summation f32
    levels at scale. Oracle: the same segment sums in float64."""
    levels, total = hash_encoding.grid_layout("HashGrid", 2, 64, 1.3, 14)
    n = 1 << 20  # ~8.4M contributions (n * 8 corners * 2 levels)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (total, 2), jnp.float32) * 0.1
    u = jax.random.uniform(jax.random.PRNGKey(1), (n, 3),
                           dtype=jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (n, len(levels) * 2),
                            jnp.float32)

    def loss(t):
        out = hash_encoding.encode(t, u, levels,
                                   differentiable_positions=False)
        return jnp.sum(out * cot)

    g_sort = np.asarray(jax.grad(loss)(table))

    import os
    os.environ["DENERF_HASH_BWD"] = "scatter"
    try:
        g_scatter = np.asarray(jax.grad(loss)(table))
    finally:
        os.environ.pop("DENERF_HASH_BWD", None)

    # float64 oracle via the autodiff (scatter-add) path
    g_ref = np.asarray(jax.grad(
        lambda t: jnp.sum(hash_encoding.encode(
            t, u.astype(jnp.float64), levels,
            differentiable_positions=True) * cot.astype(jnp.float64))
    )(table.astype(jnp.float64)))

    err_sort = np.abs(g_sort - g_ref)
    err_scatter = np.abs(g_scatter - g_ref)
    rms_ref = float(np.sqrt(np.mean(g_ref ** 2)))
    # the advisor's criterion: no silent precision regression vs the
    # direct scatter path at production-like scale. Measured 2026-08-19
    # (8.4M contributions): sort max_abs 9.74e-5 / rms_err 1.21e-5 vs
    # scatter max_abs 9.83e-5 / rms_err 1.21e-5 — statistically
    # identical since the blocked compensated cumsum landed.
    assert float(err_sort.max()) < 2.0 * max(
        float(err_scatter.max()), 1e-6 * rms_ref
    ), (float(err_sort.max()), float(err_scatter.max()))
    assert float(np.sqrt(np.mean(err_sort ** 2))) < 1e-4 * rms_ref

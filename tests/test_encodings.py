"""SH encoding orthonormality + hash-grid interpolation properties."""

import jax
import jax.numpy as jnp
import numpy as np

from deblur_e_nerf_tpu.models import hash_encoding, sh_encoding


def test_sh_orthonormality():
    """Real SH basis functions must be orthonormal over the sphere: verified
    by Monte-Carlo integration for all 64 basis functions (degree 8)."""
    rng = np.random.default_rng(0)
    n = 200_000
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    Y = np.asarray(sh_encoding.sh_encode(jnp.asarray(v), degree=8))
    gram = (Y.T @ Y) * (4 * np.pi / n)
    np.testing.assert_allclose(gram, np.eye(64), atol=0.06)


def test_sh_degree_prefix_consistency():
    rng = np.random.default_rng(1)
    v = rng.standard_normal((100, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    full = np.asarray(sh_encoding.sh_encode(jnp.asarray(v), degree=8))
    for degree in (1, 2, 4, 6):
        part = np.asarray(sh_encoding.sh_encode(jnp.asarray(v), degree))
        np.testing.assert_allclose(part, full[:, :degree ** 2],
                                   atol=1e-12)


def _layout(otype="HashGrid", n_levels=4, base=4, scale=1.5, log2_T=8):
    return hash_encoding.grid_layout(otype, n_levels, base, scale, log2_T)


def test_hash_layout_modes():
    levels, total = _layout()
    # small levels dense, large levels hashed
    assert levels[0][3] == "dense"
    assert levels[-1][3] in ("dense", "hash")
    assert total == sum(l[1] for l in levels)
    assert all(l[1] % 128 == 0 for l in levels)

    levels_d, _ = _layout(otype="DenseGrid")
    assert all(l[3] == "dense" for l in levels_d)


def test_hash_encode_vertex_exactness():
    """At a grid vertex of a dense level, the encoding must return that
    vertex's table feature exactly (all trilinear weight on one corner)."""
    levels, total = hash_encoding.grid_layout("DenseGrid", 1, 4, 1.5, 8)
    res, size, offset, mode = levels[0]
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal((total, 2)), jnp.float32)
    # vertex (1, 2, 3) of a res-cell grid -> u = vertex / res
    u = jnp.asarray([[1 / res, 2 / res, 3 / res]], jnp.float32)
    out = np.asarray(hash_encoding.encode(table, u, levels))
    stride = res + 1
    want = np.asarray(table)[(3 * stride + 2) * stride + 1]
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_hash_encode_trilinear_midpoint():
    levels, total = hash_encoding.grid_layout("DenseGrid", 1, 2, 1.0, 8)
    res = levels[0][0]
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((total, 2)), jnp.float32)
    # center of cell (0,0,0): average of its 8 corner features
    u = jnp.asarray([[0.5 / res] * 3], jnp.float32)
    out = np.asarray(hash_encoding.encode(table, u, levels))
    stride = res + 1
    corners = [
        (z * stride + y) * stride + x
        for z in (0, 1) for y in (0, 1) for x in (0, 1)
    ]
    want = np.asarray(table)[corners].mean(axis=0)
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_hash_encode_gradient_scatter():
    """d(sum encode)/d(table) must equal the accumulated trilinear weights —
    checks the autodiff scatter-add transpose against finite differences."""
    levels, total = _layout(n_levels=2)
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal((total, 2)), jnp.float32)
    u = jnp.asarray(rng.uniform(0.05, 0.95, (16, 3)), jnp.float32)

    def f(t):
        return jnp.sum(hash_encoding.encode(t, u, levels) ** 2)

    g = np.asarray(jax.grad(f)(table))
    assert np.isfinite(g).all()
    # finite difference on the largest-gradient entry
    i, j = np.unravel_index(np.abs(g).argmax(), g.shape)
    eps = 1e-3
    tp = table.at[i, j].add(eps)
    tm = table.at[i, j].add(-eps)
    fd = (float(f(tp)) - float(f(tm))) / (2 * eps)
    np.testing.assert_allclose(g[i, j], fd, rtol=1e-2)


def test_hash_encode_out_of_range_clamps():
    levels, total = _layout()
    table = jnp.zeros((total, 2), jnp.float32)
    u = jnp.asarray([[-0.5, 1.5, 0.5]], jnp.float32)
    out = hash_encoding.encode(table, u, levels)
    assert np.isfinite(np.asarray(out)).all()

"""ops/compensated.py: blocked compensated cumsum vs float64 oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur_e_nerf_tpu.ops import compensated


@pytest.mark.parametrize("shape", [(1000,), (1000, 3)])
def test_blocked_cumsum_matches_oracle(shape):
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    within, bhi, blo = compensated.blocked_cumsum(
        jnp.asarray(x), block=64
    )
    oracle = np.cumsum(x.astype(np.float64), axis=0)
    blk = np.arange(shape[0]) // 64
    got = (np.asarray(within, np.float64)
           + np.asarray(bhi, np.float64)[blk]
           + np.asarray(blo, np.float64)[blk])
    np.testing.assert_allclose(got, oracle, rtol=1e-6, atol=1e-5)


def test_blocked_cumsum_large_prefix_cancellation():
    """The motivating case: short segments riding a large running
    prefix. A plain f32 cumsum difference loses ~eps * |global prefix|
    (grows with N); the blocked decomposition bounds the loss at
    ~eps * |within-block prefix| — a fixed ~N/B improvement. (It is NOT
    exact under extreme per-element dynamic range: the within-block
    cumsum is still f32.)"""
    n = 1 << 20
    rng = np.random.default_rng(7)
    x = (np.abs(rng.normal(size=n)) + 0.5).astype(np.float32)
    within, bhi, blo = compensated.blocked_cumsum(jnp.asarray(x))
    B = compensated.DEFAULT_BLOCK
    oracle = np.cumsum(x.astype(np.float64))
    plain = np.cumsum(x)

    def csum(i):
        return (float(within[i])
                + (float(bhi[i // B]) + float(blo[i // B])))

    # tail segment of 8 elements after a ~1e6 prefix
    seg_true = oracle[n - 1] - oracle[n - 9]
    seg_blocked = csum(n - 1) - csum(n - 9)
    seg_plain = float(plain[n - 1] - plain[n - 9])
    err_blocked = abs(seg_blocked - seg_true)
    err_plain = abs(seg_plain - seg_true)
    assert err_blocked < 5e-3 * seg_true, (err_blocked, seg_true)
    # documents why the compensated path exists: the global-prefix f32
    # error is at least an order of magnitude worse
    assert err_blocked < err_plain / 10 or err_plain < 1e-6, (
        err_blocked, err_plain)


def test_group_size_env_cap(monkeypatch):
    from deblur_e_nerf_tpu.models import hash_encoding
    levels, _ = hash_encoding.grid_layout("HashGrid", 8, 64, 1.5, 10)
    modes = [l[3] for l in levels]
    assert all(m == "hash" for m in modes)
    monkeypatch.setenv("DENERF_ENCODE_GROUP", "3")
    groups = hash_encoding._group_levels(levels)
    assert [len(g[1]) for g in groups] == [3, 3, 2]
    monkeypatch.setenv("DENERF_ENCODE_GROUP", "1")
    groups = hash_encoding._group_levels(levels)
    assert [len(g[1]) for g in groups] == [1] * 8

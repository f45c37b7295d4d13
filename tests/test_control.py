"""FOH discretization vs scipy.signal.cont2discrete and LTV simulation."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from deblur_e_nerf_tpu.ops import control


def random_stable_system(rng, n=4, m=1, o=1):
    # stable (negative-real-eigenvalue) system so expm/solve are benign
    a = rng.standard_normal((n, n))
    a = -(a @ a.T) - n * np.eye(n)
    b = rng.standard_normal((n, m))
    c = rng.standard_normal((o, n))
    d = rng.standard_normal((o, m))
    return a, b, c, d


def test_foh_matches_scipy_standard_form():
    rng = np.random.default_rng(0)
    for _ in range(5):
        a, b, c, d = random_stable_system(rng)
        dt = float(rng.uniform(0.01, 0.5))
        sysd = control.foh_cont2discrete(
            control.StateSpace(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                jnp.asarray(d)
            ),
            jnp.asarray(dt), is_state_preserved=False, is_efficient=False,
        )
        ad, bd, cd, dd, _ = scipy.signal.cont2discrete(
            (a, b, c, d), dt, method="foh"
        )
        np.testing.assert_allclose(np.asarray(sysd.A), ad, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(sysd.B), bd, rtol=1e-8,
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(sysd.C), cd, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(sysd.D), dd, rtol=1e-8,
                                   atol=1e-12)


def test_efficient_path_matches_embedding_path():
    rng = np.random.default_rng(1)
    a, b, c, d = random_stable_system(rng)
    dt = 0.05
    sys_in = control.StateSpace(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d)
    )
    for preserved in (False, True):
        s1 = control.foh_cont2discrete(
            sys_in, jnp.asarray(dt), preserved, is_efficient=False
        )
        s2 = control.foh_cont2discrete(
            sys_in, jnp.asarray(dt), preserved, is_efficient=True
        )
        np.testing.assert_allclose(np.asarray(s1.A), np.asarray(s2.A),
                                   rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(np.asarray(s1.B), np.asarray(s2.B),
                                   rtol=1e-7, atol=1e-12)
        if preserved:
            np.testing.assert_allclose(
                np.asarray(s1.B_tilde), np.asarray(s2.B_tilde),
                rtol=1e-7, atol=1e-12,
            )


def test_batched_broadcasting():
    rng = np.random.default_rng(2)
    batch = 7
    a = np.stack([random_stable_system(rng)[0] for _ in range(batch)])
    b = rng.standard_normal((batch, 4, 1))
    c = np.broadcast_to(rng.standard_normal((1, 4)), (batch, 1, 4))
    d = np.zeros((batch, 1, 1))
    dt = rng.uniform(0.01, 0.2, size=batch)
    sysd = control.foh_cont2discrete(
        control.StateSpace(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                           jnp.asarray(d)),
        jnp.asarray(dt), is_state_preserved=True, is_efficient=True,
    )
    for i in range(batch):
        single = control.foh_cont2discrete(
            control.StateSpace(jnp.asarray(a[i]), jnp.asarray(b[i]),
                               jnp.asarray(c[i]), jnp.asarray(d[i])),
            jnp.asarray(dt[i]), is_state_preserved=True, is_efficient=True,
        )
        np.testing.assert_allclose(np.asarray(sysd.A[i]),
                                   np.asarray(single.A), rtol=1e-9)
        np.testing.assert_allclose(np.asarray(sysd.B[i]),
                                   np.asarray(single.B), rtol=1e-7,
                                   atol=1e-12)


def test_state_preserved_form_simulates_foh_response():
    """The non-standard form's state must match the continuous state under a
    piecewise-linear (FOH) input: simulate both densely and discretely."""
    rng = np.random.default_rng(3)
    a, b, c, d = random_stable_system(rng)
    dt = 0.02
    steps = 20
    u = rng.standard_normal(steps + 1)

    # dense continuous simulation with linearly-interpolated input
    fine = 2000
    x = np.zeros(4)
    xs = [x.copy()]
    for k in range(steps):
        for j in range(fine):
            s = j / fine
            uk = (1 - s) * u[k] + s * u[k + 1]
            x = x + (a @ x + b[:, 0] * uk) * (dt / fine)
        xs.append(x.copy())
    xs = np.stack(xs)

    sysd = control.foh_cont2discrete(
        control.StateSpace(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                           jnp.asarray(d)),
        jnp.asarray(dt), is_state_preserved=True, is_efficient=True,
    )
    ad = np.asarray(sysd.A)
    bd = np.asarray(sysd.B)[:, 0]
    btd = np.asarray(sysd.B_tilde)[:, 0]
    xd = np.zeros(4)
    xds = [xd.copy()]
    for k in range(steps):
        xd = ad @ xd + bd * u[k] + btd * u[k + 1]
        xds.append(xd.copy())
    xds = np.stack(xds)
    np.testing.assert_allclose(xds, xs, rtol=5e-3, atol=1e-4)


def test_foh_differentiable():
    rng = np.random.default_rng(4)
    a, b, c, d = random_stable_system(rng)

    def loss(a_in):
        sysd = control.foh_cont2discrete(
            control.StateSpace(a_in, jnp.asarray(b), jnp.asarray(c),
                               jnp.asarray(d)),
            jnp.asarray(0.05), is_state_preserved=True, is_efficient=True,
        )
        return jnp.sum(sysd.A) + jnp.sum(sysd.B) + jnp.sum(sysd.B_tilde)

    g = jax.grad(loss)(jnp.asarray(a))
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference check on one entry
    eps = 1e-6
    a_p = a.copy()
    a_p[0, 0] += eps
    fd = (loss(jnp.asarray(a_p)) - loss(jnp.asarray(a))) / eps
    np.testing.assert_allclose(float(g[0, 0]), float(fd), rtol=1e-3)

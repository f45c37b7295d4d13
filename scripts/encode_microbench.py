"""Microbench: hash-encode + field fwd/bwd cost per sample on TPU.

A/B harness for the round-5 encode restructure (batched level gathers,
bf16 gather dtype, save-encode remat policy). Times three programs at a
protocol-like chunk size:

  encode_fwd     one encode forward over N samples
  field_grad     full field fwd+bwd (table+MLP grads) over N samples,
                 chunked via the renderer's lax.map + checkpoint path
  density_fwd    density-only forward (the occlusion-prepass program)

Usage: python scripts/encode_microbench.py [otype] [compute_dtype] [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from deblur_e_nerf_tpu.models import hash_encoding as he
from deblur_e_nerf_tpu.models import fields, contraction

OTYPE = sys.argv[1] if len(sys.argv) > 1 else "HashGrid"
CDTYPE = sys.argv[2] if len(sys.argv) > 2 else "float32"
N = int(sys.argv[3]) if len(sys.argv) > 3 else (1 << 22)
CHUNK = int(os.environ.get("MB_CHUNK", str(1 << 21)))
REPS = 6


def timeit(fn, *args):
    """Times fn(*args, seed_scalar) -> device scalar. The seed perturbs
    an operand each rep (a caching relay cannot serve a memoized
    result) and the float() fetch forces the full round trip (the axon
    relay's block_until_ready returns before execution completes)."""
    float(fn(*args, jnp.float32(0.0)))
    t0 = time.time()
    for r in range(REPS):
        float(fn(*args, jnp.float32(r + 1)))
    return (time.time() - t0) / REPS


def main():
    print("devices:", jax.devices())
    field = fields.NGPField(
        aabb=(-4.0, -4.0, -4.0, 4.0, 4.0, 4.0),
        contraction_type=contraction.ContractionType.AABB,
        radiance_dim=1,
        pos_otype=OTYPE,
        grid_compute_dtype=CDTYPE,
    )
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (N, 3), jnp.float32, -4.0, 4.0)
    dirs = jnp.ones((N, 3), jnp.float32) / jnp.sqrt(3.0)
    params = field.init(jax.random.PRNGKey(1), pos[:8], dirs[:8])

    # --- encode fwd only -------------------------------------------------
    levels, _ = he.grid_layout(OTYPE, 16, 16, 1.4472692012786865, 19)
    table = params["params"]["table"]
    cd = None if CDTYPE == "float32" else jnp.dtype(CDTYPE)

    def encode_fwd(t, u):
        return he.encode(t, u, levels, differentiable_positions=False,
                         compute_dtype=cd)

    u = (pos + 4.0) / 8.0

    @jax.jit
    def encode_fwd_chunked(t, u, seed):
        u = jnp.mod(u + seed * 0.01, 1.0)
        out = jax.lax.map(lambda uc: encode_fwd(t, uc),
                          u.reshape(-1, CHUNK, 3))
        return jnp.sum(out[..., 0])

    dt = timeit(encode_fwd_chunked, table, u)
    print(f"encode_fwd: {dt*1e3:.1f} ms for {N} samples "
          f"({dt/N*1e9:.1f} ns/sample)", flush=True)

    # --- full field fwd+bwd through the chunked remat path ---------------
    def field_fn(p, x, d):
        return field.apply(p, x, d)

    ckpt = jax.checkpoint(
        lambda p, x, d: field_fn(p, x, d),
        policy=jax.checkpoint_policies.save_only_these_names(
            "hash_encode_out"),
    )

    @jax.jit
    def field_grad(p, x, d, seed):
        x = x + seed * 0.01
        def loss(p):
            xs = x.reshape(-1, CHUNK, 3)
            ds = d.reshape(-1, CHUNK, 3)
            rgb, dens = jax.lax.map(
                lambda xd: ckpt(p, xd[0], xd[1]), (xs, ds))
            return jnp.sum(rgb) + jnp.sum(dens * 1e-3)
        g = jax.grad(loss)(p)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))

    dt = timeit(field_grad, params, pos, dirs)
    print(f"field_grad: {dt*1e3:.1f} ms for {N} samples "
          f"({dt/N*1e9:.1f} ns/sample)", flush=True)

    # --- density-only fwd (prepass program) ------------------------------
    @jax.jit
    def density_fwd(p, x, seed):
        xs = (x + seed * 0.01).reshape(-1, CHUNK, 3)
        out = jax.lax.map(
            lambda xc: field.apply(p, xc, method=field.density), xs)
        return jnp.sum(out)

    dt = timeit(density_fwd, params, pos)
    print(f"density_fwd: {dt*1e3:.1f} ms for {N} samples "
          f"({dt/N*1e9:.1f} ns/sample)", flush=True)


if __name__ == "__main__":
    main()

"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the driver separately dry-runs the
multi-chip path); numeric tests rely on CPU float64. The environment's
sitecustomize pre-imports jax with the TPU backend selected, so the platform
must be re-forced via jax.config (backends initialize lazily).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

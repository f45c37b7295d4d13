"""TPU-backend numeric regression tests (ROADMAP round-4 item).

The test conftest pins the in-process backend to CPU, so TPU numerics
are exercised via a subprocess running scripts/tpu_pb_repro.py on the
environment's default (TPU) backend. Skips when no TPU is reachable.

Repro under test: `pixel_bandwidth.forward_fused` with the unit-test
calibration (tau_in=1e-4, f_c_sf=500) returned non-finite outputs on the
TPU while the identical program was finite on CPU (round-4 finding; the
suspect was the f32 expm/FOH path at toy time constants —
reference semantics: deblur_e_nerf/utils/control.py:29-123).
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SCRIPT = os.path.join(_REPO, "scripts", "tpu_pb_repro.py")


def _run(args, timeout):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        [sys.executable, _SCRIPT] + args,
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=_REPO,
    )


@pytest.mark.slow
@pytest.mark.tpu
def test_forward_fused_finite_on_tpu():
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=120,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("backend probe timed out (no TPU reachable)")
    backend = probe.stdout.strip().splitlines()[-1] if probe.stdout else ""
    if backend in ("", "cpu"):
        pytest.skip(f"no TPU backend available (default={backend!r})")

    result = _run([], timeout=900)
    sys.stderr.write(result.stdout + result.stderr)
    assert result.returncode == 0, (
        "forward_fused produced non-finite stages on TPU:\n"
        + result.stdout + result.stderr
    )
    assert "ALL_FINITE" in result.stdout


def test_forward_fused_finite_on_cpu():
    """The CPU control leg of the repro (fast, always runs)."""
    result = _run(["--cpu"], timeout=300)
    sys.stderr.write(result.stdout + result.stderr)
    assert result.returncode == 0
    assert "ALL_FINITE" in result.stdout

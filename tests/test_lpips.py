"""Native LPIPS(alex): loads a local state dict (stub backbone) and scores.

The reference computes LPIPS with the `lpips` package's pretrained AlexNet
(reference: loss_metric/metric.py:84-90); in zero-egress environments the
weights must come from `metric.lpips_weights_path`. The stub here uses
random weights with the official lpips-package state-dict naming to verify
the loader + forward without downloads.
"""

import numpy as np
import pytest

from deblur_e_nerf_tpu.training import metrics


def _stub_state_dict():
    import torch
    g = torch.Generator().manual_seed(0)

    def w(*shape):
        return torch.randn(*shape, generator=g) * 0.1

    state = {
        "scaling_layer.shift": torch.tensor(
            [-0.030, -0.088, -0.188]
        ).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor(
            [0.458, 0.448, 0.450]
        ).view(1, 3, 1, 1),
        # torchvision AlexNet `features` conv indices 0/3/6/8/10
        "net.slice1.0.weight": w(64, 3, 11, 11),
        "net.slice1.0.bias": w(64),
        "net.slice2.3.weight": w(192, 64, 5, 5),
        "net.slice2.3.bias": w(192),
        "net.slice3.6.weight": w(384, 192, 3, 3),
        "net.slice3.6.bias": w(384),
        "net.slice4.8.weight": w(256, 384, 3, 3),
        "net.slice4.8.bias": w(256),
        "net.slice5.10.weight": w(256, 256, 3, 3),
        "net.slice5.10.bias": w(256),
    }
    for i, c in enumerate((64, 192, 384, 256, 256)):
        state[f"lin{i}.model.1.weight"] = torch.rand(
            1, c, 1, 1, generator=g
        )
    return state


@pytest.fixture()
def weights_path(tmp_path):
    import torch
    path = tmp_path / "lpips_alex.pt"
    torch.save(_stub_state_dict(), str(path))
    # the module caches the model globally; reset between tests
    metrics._LPIPS_MODEL = None
    metrics._LPIPS_UNAVAILABLE = False
    yield str(path)
    metrics._LPIPS_MODEL = None
    metrics._LPIPS_UNAVAILABLE = False


def test_lpips_none_without_weights():
    metrics._LPIPS_MODEL = None
    metrics._LPIPS_UNAVAILABLE = False
    x = np.random.default_rng(0).random((1, 1, 64, 64))
    assert metrics.lpips(x, x, 0.0, 1.0) is None


def test_lpips_scores_with_stub_weights(weights_path):
    rng = np.random.default_rng(0)
    a = rng.random((1, 1, 64, 64))
    b = rng.random((1, 1, 64, 64))
    d_ab = metrics.lpips(a, b, 0.0, 1.0, weights_path=weights_path)
    d_aa = metrics.lpips(a, a, 0.0, 1.0, weights_path=weights_path)
    assert d_ab is not None and np.isfinite(d_ab) and d_ab > 0
    # identical inputs: zero distance (non-negative lin heads, exact)
    assert abs(d_aa) < 1e-9

    out = metrics.compute_all(
        a[0], b[0], 0.0, 1.0, lpips_weights_path=weights_path
    )
    assert np.isfinite(out["lpips"])

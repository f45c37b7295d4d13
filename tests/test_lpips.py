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


def test_lpips_wrong_net_weights_record_nan_instead_of_crashing(
        weights_path):
    """ADVICE r2: a failing `metric.lpips_net` build (here: alex weights
    offered to the vgg backbone) must degrade to NaN (None) like every
    other LPIPS failure path, not raise mid-eval."""
    a = np.zeros((1, 1, 32, 32), np.float64)
    b = np.ones((1, 1, 32, 32), np.float64)
    out = metrics.lpips(a, b, 0.0, 1.0, net="vgg",
                        weights_path=weights_path)
    assert out is None
    # and the failure is cached per (net, path): repeat is silent
    assert metrics.lpips(a, b, 0.0, 1.0, net="vgg",
                         weights_path=weights_path) is None
    # a subsequent supported-net call with the same path must NOT be
    # poisoned by the cached failure
    out_alex = metrics.lpips(a, b, 0.0, 1.0, net="alex",
                             weights_path=weights_path)
    assert out_alex is not None and np.isfinite(out_alex)
    # an unknown backbone name also degrades to NaN
    assert metrics.lpips(a, b, 0.0, 1.0, net="resnet",
                         weights_path=weights_path) is None


def _stub_vgg_state_dict():
    """Keys exactly as `lpips.LPIPS(net='vgg').state_dict()` lays them
    out: torchvision vgg16.features conv indices grouped into slices
    [0:4], [4:9], [9:16], [16:23], [23:30] + 5 lin heads
    (reference dependency: loss_metric/metric.py:84-90)."""
    import torch
    g = torch.Generator().manual_seed(1)

    def w(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    convs = {  # features-index -> (cout, cin)
        "slice1.0": (64, 3), "slice1.2": (64, 64),
        "slice2.5": (128, 64), "slice2.7": (128, 128),
        "slice3.10": (256, 128), "slice3.12": (256, 256),
        "slice3.14": (256, 256),
        "slice4.17": (512, 256), "slice4.19": (512, 512),
        "slice4.21": (512, 512),
        "slice5.24": (512, 512), "slice5.26": (512, 512),
        "slice5.28": (512, 512),
    }
    state = {
        "scaling_layer.shift": torch.zeros(1, 3, 1, 1),
        "scaling_layer.scale": torch.ones(1, 3, 1, 1),
    }
    for name, (cout, cin) in convs.items():
        state[f"net.{name}.weight"] = w(cout, cin, 3, 3)
        state[f"net.{name}.bias"] = w(cout)
    for i, c in enumerate((64, 128, 256, 512, 512)):
        state[f"lin{i}.model.1.weight"] = torch.rand(
            1, c, 1, 1, generator=g
        )
    return state


def _stub_squeeze_state_dict():
    """Keys exactly as `lpips.LPIPS(net='squeeze').state_dict()`:
    torchvision squeezenet1_1.features indices grouped into 7 slices
    ([0:2], [2:5], [5:8], [8:10], [10:11], [11:12], [12:13]) with
    torchvision Fire-module attribute names + 7 lin heads."""
    import torch
    g = torch.Generator().manual_seed(2)

    def w(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    state = {
        "scaling_layer.shift": torch.zeros(1, 3, 1, 1),
        "scaling_layer.scale": torch.ones(1, 3, 1, 1),
        "net.slice1.0.weight": w(64, 3, 3, 3),
        "net.slice1.0.bias": w(64),
    }
    fires = {  # features-index -> (cin, squeeze, expand1x1, expand3x3)
        "slice2.3": (64, 16, 64, 64), "slice2.4": (128, 16, 64, 64),
        "slice3.6": (128, 32, 128, 128), "slice3.7": (256, 32, 128, 128),
        "slice4.9": (256, 48, 192, 192), "slice5.10": (384, 48, 192, 192),
        "slice6.11": (384, 64, 256, 256), "slice7.12": (512, 64, 256, 256),
    }
    for name, (cin, sq, e1, e3) in fires.items():
        state[f"net.{name}.squeeze.weight"] = w(sq, cin, 1, 1)
        state[f"net.{name}.squeeze.bias"] = w(sq)
        state[f"net.{name}.expand1x1.weight"] = w(e1, sq, 1, 1)
        state[f"net.{name}.expand1x1.bias"] = w(e1)
        state[f"net.{name}.expand3x3.weight"] = w(e3, sq, 3, 3)
        state[f"net.{name}.expand3x3.bias"] = w(e3)
    for i, c in enumerate((64, 128, 256, 384, 384, 512, 512)):
        state[f"lin{i}.model.1.weight"] = torch.rand(
            1, c, 1, 1, generator=g
        )
    return state


@pytest.mark.parametrize("net,stub_fn", [
    ("vgg", _stub_vgg_state_dict),
    ("squeeze", _stub_squeeze_state_dict),
])
def test_lpips_vgg_squeeze_backbones(tmp_path, net, stub_fn):
    """The vgg/squeeze backbones load a strict lpips-package-layout
    state dict and score sanely (reference supports all three nets,
    loss_metric/metric.py:84-90)."""
    import torch
    path = tmp_path / f"lpips_{net}.pt"
    torch.save(stub_fn(), str(path))
    metrics._LPIPS_MODEL = None
    metrics._LPIPS_UNAVAILABLE = None
    try:
        rng = np.random.default_rng(0)
        a = rng.random((1, 1, 64, 64))
        b = rng.random((1, 1, 64, 64))
        d_ab = metrics.lpips(a, b, 0.0, 1.0, net=net,
                             weights_path=str(path))
        d_aa = metrics.lpips(a, a, 0.0, 1.0, net=net,
                             weights_path=str(path))
        assert d_ab is not None and np.isfinite(d_ab) and d_ab > 0
        assert abs(d_aa) < 1e-9
    finally:
        metrics._LPIPS_MODEL = None
        metrics._LPIPS_UNAVAILABLE = None


def test_lpips_cache_keyed_on_weights_path(tmp_path, weights_path):
    """ADVICE r2: the model cache must refresh when weights_path (or
    net) changes rather than silently reusing the first model."""
    import torch
    a = np.random.default_rng(0).uniform(0, 1, (1, 1, 64, 64))
    b = np.random.default_rng(1).uniform(0, 1, (1, 1, 64, 64))
    v1 = metrics.lpips(a, b, 0.0, 1.0, weights_path=weights_path)
    # different weights -> different score through the same call path
    state = _stub_state_dict()
    for i in range(5):
        state[f"lin{i}.model.1.weight"] = (
            state[f"lin{i}.model.1.weight"] * 3.0
        )
    path2 = tmp_path / "lpips_alex_v2.pt"
    torch.save(state, str(path2))
    v2 = metrics.lpips(a, b, 0.0, 1.0, weights_path=str(path2))
    assert v1 is not None and v2 is not None
    assert abs(v2 - 3.0 * v1) < 1e-5 * max(1.0, abs(v2))


@pytest.mark.parametrize("net", ["alex", "vgg", "squeeze"])
def test_lpips_golden_fixture(net):
    """Golden parity vs the OFFICIAL lpips package (per backbone): runs
    when the fixture exported by scripts/export_lpips_weights.py (real
    pretrained weights + package outputs) is present; skips in
    zero-egress environments that cannot produce it."""
    import os
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       f"lpips_{net}_golden.npz")
    wts = os.path.join(os.path.dirname(__file__), "fixtures",
                       f"lpips_{net}.pt")
    if not (os.path.isfile(fix) and os.path.isfile(wts)):
        pytest.skip("real-weight LPIPS fixture not exported "
                    "(zero-egress environment)")
    data = np.load(fix)
    metrics._LPIPS_MODEL = None
    metrics._LPIPS_UNAVAILABLE = None
    builder = {"alex": metrics._build_lpips_alex,
               "vgg": metrics._build_lpips_vgg,
               "squeeze": metrics._build_lpips_squeeze}[net]
    model = builder(wts)
    import torch
    with torch.no_grad():
        got = model(
            torch.from_numpy(data["a"]), torch.from_numpy(data["b"])
        ).reshape(-1).numpy()
    np.testing.assert_allclose(got, data["lpips"], rtol=1e-5,
                               atol=1e-6)

"""Image quality metrics: L1 / PSNR / SSIM (native) and LPIPS (gated).

Analog of the reference Metric module
(reference: deblur_e_nerf/loss_metric/metric.py:8-92):
  - L1: channel-mean absolute error.
  - PSNR with data_range = max_target - min_target (relative metric).
  - SSIM with data_range = max_target (absolute metric), gaussian window
    11x11 sigma 1.5 (torchmetrics defaults).
  - LPIPS requires pretrained CNN weights (lpips package + torchvision zoo);
    in zero-egress environments they are unavailable, so `lpips()` returns
    None unless the nets can be constructed (the caller records `nan`).

All computed host-side in float64 (evaluation is not a hot path).
"""

import numpy as np


def l1(pred, target):
    """Mean absolute error over all pixels and channels."""
    return float(np.mean(np.abs(pred - target)))


def psnr(pred, target, data_range):
    """Per-image PSNR, then mean (torchmetrics `dim=(1,2,3)` semantics).

    pred/target: (B, C, H, W).
    """
    mse = np.mean(
        (pred - target) ** 2, axis=(1, 2, 3)
    )
    mse = np.maximum(mse, 1e-20)
    return float(np.mean(10 * np.log10(data_range ** 2 / mse)))


def _gaussian_kernel(size=11, sigma=1.5):
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return g


def _filter2d_valid(img, kernel1d):
    """Separable 2D convolution, valid region only (img: (..., H, W))."""
    from scipy.ndimage import convolve1d
    out = convolve1d(img, kernel1d, axis=-1, mode="constant")
    out = convolve1d(out, kernel1d, axis=-2, mode="constant")
    k = len(kernel1d) // 2
    return out[..., k:-k, k:-k]


def ssim(pred, target, data_range, kernel_size=11, sigma=1.5,
         k1=0.01, k2=0.03):
    """Mean SSIM over the valid (un-padded) region, (B, C, H, W) inputs."""
    kernel = _gaussian_kernel(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = _filter2d_valid(pred, kernel)
    mu_t = _filter2d_valid(target, kernel)
    mu_pp = _filter2d_valid(pred * pred, kernel)
    mu_tt = _filter2d_valid(target * target, kernel)
    mu_pt = _filter2d_valid(pred * target, kernel)

    sigma_p = mu_pp - mu_p ** 2
    sigma_t = mu_tt - mu_t ** 2
    sigma_pt = mu_pt - mu_p * mu_t

    num = (2 * mu_p * mu_t + c1) * (2 * sigma_pt + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (sigma_p + sigma_t + c2)
    return float(np.mean(num / den))


_LPIPS_MODEL = None          # (cache_key, torch module)
_LPIPS_UNAVAILABLE = None    # cache_key of a failed build


def _build_lpips_alex(weights_path):
    """Native LPIPS(alex) re-implementation loading a LOCAL state dict.

    Equivalent to the `lpips` package's `LPIPS(net='alex')` forward
    (reference dependency: loss_metric/metric.py:84-90): scaling layer ->
    AlexNet conv features (taps after each of the 5 ReLUs) ->
    channel-unit-normalize -> squared diff -> learned 1x1 non-negative
    linear heads -> spatial mean -> sum over taps. The state dict uses the
    official lpips-package key naming, so weights exported with
    `torch.save(lpips.LPIPS(net='alex').state_dict(), path)` load as-is.
    There is no download fallback (zero-egress environments); without
    `metric.lpips_weights_path` the metric records NaN.
    """
    import torch
    import torch.nn as nn

    class AlexFeats(nn.Module):
        def __init__(self):
            super().__init__()
            # torchvision AlexNet `features` indices, grouped into the
            # lpips-package slices (taps after ReLU 1/4/7/9/11)
            self.slice1 = nn.Sequential()
            self.slice1.add_module("0", nn.Conv2d(3, 64, 11, 4, 2))
            self.slice1.add_module("1", nn.ReLU(inplace=True))
            self.slice2 = nn.Sequential()
            self.slice2.add_module("2", nn.MaxPool2d(3, 2))
            self.slice2.add_module("3", nn.Conv2d(64, 192, 5, 1, 2))
            self.slice2.add_module("4", nn.ReLU(inplace=True))
            self.slice3 = nn.Sequential()
            self.slice3.add_module("5", nn.MaxPool2d(3, 2))
            self.slice3.add_module("6", nn.Conv2d(192, 384, 3, 1, 1))
            self.slice3.add_module("7", nn.ReLU(inplace=True))
            self.slice4 = nn.Sequential()
            self.slice4.add_module("8", nn.Conv2d(384, 256, 3, 1, 1))
            self.slice4.add_module("9", nn.ReLU(inplace=True))
            self.slice5 = nn.Sequential()
            self.slice5.add_module("10", nn.Conv2d(256, 256, 3, 1, 1))
            self.slice5.add_module("11", nn.ReLU(inplace=True))

        def forward(self, x):
            taps = []
            for s in (self.slice1, self.slice2, self.slice3,
                      self.slice4, self.slice5):
                x = s(x)
                taps.append(x)
            return taps

    class Lin(nn.Module):
        def __init__(self, chn):
            super().__init__()
            self.model = nn.Sequential(
                nn.Dropout(), nn.Conv2d(chn, 1, 1, bias=False)
            )

        def forward(self, x):
            return self.model(x)

    class LPIPSAlex(nn.Module):
        CHNS = (64, 192, 384, 256, 256)

        def __init__(self):
            super().__init__()
            self.scaling_layer = nn.Module()
            self.scaling_layer.register_buffer(
                "shift", torch.zeros(1, 3, 1, 1)
            )
            self.scaling_layer.register_buffer(
                "scale", torch.ones(1, 3, 1, 1)
            )
            self.net = AlexFeats()
            for i, c in enumerate(self.CHNS):
                setattr(self, f"lin{i}", Lin(c))

        def forward(self, in0, in1):
            in0 = (in0 - self.scaling_layer.shift) \
                / self.scaling_layer.scale
            in1 = (in1 - self.scaling_layer.shift) \
                / self.scaling_layer.scale
            taps0, taps1 = self.net(in0), self.net(in1)
            total = 0.0
            for i, (f0, f1) in enumerate(zip(taps0, taps1)):
                # eps AFTER the sqrt: the lpips package's
                # normalize_tensor adds eps to the norm, not the sum —
                # they diverge for near-zero feature maps (ADVICE r4)
                n0 = f0 / (torch.sqrt(
                    (f0 ** 2).sum(dim=1, keepdim=True)) + 1e-10
                )
                n1 = f1 / (torch.sqrt(
                    (f1 ** 2).sum(dim=1, keepdim=True)) + 1e-10
                )
                d = (n0 - n1) ** 2
                total = total + getattr(self, f"lin{i}")(d).mean(
                    dim=(2, 3), keepdim=True
                )
            return total

    return _finalize_lpips(LPIPSAlex(), weights_path)


def _finalize_lpips(model, weights_path):
    import torch
    state = torch.load(weights_path, map_location="cpu",
                       weights_only=True)
    model.load_state_dict(state, strict=True)
    model.eval()
    for p in model.parameters():
        p.requires_grad_(False)
    return model


def _lpips_forward(self, in0, in1):
    """Shared LPIPS forward: scale -> backbone taps -> unit-normalize ->
    squared diff -> 1x1 lin heads -> spatial mean -> sum over taps
    (the lpips package's `spatial=False, lpips=True` forward)."""
    import torch
    in0 = (in0 - self.scaling_layer.shift) / self.scaling_layer.scale
    in1 = (in1 - self.scaling_layer.shift) / self.scaling_layer.scale
    taps0, taps1 = self.net(in0), self.net(in1)
    total = 0.0
    for i, (f0, f1) in enumerate(zip(taps0, taps1)):
        # eps AFTER the sqrt (lpips normalize_tensor parity; ADVICE r4)
        n0 = f0 / (torch.sqrt((f0 ** 2).sum(dim=1, keepdim=True)) + 1e-10)
        n1 = f1 / (torch.sqrt((f1 ** 2).sum(dim=1, keepdim=True)) + 1e-10)
        d = (n0 - n1) ** 2
        total = total + getattr(self, f"lin{i}")(d).mean(
            dim=(2, 3), keepdim=True
        )
    return total


def _build_lpips_vgg(weights_path):
    """Native LPIPS(vgg) loading a LOCAL `lpips.LPIPS(net='vgg')` state
    dict (reference dependency: loss_metric/metric.py:84-90, which
    accepts net in {alex, vgg, squeeze}). Backbone: torchvision VGG16
    `features`, taps after relu1_2/2_2/3_3/4_3/5_3, grouped into the
    lpips-package slices [0:4], [4:9], [9:16], [16:23], [23:30]."""
    import torch
    import torch.nn as nn

    # (slice, features-index, module-ctor) — indices follow torchvision
    # vgg16.features so exported state-dict keys match verbatim
    cfg = [
        (1, [(0, ("conv", 3, 64)), (1, "relu"), (2, ("conv", 64, 64)),
             (3, "relu")]),
        (2, [(4, "pool"), (5, ("conv", 64, 128)), (6, "relu"),
             (7, ("conv", 128, 128)), (8, "relu")]),
        (3, [(9, "pool"), (10, ("conv", 128, 256)), (11, "relu"),
             (12, ("conv", 256, 256)), (13, "relu"),
             (14, ("conv", 256, 256)), (15, "relu")]),
        (4, [(16, "pool"), (17, ("conv", 256, 512)), (18, "relu"),
             (19, ("conv", 512, 512)), (20, "relu"),
             (21, ("conv", 512, 512)), (22, "relu")]),
        (5, [(23, "pool"), (24, ("conv", 512, 512)), (25, "relu"),
             (26, ("conv", 512, 512)), (27, "relu"),
             (28, ("conv", 512, 512)), (29, "relu")]),
    ]

    def make(spec):
        if spec == "relu":
            return nn.ReLU(inplace=True)
        if spec == "pool":
            return nn.MaxPool2d(2, 2)
        _, cin, cout = spec
        return nn.Conv2d(cin, cout, 3, 1, 1)

    model = _make_lpips_module(cfg, make, chns=(64, 128, 256, 512, 512))
    return _finalize_lpips(model, weights_path)


def _build_lpips_squeeze(weights_path):
    """Native LPIPS(squeeze): torchvision SqueezeNet1_1 `features` with
    the lpips package's 7 taps (slices [0:2], [2:5], [5:8], [8:10],
    [10:11], [11:12], [12:13]) and 7 lin heads."""
    import torch
    import torch.nn as nn

    class Fire(nn.Module):
        def __init__(self, cin, sq, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, sq, 1)
            self.squeeze_activation = nn.ReLU(inplace=True)
            self.expand1x1 = nn.Conv2d(sq, e1, 1)
            self.expand1x1_activation = nn.ReLU(inplace=True)
            self.expand3x3 = nn.Conv2d(sq, e3, 3, padding=1)
            self.expand3x3_activation = nn.ReLU(inplace=True)

        def forward(self, x):
            x = self.squeeze_activation(self.squeeze(x))
            return torch.cat([
                self.expand1x1_activation(self.expand1x1(x)),
                self.expand3x3_activation(self.expand3x3(x)),
            ], 1)

    cfg = [
        (1, [(0, ("conv", 3, 64)), (1, "relu")]),
        (2, [(2, "pool"), (3, ("fire", 64, 16, 64, 64)),
             (4, ("fire", 128, 16, 64, 64))]),
        (3, [(5, "pool"), (6, ("fire", 128, 32, 128, 128)),
             (7, ("fire", 256, 32, 128, 128))]),
        (4, [(8, "pool"), (9, ("fire", 256, 48, 192, 192))]),
        (5, [(10, ("fire", 384, 48, 192, 192))]),
        (6, [(11, ("fire", 384, 64, 256, 256))]),
        (7, [(12, ("fire", 512, 64, 256, 256))]),
    ]

    def make(spec):
        if spec == "relu":
            return nn.ReLU(inplace=True)
        if spec == "pool":
            return nn.MaxPool2d(3, 2, ceil_mode=True)
        if spec[0] == "conv":
            return nn.Conv2d(spec[1], spec[2], 3, stride=2)
        return Fire(*spec[1:])

    model = _make_lpips_module(
        cfg, make, chns=(64, 128, 256, 384, 384, 512, 512)
    )
    return _finalize_lpips(model, weights_path)


def _make_lpips_module(cfg, make, chns):
    """Assemble an LPIPS module: backbone slices per `cfg` (module names
    keep the torchvision `features` indices so lpips-package state dicts
    load verbatim), scaling layer, and one 1x1 lin head per tap."""
    import torch
    import torch.nn as nn

    class Feats(nn.Module):
        def __init__(self):
            super().__init__()
            self.n_slices = len(cfg)
            for si, mods in cfg:
                s = nn.Sequential()
                for idx, spec in mods:
                    s.add_module(str(idx), make(spec))
                setattr(self, f"slice{si}", s)

        def forward(self, x):
            taps = []
            for si in range(1, self.n_slices + 1):
                x = getattr(self, f"slice{si}")(x)
                taps.append(x)
            return taps

    class Lin(nn.Module):
        def __init__(self, chn):
            super().__init__()
            self.model = nn.Sequential(
                nn.Dropout(), nn.Conv2d(chn, 1, 1, bias=False)
            )

        def forward(self, x):
            return self.model(x)

    class LPIPSNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.scaling_layer = nn.Module()
            self.scaling_layer.register_buffer(
                "shift", torch.zeros(1, 3, 1, 1)
            )
            self.scaling_layer.register_buffer(
                "scale", torch.ones(1, 3, 1, 1)
            )
            self.net = Feats()
            for i, c in enumerate(chns):
                setattr(self, f"lin{i}", Lin(c))

        forward = _lpips_forward

    return LPIPSNet()


def lpips(pred, target, min_target_val, max_target_val, net="alex",
          weights_path=None):
    """LPIPS on range-normalized images expanded to 3 channels
    (reference: metric.py:84-90). Returns None when no local pretrained
    weights are configured (zero-egress environment)."""
    global _LPIPS_MODEL, _LPIPS_UNAVAILABLE
    if weights_path is None:
        return None
    # the cache is keyed on (net, weights_path): a later call with a
    # different config must not silently reuse the old model, and an
    # unsupported net degrades to NaN like every other failure path
    # (an exception here would crash evaluation mid-training)
    cache_key = (net, str(weights_path))
    if _LPIPS_UNAVAILABLE == cache_key:
        return None
    builders = {
        "alex": _build_lpips_alex,
        "vgg": _build_lpips_vgg,
        "squeeze": _build_lpips_squeeze,
    }
    if _LPIPS_MODEL is None or _LPIPS_MODEL[0] != cache_key:
        try:
            if net not in builders:
                raise NotImplementedError(
                    f"native LPIPS backbone {net!r} "
                    f"(supported: {sorted(builders)})"
                )
            _LPIPS_MODEL = (cache_key, builders[net](weights_path))
        except Exception as e:
            print(f"LPIPS unavailable ({e}); recording NaN")
            _LPIPS_UNAVAILABLE = cache_key
            return None
    import torch
    rng = max_target_val - min_target_val
    p = 2 * (pred - min_target_val) / rng - 1
    t = 2 * (target - min_target_val) / rng - 1
    p = torch.from_numpy(np.ascontiguousarray(p)).float()
    t = torch.from_numpy(np.ascontiguousarray(t)).float()
    if p.shape[1] == 1:
        p = p.expand(-1, 3, -1, -1)
        t = t.expand(-1, 3, -1, -1)
    with torch.no_grad():
        return float(_LPIPS_MODEL[1](p, t).mean())


def compute_all(pred, target, min_target_val, max_target_val,
                lpips_net="alex", lpips_weights_path=None):
    """All metrics for one (C, H, W) image pair; returns a dict."""
    pred = np.asarray(pred, np.float64)[None]
    target = np.asarray(target, np.float64)[None]
    rng = max_target_val - min_target_val
    out = {
        "l1": l1(pred, target),
        "psnr": psnr(pred, target, rng),
        "ssim": ssim(pred, target, max_target_val),
    }
    lp = lpips(pred, target, min_target_val, max_target_val, lpips_net,
               lpips_weights_path)
    out["lpips"] = float("nan") if lp is None else lp
    return out

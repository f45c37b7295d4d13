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


_LPIPS_MODEL = None
_LPIPS_UNAVAILABLE = False


def lpips(pred, target, min_target_val, max_target_val, net="alex"):
    """LPIPS on range-normalized images expanded to 3 channels
    (reference: metric.py:84-90). Returns None when the pretrained
    backbone cannot be loaded (zero-egress environment)."""
    global _LPIPS_MODEL, _LPIPS_UNAVAILABLE
    if _LPIPS_UNAVAILABLE:
        return None
    if _LPIPS_MODEL is None:
        try:
            import lpips as lpips_pkg
            import torch  # noqa: F401
            _LPIPS_MODEL = lpips_pkg.LPIPS(net=net)
            for p in _LPIPS_MODEL.parameters():
                p.requires_grad_(False)
        except Exception:
            _LPIPS_UNAVAILABLE = True
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
        return float(_LPIPS_MODEL(in0=p, in1=t).mean())


def compute_all(pred, target, min_target_val, max_target_val,
                lpips_net="alex"):
    """All metrics for one (C, H, W) image pair; returns a dict."""
    pred = np.asarray(pred, np.float64)[None]
    target = np.asarray(target, np.float64)[None]
    rng = max_target_val - min_target_val
    out = {
        "l1": l1(pred, target),
        "psnr": psnr(pred, target, rng),
        "ssim": ssim(pred, target, max_target_val),
    }
    lp = lpips(pred, target, min_target_val, max_target_val, lpips_net)
    out["lpips"] = float("nan") if lp is None else lp
    return out

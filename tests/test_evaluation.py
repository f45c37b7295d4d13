"""Evaluation stack: metrics, affine/offset-gamma corrections, artifacts,
checkpoint selective restore."""

import os

import numpy as np
import pytest

from deblur_e_nerf_tpu.models import offset_gamma
from deblur_e_nerf_tpu.training import (checkpoint as checkpoint_lib,
                                        evaluation,
                                        metrics as metrics_lib)
from deblur_e_nerf_tpu.utils.config import ConfigDict


# ------------------------------------------------------------- metrics
def test_l1_psnr_basics():
    rng = np.random.default_rng(0)
    target = rng.uniform(0.2, 1.0, (1, 1, 16, 16))
    assert metrics_lib.l1(target, target) == 0.0
    assert metrics_lib.psnr(target, target, 0.8) > 100
    noisy = target + 0.1
    # |x+0.1 - x| = 0.1
    assert metrics_lib.l1(noisy, target) == pytest.approx(0.1)
    # PSNR = 10 log10(dr^2 / mse) with mse = 0.01
    assert metrics_lib.psnr(noisy, target, 0.8) == pytest.approx(
        10 * np.log10(0.8 ** 2 / 0.01)
    )


def _ssim_bruteforce(pred, target, data_range, size=11, sigma=1.5,
                     k1=0.01, k2=0.03):
    """Direct per-window SSIM over the valid region (H, W inputs)."""
    coords = np.arange(size) - (size - 1) / 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    w = np.outer(g, g)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    H, W = pred.shape
    vals = []
    for i in range(H - size + 1):
        for j in range(W - size + 1):
            p = pred[i:i + size, j:j + size]
            t = target[i:i + size, j:j + size]
            mp, mt = (w * p).sum(), (w * t).sum()
            sp = (w * p * p).sum() - mp ** 2
            st = (w * t * t).sum() - mt ** 2
            spt = (w * p * t).sum() - mp * mt
            vals.append(
                ((2 * mp * mt + c1) * (2 * spt + c2))
                / ((mp ** 2 + mt ** 2 + c1) * (sp + st + c2))
            )
    return float(np.mean(vals))


def test_ssim_matches_bruteforce():
    rng = np.random.default_rng(1)
    target = rng.uniform(0, 1, (20, 20))
    pred = np.clip(target + rng.normal(0, 0.05, (20, 20)), 0, 1)
    fast = metrics_lib.ssim(pred[None, None], target[None, None], 1.0)
    slow = _ssim_bruteforce(pred, target, 1.0)
    assert fast == pytest.approx(slow, rel=1e-10)
    assert metrics_lib.ssim(
        target[None, None], target[None, None], 1.0
    ) == pytest.approx(1.0)


# --------------------------------------------------- affine correction
@pytest.mark.parametrize("per_channel", [True, False])
def test_affine_log_correction_recovers_transform(per_channel):
    rng = np.random.default_rng(2)
    B, C, H, W = 2, 3, 8, 8
    pred_log = rng.normal(0, 1, (B, C, H, W))
    gamma = np.array([1.5, 0.8, 1.1]) if per_channel \
        else np.array([1.3, 1.3, 1.3])
    log_scale = np.array([0.5, -0.2, 0.1])
    target_log = gamma[None, :, None, None] * pred_log \
        + log_scale[None, :, None, None]
    corrected, fit_gamma, fit_scale = evaluation.affine_log_correction(
        pred_log, target_log, per_channel
    )
    np.testing.assert_allclose(corrected, target_log, atol=1e-8)
    if per_channel:
        np.testing.assert_allclose(fit_gamma, gamma, atol=1e-8)
    else:
        np.testing.assert_allclose(fit_gamma, [1.3], atol=1e-8)
    np.testing.assert_allclose(fit_scale, np.exp(log_scale), atol=1e-7)


# ------------------------------------------------------- offset gamma
@pytest.mark.parametrize("algo", ["gn", "lm"])
def test_offset_gamma_optimize_recovers_params(algo):
    rng = np.random.default_rng(3)
    B, C, H, W = 2, 1, 12, 12
    x = rng.uniform(0.2, 2.0, (B, C, H, W, 1))
    const_scale = rng.uniform(0.8, 1.2, (B, 1, 1, 1, 1))
    true = offset_gamma.OffsetGammaCorrection(
        const_scale, np.array([[[[1.7]]]]), np.array([[[[0.9]]]]),
        np.array([[[[0.3]]]]),
    )
    target = true(x)
    fit = offset_gamma.OffsetGammaCorrection(
        const_scale, np.ones((1, 1, 1, 1)), np.ones((1, 1, 1, 1)),
        np.zeros((1, 1, 1, 1)),
    )
    errors = offset_gamma.optimize(
        fit, x, target, algo=algo, max_steps=50
    )
    assert errors[-1] < 1e-12
    assert fit.scale.ravel()[0] == pytest.approx(1.7, rel=1e-3)
    assert fit.gamma.ravel()[0] == pytest.approx(0.9, rel=1e-3)
    assert fit.offset.ravel()[0] == pytest.approx(0.3, rel=1e-3)


def test_offset_gamma_jacobian_matches_finite_difference():
    rng = np.random.default_rng(4)
    x = rng.uniform(0.5, 1.5, (1, 3, 4, 4, 1))
    corr = offset_gamma.OffsetGammaCorrection(
        np.ones((1, 1, 1, 1, 1)),
        rng.uniform(0.8, 1.2, (3, 1, 1, 1)),
        rng.uniform(0.8, 1.2, (3, 1, 1, 1)),
        rng.uniform(-0.1, 0.1, (3, 1, 1, 1)),
    )
    J = corr.jacobian(x)
    theta0 = corr.params()
    eps = 1e-7
    for k in range(len(theta0)):
        theta = theta0.copy()
        theta[k] += eps
        corr.set_params(theta)
        up = corr(x).ravel()
        theta[k] -= 2 * eps
        corr.set_params(theta)
        down = corr(x).ravel()
        corr.set_params(theta0)
        np.testing.assert_allclose(
            J[:, k], (up - down) / (2 * eps), atol=1e-5
        )


# --------------------------------------------------- evaluator epoch end
def test_evaluator_epoch_end_with_black_level(tmp_path):
    rng = np.random.default_rng(5)
    H = W = 24
    config = ConfigDict({
        "per_channel_log_it_scale": False,
        "black_level_offset": True,
        "optimizer": {"algo": "lm", "max_steps": 20},
    })
    ev = evaluation.Evaluator(
        config, has_bayer=False, log_dir=str(tmp_path),
        save_pred_intensity_img=True,
    )
    outputs = []
    for i in range(3):
        target = rng.uniform(0.1, 1.0, (H, W))
        # prediction differs by a power law + scale + offset
        pred = (2.0 * target + 0.05) ** (1 / 1.2)
        outputs.append({
            "sample_id": f"img{i}",
            "pred_intensity_img": pred,
            "target_intensity_img": target,
            "exposure_time": 1000, "gain": 1.0,
        })
    metric = ev.epoch_end(outputs, 0.1, 1.0, epoch=0)
    assert metric["psnr"] > 35  # correction must nearly invert
    assert metric["ssim"] > 0.95
    assert np.isnan(metric["lpips"])  # pretrained net unavailable
    assert (tmp_path / "correction-errors" / "0.csv").exists()
    assert (tmp_path / "predictions" / "img0.png").exists()


# ----------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip_and_selective_restore(tmp_path):
    params = {
        "nerf": {"field": {"w": np.arange(6, np.float32).reshape(2, 3)
                           if False else
                           np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "contrast_threshold": {"raw": np.float32(0.5)},
    }
    path = str(tmp_path / "ckpt")
    checkpoint_lib.save(path, {"params": params, "step": 7})
    restored = checkpoint_lib.restore(path)
    assert int(restored["step"]) == 7
    np.testing.assert_array_equal(
        restored["params"]["nerf"]["field"]["w"],
        params["nerf"]["field"]["w"],
    )

    fresh = {
        "nerf": {"field": {"w": np.zeros((2, 3), np.float32)}},
        "contrast_threshold": {"raw": np.float32(0.0)},
    }
    merged = checkpoint_lib.selective_restore_params(
        fresh, restored["params"], {"nerf": True,
                                    "contrast_threshold": False},
    )
    np.testing.assert_array_equal(
        merged["nerf"]["field"]["w"], params["nerf"]["field"]["w"]
    )
    assert merged["contrast_threshold"]["raw"] == 0.0

    with pytest.raises(KeyError):
        checkpoint_lib.selective_restore_params(
            fresh, restored["params"], {"missing_component": True}
        )

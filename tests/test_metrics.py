"""PSNR/SSIM parity vs a torch transliteration of evaluate.py:16-85."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from videoframeinterpolation_tpu.eval.metrics import psnr, ssim_3d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_ssim(img1, img2, window_size=11):
    def gaussian(ws, sigma):
        g = torch.Tensor(
            [math.exp(-((x - ws // 2) ** 2) / float(2 * sigma**2)) for x in range(ws)]
        )
        return g / g.sum()

    _1d = gaussian(window_size, 1.5).unsqueeze(1)
    _2d = _1d.mm(_1d.t())
    _3d = _2d.unsqueeze(2) @ (_1d.t())
    window = _3d.expand(1, 1, window_size, window_size, window_size).contiguous()

    if torch.max(img1) > 128:
        max_val = 255
    else:
        max_val = 1
    if torch.min(img1) < -0.5:
        min_val = -1
    else:
        min_val = 0
    L = max_val - min_val

    img1 = img1.unsqueeze(1)
    img2 = img2.unsqueeze(1)
    pad5 = (5, 5, 5, 5, 5, 5)
    mu1 = F.conv3d(F.pad(img1, pad5, mode="replicate"), window)
    mu2 = F.conv3d(F.pad(img2, pad5, mode="replicate"), window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1.pow(2), mu2.pow(2), mu1 * mu2
    sigma1_sq = F.conv3d(F.pad(img1 * img1, pad5, "replicate"), window) - mu1_sq
    sigma2_sq = F.conv3d(F.pad(img2 * img2, pad5, "replicate"), window) - mu2_sq
    sigma12 = F.conv3d(F.pad(img1 * img2, pad5, "replicate"), window) - mu1_mu2
    C1 = (0.01 * L) ** 2
    C2 = (0.03 * L) ** 2
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    return ssim_map.mean()


def test_psnr_matches_reference_formula():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    ours = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    theirs = float(-10 * torch.log10(((ta - tb) ** 2).mean()))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_ssim_matches_torch_3d_formulation():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (1, 24, 20, 3)).astype(np.float32)
    bb = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    ours = float(ssim_3d(jnp.asarray(a), jnp.asarray(bb)))
    theirs = float(
        _torch_ssim(
            torch.from_numpy(a).permute(0, 3, 1, 2),
            torch.from_numpy(bb).permute(0, 3, 1, 2),
        )
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_ssim_identical_images_near_one():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
    val = float(ssim_3d(jnp.asarray(a), jnp.asarray(a)))
    assert val > 0.99

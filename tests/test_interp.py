"""Golden tests for grid_sample / resize against torch (CPU) references.

These pin the exact sampling conventions the reference relies on:
grid_sample(mode=bilinear, align_corners=True, padding border/zeros)
(reference modules/warp.py:14, modules/deformable_attn.py:99) and
F.interpolate(mode=bilinear, align_corners=True/False)
(models/BaseModel.py:19-22, models/archive/IFRNet.py:6-8).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from videoframeinterpolation_tpu.ops import (
    grid_sample,
    normalized_grid_sample,
    resize_bilinear,
    bwarp,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_grid_sample_matches_torch(padding_mode):
    B, H, W, C = 2, 9, 13, 4
    img = _rand(B, H, W, C, seed=1)
    rng = np.random.default_rng(2)
    # Include well out-of-bounds coordinates.
    grid = rng.uniform(-1.7, 1.7, size=(B, 6, 7, 2)).astype(np.float32)

    ours = normalized_grid_sample(
        jnp.asarray(img), jnp.asarray(grid), padding_mode=padding_mode
    )

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tgrid = torch.from_numpy(grid)
    theirs = F.grid_sample(
        timg, tgrid, mode="bilinear", padding_mode=padding_mode,
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_bwarp_matches_torch_reference_formula():
    """bwarp == grid_sample(img, base_grid + normalized flow) per warp.py:7-15."""
    B, H, W, C = 2, 8, 12, 3
    img = _rand(B, H, W, C, seed=3)
    flow = (_rand(B, H, W, 2, seed=4) * 3.0).astype(np.float32)

    ours = np.asarray(bwarp(jnp.asarray(img), jnp.asarray(flow)))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    xx = torch.linspace(-1.0, 1.0, W).view(1, 1, 1, W).expand(B, -1, H, -1)
    yy = torch.linspace(-1.0, 1.0, H).view(1, 1, H, 1).expand(B, -1, -1, W)
    grid = torch.cat([xx, yy], 1)
    flow_ = torch.cat(
        [tflow[:, 0:1] / ((W - 1.0) / 2.0), tflow[:, 1:2] / ((H - 1.0) / 2.0)], 1
    )
    grid_ = (grid + flow_).permute(0, 2, 3, 1)
    theirs = F.grid_sample(
        timg, grid_, mode="bilinear", padding_mode="border", align_corners=True
    ).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("scale", [2.0, 4.0])
def test_resize_bilinear_upscale_matches_torch(align_corners, scale):
    B, H, W, C = 2, 7, 9, 3
    x = _rand(B, H, W, C, seed=5)
    out_hw = (int(H * scale), int(W * scale))
    ours = np.asarray(
        resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners)
    )
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        scale_factor=scale,
        recompute_scale_factor=False,
        mode="bilinear",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_downscale_matches_torch():
    B, H, W, C = 1, 16, 12, 2
    x = _rand(B, H, W, C, seed=6)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), (8, 6), align_corners=True))
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(8, 6),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_grid_sample_pixel_coords_identity():
    B, H, W, C = 1, 5, 6, 2
    img = _rand(B, H, W, C, seed=7)
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    coords = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(out, img, rtol=1e-6, atol=1e-6)

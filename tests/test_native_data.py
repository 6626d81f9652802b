"""Native C++ augmentation vs the numpy pipeline (the oracle)."""

import numpy as np
import pytest

from videoframeinterpolation_tpu.data import augment
from videoframeinterpolation_tpu.data.native import (
    augment_triplet_native,
    available,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable (no toolchain)"
)


def _numpy_pipeline(x0, x1, xt, f0x, f1x, crop_hw, h_off, w_off,
                    chan_reverse, vf, hf, rot):
    frames = np.concatenate(
        [x0.astype(np.float32), x1.astype(np.float32),
         xt.astype(np.float32), f0x, f1x], axis=2)
    ch, cw = crop_hw
    frames = augment.crop(frames, h_off, w_off, ch, cw)
    if chan_reverse:
        frames = augment.reverse_channels(frames)
    if vf:
        frames = augment.vflip(frames, True)
    if hf:
        frames = augment.hflip(frames, True)
    frames = augment.rot90(frames, rot, True)
    frames = frames.astype(np.float32)
    frames[:, :, :9] /= 255.0
    return frames


@pytest.mark.parametrize("rot", [0, 1, 2, 3])
@pytest.mark.parametrize("flips", [(0, 0), (1, 0), (0, 1), (1, 1)])
def test_native_matches_numpy(rot, flips):
    rng = np.random.default_rng(42 + rot)
    H, W = 24, 30
    x0 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    x1 = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    xt = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    f0x = rng.standard_normal((H, W, 2)).astype(np.float32) * 4
    f1x = rng.standard_normal((H, W, 2)).astype(np.float32) * 4
    vf, hf = flips
    crop_hw, h_off, w_off = (16, 20), 3, 5

    ref = _numpy_pipeline(x0, x1, xt, f0x, f1x, crop_hw, h_off, w_off,
                          True, vf, hf, rot)
    out = augment_triplet_native(
        x0, x1, xt, f0x, f1x, crop_hw=crop_hw, h_off=h_off, w_off=w_off,
        chan_reverse=True, vflip=bool(vf), hflip=bool(hf), rot=rot,
        img_scale=1.0 / 255.0, flow_scale=1.0,
    )
    assert out is not None
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_native_no_flow():
    rng = np.random.default_rng(0)
    x0 = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    out = augment_triplet_native(
        x0, x0, x0, None, None, crop_hw=(8, 8), h_off=0, w_off=0,
        chan_reverse=False, vflip=False, hflip=False, rot=1,
    )
    assert out is not None and out.shape == (8, 8, 9)
    np.testing.assert_allclose(
        out[:, :, 0:3], np.rot90(x0[:8, :8], 1, (0, 1)) / 255.0, rtol=1e-6)

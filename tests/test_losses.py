"""Loss parity tests against a torch transliteration of modules/losses.py."""

import numpy as np
import pytest
import jax.numpy as jnp

from videoframeinterpolation_tpu.ops import (
    charbonnier_ada,
    charbonnier_l1,
    geometry_loss,
    get_robust_weight,
    ternary_loss,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_census(tensor, patch_size):
    """Transliteration of Ternary.transform (modules/losses.py:26-31)."""
    out_channels = patch_size * patch_size
    w = np.eye(out_channels).reshape((patch_size, patch_size, 1, out_channels))
    w = torch.tensor(np.transpose(w, (3, 2, 0, 1))).float()
    tensor_ = tensor.mean(dim=1, keepdim=True)
    patches = F.conv2d(tensor_, w, padding=patch_size // 2, bias=None)
    loc_diff = patches - tensor_
    return loc_diff / torch.sqrt(0.81 + loc_diff ** 2)


def _torch_ternary(x, y, patch_size=7):
    dx = _torch_census(x, patch_size)
    dy = _torch_census(y, patch_size).detach()
    diff = dx - dy
    dist = (diff ** 2 / (0.1 + diff ** 2)).mean(dim=1, keepdim=True)
    pad = patch_size // 2
    b, c, h, w = x.size()
    inner = torch.ones(b, 1, h - 2 * pad, w - 2 * pad)
    mask = F.pad(inner, [pad] * 4)
    return (dist * mask).mean()


def _torch_geometry(x, y, patch_size=3):
    out_channels = patch_size * patch_size
    w = np.eye(out_channels).reshape((patch_size, patch_size, 1, out_channels))
    w = torch.tensor(np.transpose(w, (3, 2, 0, 1))).float()

    def transform(t):
        b, c, h, w_ = t.size()
        t_ = t.reshape(b * c, 1, h, w_)
        patches = F.conv2d(t_, w, padding=patch_size // 2, bias=None)
        loc_diff = patches - t_
        loc_diff_ = loc_diff.reshape(b, c * out_channels, h, w_)
        return loc_diff_ / torch.sqrt(0.81 + loc_diff_ ** 2)

    diff = transform(x) - transform(y)
    dist = (diff ** 2 / (0.1 + diff ** 2)).mean(dim=1, keepdim=True)
    pad = patch_size // 2
    b, c, h, w_ = x.size()
    inner = torch.ones(b, 1, h - 2 * pad, w_ - 2 * pad)
    mask = F.pad(inner, [pad] * 4)
    return (dist * mask).mean()


def test_ternary_loss_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 16, 18, 3)).astype(np.float32)
    y = rng.uniform(0, 1, (2, 16, 18, 3)).astype(np.float32)
    ours = float(ternary_loss(jnp.asarray(x), jnp.asarray(y), 7))
    theirs = float(_torch_ternary(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_geometry_loss_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 14, 5)).astype(np.float32)
    y = rng.standard_normal((2, 12, 14, 5)).astype(np.float32)
    ours = float(geometry_loss(jnp.asarray(x), jnp.asarray(y), 3))
    theirs = float(_torch_geometry(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
    ))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_charbonnier_l1_matches_torch():
    rng = np.random.default_rng(2)
    d = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ours = float(charbonnier_l1(jnp.asarray(d)))
    theirs = float(((torch.from_numpy(d) ** 2 + 1e-6) ** 0.5).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    m = (rng.uniform(0, 1, (2, 8, 8, 1)) > 0.5).astype(np.float32)
    m_b = np.broadcast_to(m, d.shape).copy()
    ours_m = float(charbonnier_l1(jnp.asarray(d), jnp.asarray(m_b)))
    td, tm = torch.from_numpy(d), torch.from_numpy(m_b)
    theirs_m = float((((td ** 2 + 1e-6) ** 0.5) * tm).mean() / (tm.mean() + 1e-9))
    np.testing.assert_allclose(ours_m, theirs_m, rtol=1e-6)


def test_charbonnier_ada_and_robust_weight_match_torch():
    rng = np.random.default_rng(3)
    pred = rng.standard_normal((2, 8, 8, 2)).astype(np.float32)
    gt = rng.standard_normal((2, 8, 8, 2)).astype(np.float32)

    w_ours = np.asarray(get_robust_weight(jnp.asarray(pred), jnp.asarray(gt), 0.3))
    tp = torch.from_numpy(pred).permute(0, 3, 1, 2)
    tg = torch.from_numpy(gt).permute(0, 3, 1, 2)
    epe = ((tp - tg) ** 2).sum(dim=1, keepdim=True) ** 0.5
    w_theirs = torch.exp(-0.3 * epe).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(w_ours, w_theirs, rtol=1e-5, atol=1e-6)

    diff = rng.standard_normal((2, 8, 8, 2)).astype(np.float32)
    ours = float(charbonnier_ada(jnp.asarray(diff), jnp.asarray(w_ours)))
    tw = torch.from_numpy(w_theirs).permute(0, 3, 1, 2)
    tdiff = torch.from_numpy(diff).permute(0, 3, 1, 2)
    alpha = tw / 2
    epsilon = 10 ** (-(10 * tw - 1) / 3)
    theirs = float(((tdiff ** 2 + epsilon ** 2) ** alpha).mean())
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

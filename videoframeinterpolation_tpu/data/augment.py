"""Geometric augmentations with explicit RNG (reference ``data/base.py:128-266``).

The pipeline operates on an HWC stack ``[x0(3) | x1(3) | xt(3) | f0x(2) | f1x(2)]``
(flow channels optional) and applies, in reference order:

  1. 10% chance of 2x bilinear upscale (flow values doubled),
  2. random crop to ``(crop_h, crop_w)``,
  3. 50% RGB channel reversal of the three images,
  4. 50% vertical flip (flow ``fy`` negated),
  5. 50% horizontal flip (flow ``fx`` negated),
  6. random 0-3 x 90-degree rotation (flow components rotated).

Each step is a deterministic function so tests can pin the flow fixups;
``random_augment`` strings them together from a ``numpy.random.Generator``
(the reference uses global ``random``/module state — irreproducible across
workers; explicit generators fix that).
"""

from __future__ import annotations

import numpy as np

N_IMG_CH = 9  # x0 | x1 | xt


def resize2x(frames: np.ndarray, with_flow: bool) -> np.ndarray:
    """2x bilinear upscale; flow magnitudes double (``data/base.py:207-212``)."""
    import cv2

    imgs = [
        cv2.resize(frames[:, :, i:i + 3], dsize=None, fx=2.0, fy=2.0,
                   interpolation=cv2.INTER_LINEAR)
        for i in (0, 3, 6)
    ]
    out = imgs
    if with_flow:
        flow = cv2.resize(frames[:, :, 9:], dsize=None, fx=2.0, fy=2.0,
                          interpolation=cv2.INTER_LINEAR) * 2.0
        out = imgs + [flow]
    return np.concatenate(out, axis=2)


def crop(frames: np.ndarray, h_off: int, w_off: int, ch: int, cw: int) -> np.ndarray:
    return frames[h_off:h_off + ch, w_off:w_off + cw, :]


def reverse_channels(frames: np.ndarray) -> np.ndarray:
    """RGB -> BGR on the three images only (``data/base.py:221-228``)."""
    out = frames.copy()
    for i in (0, 3, 6):
        out[:, :, i:i + 3] = frames[:, :, i + 2:None if i == 0 else i - 1:-1]
    return out


def vflip(frames: np.ndarray, with_flow: bool) -> np.ndarray:
    """Vertical flip; fy negated (``data/base.py:230-235``)."""
    out = frames[::-1, :, :].copy()
    if with_flow:
        out[:, :, 10] = -out[:, :, 10]
        out[:, :, 12] = -out[:, :, 12]
    return out


def hflip(frames: np.ndarray, with_flow: bool) -> np.ndarray:
    """Horizontal flip; fx negated (``data/base.py:237-242``)."""
    out = frames[:, ::-1, :].copy()
    if with_flow:
        out[:, :, 9] = -out[:, :, 9]
        out[:, :, 11] = -out[:, :, 11]
    return out


def rot90(frames: np.ndarray, k: int, with_flow: bool) -> np.ndarray:
    """k x 90-degree CCW rotation with flow component fixup
    (``data/base.py:244-255``): k=1 -> (fx,fy)<-(fy,-fx); k=2 -> negate;
    k=3 -> (fx,fy)<-(-fy,fx)."""
    out = np.rot90(frames, k, (0, 1)).copy()
    if with_flow and k:
        f = out[:, :, 9:]
        if k == 1:
            f = np.concatenate(
                (f[:, :, 1:2], -f[:, :, 0:1], f[:, :, 3:4], -f[:, :, 2:3]), 2
            )
        elif k == 2:
            f = -f
        elif k == 3:
            f = np.concatenate(
                (-f[:, :, 1:2], f[:, :, 0:1], -f[:, :, 3:4], f[:, :, 2:3]), 2
            )
        out[:, :, 9:] = f
    return out


def random_augment(
    rng: np.random.Generator,
    frames: np.ndarray,
    crop_hw: tuple[int, int],
    with_flow: bool,
) -> np.ndarray:
    """The full reference augmentation pipeline with explicit RNG."""
    if rng.uniform() < 0.1:
        frames = resize2x(frames, with_flow)
    h, w, _ = frames.shape
    ch, cw = crop_hw
    h_off = int(rng.integers(0, h - ch + 1))
    w_off = int(rng.integers(0, w - cw + 1))
    frames = crop(frames, h_off, w_off, ch, cw)
    if rng.uniform() < 0.5:
        frames = reverse_channels(frames)
    if rng.uniform() < 0.5:
        frames = vflip(frames, with_flow)
    if rng.uniform() < 0.5:
        frames = hflip(frames, with_flow)
    k = int(rng.integers(0, 4))
    frames = rot90(frames, k, with_flow)
    return np.ascontiguousarray(frames.astype(np.float32))

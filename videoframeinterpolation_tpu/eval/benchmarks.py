"""Validation loops (reference ``evaluate.py:88-210``): Vimeo90K, UCF101,
SNU-FILM. Each takes a jitted ``infer(x0, x1, t) -> pred`` callable on
NHWC [0, 1] float32 batches."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..data import DataLoader, InputPadder, Vimeo90K
from ..data.readers import read_image
from .metrics import psnr, ssim_3d


def validate_vimeo90k(
    infer: Callable,
    root: str,
    batch_size: int = 4,
    report_ssim: bool = False,
    num_workers: int = 8,
) -> dict:
    """Per-image PSNR over the Vimeo90K test split (``evaluate.py:88-124``)."""
    ds = Vimeo90K(root, is_train=False)
    loader = DataLoader(
        ds, batch_size, shuffle=False, drop_last=False,
        num_workers=num_workers,
    )
    print(f"Number of validation images: {len(ds)}")
    psnrs, ssims = [], []
    for batch in loader:
        pred = infer(
            jnp.asarray(batch["x0"]), jnp.asarray(batch["x1"]),
            jnp.asarray(batch["t"]),
        )
        pred = np.asarray(pred)
        for i in range(pred.shape[0]):
            psnrs.append(float(psnr(pred[i], batch["xt"][i])))
            if report_ssim:
                ssims.append(
                    float(ssim_3d(pred[i:i + 1], batch["xt"][i:i + 1]))
                )
    results = {"val/vimeo90k_psnr": float(np.mean(psnrs))}
    log = f"Validation Vimeo90K PSNR: {results['val/vimeo90k_psnr']:.4f}"
    if report_ssim:
        results["val/vimeo90k_ssim"] = float(np.mean(ssims))
        log += f", SSIM: {results['val/vimeo90k_ssim']:.4f}"
    print(log)
    return results


def validate_ucf101(
    infer: Callable,
    root: str = "datasets/UCF-101/test",
    report_ssim: bool = False,
) -> dict:
    """Directory-walk evaluation (``evaluate.py:127-160``)."""
    dirs = sorted(os.listdir(root))
    print(f"Number of validation images: {len(dirs)}")
    t = np.full((1, 1, 1, 1), 0.5, np.float32)
    psnrs, ssims = [], []
    for d in dirs:
        base = Path(root) / d
        img0 = read_image(str(base / "frame_00.png")).astype(np.float32) / 255.0
        img1 = read_image(str(base / "frame_02.png")).astype(np.float32) / 255.0
        gt = read_image(str(base / "frame_01_gt.png")).astype(np.float32) / 255.0
        pred = np.asarray(
            infer(jnp.asarray(img0[None]), jnp.asarray(img1[None]),
                  jnp.asarray(t))
        )
        psnrs.append(float(psnr(pred[0], gt)))
        if report_ssim:
            ssims.append(float(ssim_3d(pred, gt[None])))
    results = {"val/ucf101_psnr": float(np.mean(psnrs))}
    log = f"Validation UCF101 PSNR: {results['val/ucf101_psnr']:.4f}"
    if report_ssim:
        results["val/ucf101_ssim"] = float(np.mean(ssims))
        log += f", SSIM: {results['val/ucf101_ssim']:.4f}"
    print(log)
    return results


def validate_synthetic(
    infer: Callable,
    seed: int = 42,
    num_items: int = 64,
    hw: tuple[int, int] = (256, 448),
    batch_size: int = 4,
    report_ssim: bool = False,
) -> dict:
    """Held-out PSNR on the procedural-motion generator (no reference
    counterpart; used for architecture-level quality studies when no
    Vimeo90K copy is available on the host)."""
    from ..data.synthetic import SyntheticMotion

    ds = SyntheticMotion(crop_hw=hw, is_train=False, seed=seed,
                         num_items=num_items)
    psnrs, ssims = [], []
    for start in range(0, num_items, batch_size):
        items = [ds[i] for i in range(start, min(start + batch_size,
                                                 num_items))]
        x0 = jnp.asarray(np.stack([it["x0"] for it in items]))
        x1 = jnp.asarray(np.stack([it["x1"] for it in items]))
        t = jnp.asarray(np.stack([it["t"] for it in items]))
        gt = np.stack([it["xt"] for it in items])
        pred = np.asarray(infer(x0, x1, t))
        for i in range(pred.shape[0]):
            psnrs.append(float(psnr(pred[i], gt[i])))
            if report_ssim:
                ssims.append(float(ssim_3d(pred[i:i + 1], gt[i:i + 1])))
    results = {"val/synthetic_psnr": float(np.mean(psnrs))}
    log = f"Validation Synthetic PSNR: {results['val/synthetic_psnr']:.4f}"
    if report_ssim:
        results["val/synthetic_ssim"] = float(np.mean(ssims))
        log += f", SSIM: {results['val/synthetic_ssim']:.4f}"
    print(log)
    return results


def _fix_snu_prefix(p: str) -> str:
    """SNU-FILM list files name frames under ``data/SNU-FILM/...``; this
    repo keeps them under ``datasets/``. Remap only the leading path
    component (the reference's blanket ``p.replace("data", "datasets")``,
    ``evaluate.py:177``, would corrupt any path whose sequence name
    contains the substring "data")."""
    return "datasets/" + p[len("data/"):] if p.startswith("data/") else p


def validate_snu(
    infer: Callable,
    root: str = "datasets/SNU-FILM",
    report_ssim: bool = False,
) -> dict:
    """SNU-FILM easy/medium/hard/extreme with InputPadder
    (``evaluate.py:163-210``)."""
    results = {}
    t = np.full((1, 1, 1, 1), 0.5, np.float32)
    levels = ["test-easy.txt", "test-medium.txt", "test-hard.txt",
              "test-extreme.txt"]
    for test_file in levels:
        psnrs, ssims = [], []
        with open(Path(root) / test_file) as f:
            file_list = [line.strip().split(" ") for line in f if line.strip()]
        for paths in file_list:
            i0_path, gt_path, i1_path = (
                _fix_snu_prefix(p) for p in paths[:3]
            )
            i0 = read_image(i0_path).astype(np.float32)[None] / 255.0
            gt = read_image(gt_path).astype(np.float32)[None] / 255.0
            i1 = read_image(i1_path).astype(np.float32)[None] / 255.0
            padder = InputPadder(i0.shape, divisor=16)
            i0p, i1p = padder.pad(jnp.asarray(i0), jnp.asarray(i1))
            pred = padder.unpad(infer(i0p, i1p, jnp.asarray(t)))
            pred = np.asarray(pred)
            psnrs.append(float(psnr(pred[0], gt[0])))
            if report_ssim:
                ssims.append(float(ssim_3d(pred, gt)))
        name = test_file[:-4]
        results[f"val/snu_{name}_psnr"] = float(np.mean(psnrs))
        log = f"Validation SNU-FILM {name} PSNR: {results[f'val/snu_{name}_psnr']:.4f}"
        if report_ssim:
            results[f"val/snu_{name}_ssim"] = float(np.mean(ssims))
            log += f", SSIM: {results[f'val/snu_{name}_ssim']:.4f}"
        print(log)
    return results

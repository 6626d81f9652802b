"""Procedural-motion dataset: determinism, GT-flow consistency, contract."""

import numpy as np
import jax.numpy as jnp

from videoframeinterpolation_tpu.data import DATASET_REGISTRY, DataLoader
from videoframeinterpolation_tpu.data.synthetic import SyntheticMotion
from videoframeinterpolation_tpu.eval.metrics import psnr
from videoframeinterpolation_tpu.ops import bwarp


def test_item_contract_and_determinism():
    ds = SyntheticMotion(crop_hw=(64, 96), seed=7)
    item = ds[5]
    assert item["x0"].shape == (64, 96, 3)
    assert item["x1"].shape == (64, 96, 3)
    assert item["xt"].shape == (64, 96, 3)
    assert item["f0x"].shape == (64, 96, 2)
    assert item["f1x"].shape == (64, 96, 2)
    assert item["t"].shape == (1, 1, 1)
    for k in ("x0", "x1", "xt"):
        assert item[k].dtype == np.float32
        assert item[k].min() >= 0.0 and item[k].max() <= 1.0
    again = ds[5]
    for k in item:
        np.testing.assert_array_equal(item[k], again[k])


def test_train_val_splits_disjoint():
    tr = SyntheticMotion(crop_hw=(64, 64), seed=7, is_train=True)
    va = SyntheticMotion(crop_hw=(64, 64), seed=7, is_train=False)
    assert not np.array_equal(tr[0]["x0"], va[0]["x0"])
    assert not np.array_equal(tr[1]["x0"], tr[0]["x0"])


def test_gt_flow_warp_consistency():
    # bwarp(x0, f0x_pixels) must reconstruct xt well (occlusion regions are
    # the only mismatch, bounded by layer area).
    ds = SyntheticMotion(crop_hw=(128, 128), seed=3, flow_in_pixels=True)
    for i in range(3):
        it = ds[i]
        w0 = bwarp(jnp.asarray(it["x0"][None]), jnp.asarray(it["f0x"][None]))
        w1 = bwarp(jnp.asarray(it["x1"][None]), jnp.asarray(it["f1x"][None]))
        assert float(psnr(w0[0], jnp.asarray(it["xt"]))) > 24.0
        assert float(psnr(w1[0], jnp.asarray(it["xt"]))) > 24.0
        # The frames themselves differ substantially (real motion).
        assert float(psnr(jnp.asarray(it["x0"]), jnp.asarray(it["xt"]))) < 30.0


def test_flow_scale_quirk_matches_vimeo_pipeline():
    # Default items carry flows at 1/255 scale (the training recipe the
    # flagship's distillation loss was tuned on, data/Vimeo90K.py:100).
    px = SyntheticMotion(crop_hw=(64, 64), seed=1, flow_in_pixels=True)
    sc = SyntheticMotion(crop_hw=(64, 64), seed=1, flow_in_pixels=False)
    np.testing.assert_allclose(
        sc[2]["f0x"], px[2]["f0x"] / 255.0, rtol=1e-6, atol=1e-7
    )


def test_registry_and_loader_batching():
    assert "SyntheticMotion" in DATASET_REGISTRY
    ds = DATASET_REGISTRY["SyntheticMotion"](
        root="ignored", crop_hw=(32, 32), is_train=True, seed=0, num_items=8
    )
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                        num_workers=0)
    batch = next(iter(loader))
    assert batch["x0"].shape == (4, 32, 32, 3)
    assert batch["t"].shape == (4, 1, 1, 1)
    assert batch["f0x"].shape == (4, 32, 32, 2)

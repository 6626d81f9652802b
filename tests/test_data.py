"""Data pipeline tests: reader round-trips, augmentation flow invariants,
dataset items, sharded loader."""

import numpy as np
import pytest

from videoframeinterpolation_tpu.data import (
    DataLoader,
    InputPadder,
    Vimeo90K,
    Vimeo90KwFlow,
    random_augment,
    read,
    read_flo,
    write_flo,
)
from videoframeinterpolation_tpu.data import augment


def _stack(h=16, w=20, with_flow=True, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 255, (h, w, 9)).astype(np.float32)
    if not with_flow:
        return imgs
    flow = rng.standard_normal((h, w, 4)).astype(np.float32) * 3
    return np.concatenate([imgs, flow], axis=2)


def test_flo_roundtrip(tmp_path):
    flow = np.random.default_rng(0).standard_normal((8, 10, 2)).astype(np.float32)
    p = str(tmp_path / "f.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)
    np.testing.assert_array_equal(read(p), flow)


def test_vflip_negates_fy():
    s = _stack()
    out = augment.vflip(s, True)
    np.testing.assert_array_equal(out[:, :, 9], s[::-1, :, 9])     # fx kept
    np.testing.assert_array_equal(out[:, :, 10], -s[::-1, :, 10])  # fy negated
    np.testing.assert_array_equal(out[:, :, 12], -s[::-1, :, 12])


def test_hflip_negates_fx():
    s = _stack()
    out = augment.hflip(s, True)
    np.testing.assert_array_equal(out[:, :, 9], -s[:, ::-1, 9])
    np.testing.assert_array_equal(out[:, :, 10], s[:, ::-1, 10])


def test_rot90_flow_semantics():
    """The rotated flow must still be geometrically consistent: warping a
    rotated image by the rotated flow == rotating the warped image."""
    import jax.numpy as jnp
    from videoframeinterpolation_tpu.ops import bwarp

    rng = np.random.default_rng(1)
    h = w = 16
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    flow = rng.uniform(-2, 2, (h, w, 2)).astype(np.float32)

    warped = np.asarray(bwarp(jnp.asarray(img[None]), jnp.asarray(flow[None])))[0]

    stack = np.concatenate(
        [img, img, img, flow, flow], axis=2
    )  # reuse layout: channels 9:11 are (fx, fy)
    for k in range(4):
        rot = augment.rot90(stack, k, True)
        rimg = rot[:, :, 0:3]
        rflow = rot[:, :, 9:11]
        rwarped = np.asarray(
            bwarp(jnp.asarray(rimg[None]), jnp.asarray(rflow[None]))
        )[0]
        np.testing.assert_allclose(
            rwarped, np.rot90(warped, k, (0, 1)), rtol=1e-4, atol=1e-4,
            err_msg=f"rot90 k={k} flow fixup is inconsistent",
        )


def test_flip_flow_semantics():
    """Same geometric-consistency check for flips."""
    import jax.numpy as jnp
    from videoframeinterpolation_tpu.ops import bwarp

    rng = np.random.default_rng(2)
    h, w = 12, 18
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    flow = rng.uniform(-2, 2, (h, w, 2)).astype(np.float32)
    warped = np.asarray(bwarp(jnp.asarray(img[None]), jnp.asarray(flow[None])))[0]
    stack = np.concatenate([img, img, img, flow, flow], axis=2)

    for fn, spatial in [
        (augment.vflip, lambda a: a[::-1, :, :]),
        (augment.hflip, lambda a: a[:, ::-1, :]),
    ]:
        out = fn(stack, True)
        rwarped = np.asarray(
            bwarp(jnp.asarray(out[None, :, :, 0:3]),
                  jnp.asarray(out[None, :, :, 9:11]))
        )[0]
        np.testing.assert_allclose(rwarped, spatial(warped), rtol=1e-4, atol=1e-4)


def test_random_augment_shapes_and_determinism():
    s = _stack(h=20, w=24)
    a1 = random_augment(np.random.Generator(np.random.PCG64(7)), s.copy(), (16, 16), True)
    a2 = random_augment(np.random.Generator(np.random.PCG64(7)), s.copy(), (16, 16), True)
    assert a1.shape[2] == 13
    assert a1.shape[0] == 16 and a1.shape[1] == 16
    np.testing.assert_array_equal(a1, a2)


def _make_vimeo_tree(tmp_path, n_seq=6, with_flow=True, hw=(32, 48)):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    root = tmp_path / "vimeo"
    seqs = [f"{i//3:05d}/{i%3:04d}" for i in range(n_seq)]
    for s in seqs:
        d = root / "sequences" / s
        d.mkdir(parents=True)
        for name in ("im1.png", "im2.png", "im3.png"):
            imageio.imwrite(
                d / name, rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
            )
        if with_flow:
            fd = root / "flow" / s
            fd.mkdir(parents=True)
            for name in ("flow_t0.flo", "flow_t1.flo"):
                write_flo(str(fd / name),
                          rng.standard_normal((*hw, 2)).astype(np.float32))
    with open(root / "tri_trainlist.txt", "w") as f:
        f.write("\n".join(seqs) + "\n")
    with open(root / "tri_testlist.txt", "w") as f:
        f.write("\n".join(seqs) + "\n\n")
    return str(root)


def test_vimeo_datasets(tmp_path):
    root = _make_vimeo_tree(tmp_path)
    ds = Vimeo90KwFlow(root, crop_hw=(16, 16), is_train=True, seed=1)
    assert len(ds) == 6
    item = ds[0]
    assert set(item) == {"x0", "x1", "xt", "t", "f0x", "f1x"}
    assert item["x0"].shape == (16, 16, 3)
    assert item["f0x"].shape == (16, 16, 2)
    assert item["x0"].max() <= 1.0

    ds_test = Vimeo90K(root, is_train=False)
    it = ds_test[0]
    assert it["x0"].shape == (32, 48, 3)
    assert 0.0 <= it["x0"].min() and it["x0"].max() <= 1.0


def test_loader_sharding_and_batching(tmp_path):
    root = _make_vimeo_tree(tmp_path)
    ds = Vimeo90KwFlow(root, crop_hw=(16, 16), is_train=True, seed=1)

    loaders = [
        DataLoader(ds, batch_size=1, num_workers=2, seed=5,
                   shard_index=i, num_shards=2)
        for i in range(2)
    ]
    for ld in loaders:
        ld.set_epoch(0)
    assert len(loaders[0]) == 3  # 6 items / 2 shards / batch 1

    batches0 = list(loaders[0])
    batches1 = list(loaders[1])
    assert len(batches0) == 3 and len(batches1) == 3
    b = batches0[0]
    assert b["x0"].shape == (1, 16, 16, 3)
    assert b["t"].shape == (1, 1, 1, 1)

    # Different epochs give different order.
    loaders[0].set_epoch(1)
    assert len(list(loaders[0])) == 3


def test_input_padder():
    import jax.numpy as jnp

    x = jnp.ones((1, 30, 45, 3))
    p = InputPadder(x.shape, divisor=16)
    (xp,) = p.pad(x)
    assert xp.shape[1] % 16 == 0 and xp.shape[2] % 16 == 0
    back = p.unpad(xp)
    assert back.shape == x.shape

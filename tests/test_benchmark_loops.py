"""UCF101 / SNU-FILM validation loops on synthetic directory fixtures.

The reference exercises these only against the real datasets
(``evaluate.py:127-210``); no data ships with either repo, so these tests
build tiny fake triplet trees and run the loops end to end with a cheap
``infer`` stand-in (average of the two inputs).
"""

import numpy as np
import pytest
import imageio.v2 as imageio
import jax.numpy as jnp

from videoframeinterpolation_tpu.eval.benchmarks import (
    _fix_snu_prefix,
    validate_snu,
    validate_ucf101,
)


def _write_png(path, rng, hw=(32, 48)):
    img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
    imageio.imwrite(str(path), img)
    return img


def _avg_infer(x0, x1, t):
    return (x0 + x1) / 2.0


def test_validate_ucf101_fixture(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "ucf"
    gts = []
    for name in ("0", "1", "2"):
        d = root / name
        d.mkdir(parents=True)
        _write_png(d / "frame_00.png", rng)
        _write_png(d / "frame_02.png", rng)
        gts.append(_write_png(d / "frame_01_gt.png", rng))
    res = validate_ucf101(_avg_infer, root=str(root))
    assert "val/ucf101_psnr" in res
    assert np.isfinite(res["val/ucf101_psnr"])
    assert 3.0 < res["val/ucf101_psnr"] < 30.0  # random imgs: low but finite


def test_validate_ucf101_identical_frames(tmp_path):
    # Identical x0 == x1 == gt: avg prediction is exact. PSNR is +inf by
    # construction (-10*log10(0)) — same semantics as the reference's
    # ``calculate_psnr`` (``evaluate.py:83-85``); the loop must not crash.
    root = tmp_path / "ucf"
    d = root / "0"
    d.mkdir(parents=True)
    img = np.full((32, 48, 3), 128, np.uint8)
    for n in ("frame_00.png", "frame_02.png", "frame_01_gt.png"):
        imageio.imwrite(str(d / n), img)
    res = validate_ucf101(_avg_infer, root=str(root))
    assert res["val/ucf101_psnr"] == np.inf


def test_validate_snu_fixture(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "snu"
    seq = root / "test" / "seq_a"
    seq.mkdir(parents=True)
    # Odd size exercises the InputPadder path (divisor=16).
    paths = []
    for n in ("a.png", "b.png", "c.png"):
        _write_png(seq / n, rng, hw=(30, 44))
        paths.append(str(seq / n))
    for level in ("test-easy.txt", "test-medium.txt", "test-hard.txt",
                  "test-extreme.txt"):
        with open(root / level, "w") as f:
            f.write(" ".join([paths[0], paths[1], paths[2]]) + "\n")
    res = validate_snu(_avg_infer, root=str(root))
    for level in ("test-easy", "test-medium", "test-hard", "test-extreme"):
        key = f"val/snu_{level}_psnr"
        assert key in res and np.isfinite(res[key])


def test_snu_prefix_remap_is_anchored():
    # Leading "data/" component remaps to "datasets/".
    assert (_fix_snu_prefix("data/SNU-FILM/test/x/0.png")
            == "datasets/SNU-FILM/test/x/0.png")
    # A sequence directory containing "data" is left intact (the
    # reference's blanket str.replace would mangle it).
    p = "datasets/SNU-FILM/test/GOPRO_data_01/0001.png"
    assert _fix_snu_prefix(p) == p
    p2 = "/abs/tmp/mydata/seq/0.png"
    assert _fix_snu_prefix(p2) == p2


def test_snu_padder_roundtrip_shapes(tmp_path):
    # The padded prediction must unpad back to the original odd size.
    calls = {}

    def probe_infer(x0, x1, t):
        calls["padded_shape"] = x0.shape
        return (x0 + x1) / 2.0

    rng = np.random.default_rng(2)
    root = tmp_path / "snu"
    seq = root / "test" / "s"
    seq.mkdir(parents=True)
    ps = []
    for n in ("a.png", "b.png", "c.png"):
        _write_png(seq / n, rng, hw=(33, 47))
        ps.append(str(seq / n))
    for level in ("test-easy.txt", "test-medium.txt", "test-hard.txt",
                  "test-extreme.txt"):
        with open(root / level, "w") as f:
            f.write(" ".join(ps) + "\n")
    res = validate_snu(probe_infer, root=str(root))
    assert calls["padded_shape"][1] % 16 == 0
    assert calls["padded_shape"][2] % 16 == 0
    assert np.isfinite(res["val/snu_test-easy_psnr"])

"""Training image observability: the 10-panel predicted-flow-pyramid strip
(reference ``models/DAT.py:40-72``) must be rendered beside the pseudo-GT."""

import numpy as np

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.data.synthetic import SyntheticMotion
from videoframeinterpolation_tpu.train.trainer import Trainer


def _tiny_cfg(tmp_path, model_name="DATwConstantnCv1"):
    return Config(
        exp_name="obs", log_dir=str(tmp_path / "exp"),
        model_name=model_name, nf=16, enc_res_blocks=1, dec_res_blocks=1,
        compute_dtype="float32", data_name="SyntheticMotion",
        crop_h=32, crop_w=32, num_workers=0, val_datasets=(),
    )


def _batch(hw=(32, 32), B=2):
    ds = SyntheticMotion(crop_hw=hw, seed=0, num_items=B)
    items = [ds[i] for i in range(B)]
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def test_flow_pyramid_panel(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    trainer = Trainer(cfg)
    batch = _batch()
    trainer.logger.total_steps = 7
    trainer._log_images(batch)

    img_dir = tmp_path / "exp" / "images"
    pred = img_dir / "pred_0000007.png"
    flow = img_dir / "flow_0000007.png"
    assert pred.exists() and flow.exists()

    import imageio.v2 as imageio

    pred_img = imageio.imread(pred)
    flow_img = imageio.imread(flow)
    H, W = 32, 32
    # [avg | pred | gt | err]
    assert pred_img.shape == (H, 4 * W, 3)
    # [ft0_4 ft0_3 ft0_2 ft0_1 | gt_ft0 gt_ft1 | ft1_1 ft1_2 ft1_3 ft1_4]
    assert flow_img.shape == (H, 10 * W, 3)
    # Panels are not all identical (the pyramid carries signal).
    cols = [flow_img[:, i * W:(i + 1) * W] for i in range(10)]
    assert any(not np.array_equal(cols[0], c) for c in cols[1:])


def test_flow_panel_gt_only_without_intermediates(tmp_path):
    # Models whose train forward returns no flow pyramid still log the
    # pseudo-GT pair.
    cfg = _tiny_cfg(tmp_path, model_name="IFRNet")
    trainer = Trainer(cfg)
    batch = _batch()
    trainer.logger.total_steps = 3
    trainer._log_images(batch)
    import imageio.v2 as imageio

    flow = tmp_path / "exp" / "images" / "flow_0000003.png"
    assert flow.exists()
    img = imageio.imread(flow)
    assert img.shape[1] in (2 * 32, 10 * 32)

"""Checkpoint interop CLI: move trained weights between this framework
and the PyTorch reference stack, in BOTH directions.

The library mappings live in ``videoframeinterpolation_tpu/interop/``
(``torch_weights.py`` import, ``torch_export.py`` export, both
round-trip-locked in ``tests/test_torch_export.py``); this CLI makes
them a user-facing workflow, completing the "same checkpoints" story
(BASELINE.md): a reference user can bring their ``.pth`` files here, and
a TPU-trained model can be evaluated by the reference's
``evaluate.py:213-246`` (which does ``torch.load(path)['model']``).

  # TPU-trained checkpoint -> reference-loadable .pth
  python convert_ckpt.py to-torch --config configs/DAT.yaml \
      --ckpt exps/my_exp/checkpoints/best_vimeo90k --out dat_tpu.pth

  # reference .pth -> an exps/<name> Orbax checkpoint evaluate.py can use
  python convert_ckpt.py from-torch --config configs/DAT.yaml \
      --pth /path/to/reference.pth --exp_name imported

Supported architectures: ``IFRNet`` and the exact-parity flagship
``DATwConstantnCv1`` (no shared offsets, reference sample counts),
matching the interop library's scope. Flagship offset-unit semantics:
importing forces ``dat_ref_offset_units: true`` on the created exp (the
proven-parity evaluation path for reference weights), and exporting
REQUIRES a checkpoint trained with ``dat_ref_offset_units: true`` — the
reference sampler rescales offset+flow jointly on x
(``modules/deformable_attn.py:94-95``), so symmetric-units weights have
no faithful torch representation.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def _build(cfg):
    import jax
    import jax.numpy as jnp

    from videoframeinterpolation_tpu.models import create_model

    model = create_model(cfg)
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), dummy, dummy, t)
    return model, params


def _check_exportable(cfg, *, to_torch: bool) -> str:
    """Return the interop family key, raising for unsupported variants."""
    # Exact registry names only: substring routing sent DCNDATv1/MADATv1/
    # DATwConstantnCTPU configs into the flagship mapper, which then died
    # deep inside the param tree with an opaque KeyError instead of the
    # clean rejection below (ADVICE r4).
    name = cfg.model_name
    if name == "IFRNet":
        return "ifrnet"
    if name in ("DATwConstantnCv1", "DATwConstantnC"):
        if getattr(cfg, "shared_offsets", False):
            raise SystemExit(
                "shared_offsets variants (configs/DAT_fast*.yaml) "
                "have no reference counterpart module — only the "
                "exact-parity flagship (configs/DAT.yaml) is convertible.")
        if tuple(getattr(cfg, "dat_samples", (8, 16, 32))) != (8, 16, 32):
            raise SystemExit(
                "non-reference dat_samples have no torch-side "
                "architecture; conversion requires configs/DAT.yaml "
                "semantics.")
        if to_torch and not getattr(cfg, "dat_ref_offset_units", False):
            # The reference sampler scales the WHOLE sampling displacement
            # (offset residual + flow) by [0.25, 1] on x
            # (modules/deformable_attn.py:94-95), so a checkpoint trained
            # in this framework's symmetric pixel units would need
            # res'_x = 4*res_x + 3*flow_x — input-dependent, not a weight
            # transform. Only ref-units-trained checkpoints export
            # faithfully.
            raise SystemExit(
                "to-torch: this checkpoint was trained with symmetric "
                "offset units (dat_ref_offset_units: false), which the "
                "reference's asymmetric sampler cannot reproduce — the "
                "unit change rescales offset+flow jointly, so no weight "
                "transform exists. Train with dat_ref_offset_units: true "
                "for a torch-exportable flagship.")
        return "dat"
    raise SystemExit(f"no converter for model {name!r} "
                     "(supported: IFRNet, DATwConstantnCv1)")


def cmd_to_torch(args) -> None:
    import numpy as np
    import torch

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.interop.torch_export import (
        dat_state_dict_from_params, ifrnet_state_dict_from_params,
    )
    from videoframeinterpolation_tpu.train.checkpoint import (
        restore_teacher_params,
    )

    cfg = Config.from_yaml(args.config, exp_name="convert")
    family = _check_exportable(cfg, to_torch=True)
    model, template = _build(cfg)
    params = restore_teacher_params(args.ckpt, model, template, cfg)
    inner = params["params"] if "params" in params else params
    export = (ifrnet_state_dict_from_params if family == "ifrnet"
              else dat_state_dict_from_params)
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export(inner).items()}
    # The reference loads checkpoints as torch.load(path)['model']
    # (evaluate.py:239, Trainer.py:27).
    torch.save({"model": sd}, args.out)
    n = sum(int(v.numel()) for v in sd.values())
    print(f"wrote {args.out}: {len(sd)} tensors, {n} params "
          f"(reference-loadable, key 'model')")


def cmd_from_torch(args) -> None:
    import torch

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.interop.torch_weights import (
        dat_params_from_state_dict, ifrnet_params_from_state_dict,
    )
    from videoframeinterpolation_tpu.train.checkpoint import CheckpointManager
    from videoframeinterpolation_tpu.train.state import create_train_state

    cfg = Config.from_yaml(args.config, exp_name=args.exp_name)
    family = _check_exportable(cfg, to_torch=False)
    if family == "dat" and not cfg.dat_ref_offset_units:
        # Reference weights carry the reference's offset semantics; the
        # imported exp must evaluate with the quirk emulated (this is the
        # proven-parity path, tests/test_reference_parity.py:289-320).
        print("note: forcing dat_ref_offset_units: true on the imported "
              "exp (reference sampler semantics)")
        cfg.dat_ref_offset_units = True
    raw = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = raw.get("model", raw) if isinstance(raw, dict) else raw
    sd = {k: v.numpy() for k, v in sd.items()}
    model, _ = _build(cfg)
    mapper = (ifrnet_params_from_state_dict if family == "ifrnet"
              else dat_params_from_state_dict)
    params = {"params": mapper(sd)}
    state = create_train_state(model, params, cfg)
    ckpt = CheckpointManager(cfg.log_dir)
    ckpt.save(args.name, state, epoch=0, best_psnr=-1.0)
    # evaluate.py --exp_name reads the exp-dir config WITHOUT an exp_name
    # override, so it must carry exp_name/log_dir (same as trainer.py:164).
    cfg.save_yaml(Path(cfg.log_dir) / "config.yaml")
    n = sum(int(x.size) for x in
            __import__("jax").tree_util.tree_leaves(state.params))
    print(f"imported {args.pth} -> {cfg.log_dir}/checkpoints/{args.name} "
          f"({n} params); evaluate with: python evaluate.py "
          f"--exp_name {args.exp_name} --ckpt {args.name}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    tt = sub.add_parser("to-torch",
                        help="flax/Orbax checkpoint -> reference .pth")
    tt.add_argument("--config", required=True,
                    help="YAML describing the checkpoint's architecture")
    tt.add_argument("--ckpt", required=True,
                    help="Orbax checkpoint dir (exps/<exp>/checkpoints/"
                         "<name>) or a flax-msgpack TrainState file")
    tt.add_argument("--out", required=True, help="output .pth path")

    ft = sub.add_parser("from-torch",
                        help="reference .pth -> exps/<name> Orbax checkpoint")
    ft.add_argument("--config", required=True)
    ft.add_argument("--pth", required=True)
    ft.add_argument("--exp_name", required=True)
    ft.add_argument("--name", default="imported",
                    help="checkpoint name inside the exp (default: imported)")

    args = ap.parse_args()

    from videoframeinterpolation_tpu.utils.platform import honor_env_platform

    honor_env_platform()

    if args.cmd == "to-torch":
        cmd_to_torch(args)
    else:
        cmd_from_torch(args)


if __name__ == "__main__":
    main()

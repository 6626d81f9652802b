"""convert_ckpt.py CLI: to-torch / from-torch round trip, as a user runs it.

The library mappings are parity-locked in test_torch_export.py; this
covers the CLI wiring (checkpoint loading in both formats, the
reference's ``{'model': sd}`` wrapper from ``evaluate.py:239``, Orbax
exp creation usable by ``evaluate.py --exp_name``)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
CFG = REPO / "configs" / "archive" / "IFRNet.yaml"


def _run(args, cwd, env):
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1200,
    )


def test_convert_cli_round_trip(tmp_path):
    import jax
    import jax.numpy as jnp
    import flax.serialization as fser

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model
    from videoframeinterpolation_tpu.train.checkpoint import CheckpointManager
    from videoframeinterpolation_tpu.train.state import create_train_state

    cfg = Config.from_yaml(CFG, exp_name="convert_src")
    model = create_model(cfg)
    d = jnp.zeros((1, 32, 32, 3), jnp.float32)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(3), d, d, t)
    state = create_train_state(model, params, cfg)
    src = tmp_path / "src.ckpt"
    src.write_bytes(fser.to_bytes(jax.device_get(state)))

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    pth = tmp_path / "exported.pth"
    r = _run([str(REPO / "convert_ckpt.py"), "to-torch",
              "--config", str(CFG), "--ckpt", str(src), "--out", str(pth)],
             tmp_path, env)
    assert r.returncode == 0, r.stderr
    assert pth.exists()

    # the reference stack loads checkpoints as torch.load(path)['model']
    import torch

    sd = torch.load(pth, map_location="cpu", weights_only=True)["model"]
    n = sum(int(v.numel()) for v in sd.values())
    n_flax = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    assert n == n_flax

    r = _run([str(REPO / "convert_ckpt.py"), "from-torch",
              "--config", str(CFG), "--pth", str(pth),
              "--exp_name", "imported_exp"], tmp_path, env)
    assert r.returncode == 0, r.stderr

    imported = CheckpointManager(str(tmp_path / "exps" / "imported_exp"))
    assert imported.exists("imported")
    back, _ = imported.restore(
        "imported", create_train_state(model, params, cfg))
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_convert_cli_rejects_fast_variant(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = _run([str(REPO / "convert_ckpt.py"), "to-torch",
              "--config", str(REPO / "configs" / "DAT_fast.yaml"),
              "--ckpt", "nonexistent.ckpt", "--out", str(tmp_path / "x.pth")],
             tmp_path, env)
    assert r.returncode != 0
    assert "no reference counterpart" in (r.stdout + r.stderr)


_TINY_DAT = """
model_name: DATwConstantnCv1
nf: 24
enc_res_blocks: 1
dec_res_blocks: 1
mlp_ratio: 2
compute_dtype: float32
"""


def test_convert_cli_dat_offset_unit_semantics(tmp_path):
    """Flagship rules: symmetric-units export is rejected (no faithful
    weight transform exists — the reference rescales offset+flow jointly),
    ref-units checkpoints round-trip, and importing forces
    dat_ref_offset_units on the created exp."""
    import jax
    import jax.numpy as jnp
    import flax.serialization as fser

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model
    from videoframeinterpolation_tpu.train.state import create_train_state

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    sym = tmp_path / "dat_sym.yaml"
    sym.write_text(_TINY_DAT)
    ref = tmp_path / "dat_ref.yaml"
    ref.write_text(_TINY_DAT + "dat_ref_offset_units: true\n")

    cfg = Config.from_yaml(ref, exp_name="src")
    model = create_model(cfg)
    d = jnp.zeros((1, 32, 32, 3), jnp.float32)
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(11), d, d, t)
    state = create_train_state(model, params, cfg)
    src = tmp_path / "dat.ckpt"
    src.write_bytes(fser.to_bytes(jax.device_get(state)))

    # symmetric units: rejected with the explanation
    r = _run([str(REPO / "convert_ckpt.py"), "to-torch", "--config",
              str(sym), "--ckpt", str(src), "--out", str(tmp_path / "x.pth")],
             tmp_path, env)
    assert r.returncode != 0
    assert "dat_ref_offset_units" in (r.stdout + r.stderr)

    # ref units: exports, and importing forces the flag + round-trips
    pth = tmp_path / "dat.pth"
    r = _run([str(REPO / "convert_ckpt.py"), "to-torch", "--config",
              str(ref), "--ckpt", str(src), "--out", str(pth)],
             tmp_path, env)
    assert r.returncode == 0, r.stderr

    r = _run([str(REPO / "convert_ckpt.py"), "from-torch", "--config",
              str(sym), "--pth", str(pth), "--exp_name", "dat_imported"],
             tmp_path, env)
    assert r.returncode == 0, r.stderr
    assert "forcing dat_ref_offset_units" in r.stdout

    exp_cfg = Config.from_yaml(tmp_path / "exps" / "dat_imported"
                               / "config.yaml")
    assert exp_cfg.dat_ref_offset_units is True

    from videoframeinterpolation_tpu.train.checkpoint import CheckpointManager

    back, _ = CheckpointManager(
        str(tmp_path / "exps" / "dat_imported")).restore(
        "imported", create_train_state(model, params, cfg))
    import numpy as np  # noqa: F811

    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

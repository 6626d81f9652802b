"""Config parity: every reference YAML loads unchanged, builds its model,
and runs a tiny forward (VERDICT round-1 item #5).

The reference's DotMap config silently swallows unknown/absent keys
(``utils/env.py:20-29``); this framework's typed Config accepts exactly the
reference's key set (plus TPU-specific additions) and raises on anything
else — so loading the reference's own YAML files verbatim is the parity
oracle.
"""

from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model

REFERENCE_CONFIGS = sorted(
    Path("/root/reference/configs").glob("**/*.yaml")
) if Path("/root/reference/configs").is_dir() else []

REPO_CONFIGS = sorted(
    (Path(__file__).resolve().parents[1] / "configs").glob("**/*.yaml")
)


def _tiny_forward(cfg: Config):
    """Build the configured model small and run one 32x32 forward."""
    cfg.compute_dtype = "float32"
    # Shrink capacity only (never architecture-defining fields like
    # model_name / mlp_ratio / channels / depths).
    cfg.nf = 16
    cfg.enc_res_blocks = 1
    cfg.dec_res_blocks = 1
    model = create_model(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0, x1, t)
    pred = model.apply(params, x0, x1, t)
    assert pred.shape == (1, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(pred)))


@pytest.mark.skipif(not REFERENCE_CONFIGS,
                    reason="reference checkout not present")
@pytest.mark.parametrize(
    "path", REFERENCE_CONFIGS, ids=[p.stem for p in REFERENCE_CONFIGS]
)
def test_reference_config_loads_and_builds(path):
    cfg = Config.from_yaml(path)
    assert cfg.model_name
    _tiny_forward(cfg)


@pytest.mark.parametrize(
    "path", REPO_CONFIGS,
    ids=[str(p.relative_to(p.parents[1])) for p in REPO_CONFIGS],
)
def test_repo_config_loads_and_builds(path):
    if path.name == "DAT_fast_distill.yaml":
        # The distillation recipe intentionally ships without a default
        # teacher (ADVICE r4: a Vimeo90K student must not silently
        # distill toward the out-of-domain synthetic-data study teacher)
        # and must fail loudly until one is set.
        with pytest.raises(ValueError, match="teacher_ckpt"):
            Config.from_yaml(path)
        cfg = Config.from_yaml(path, teacher_ckpt="exps/teacher/ckpt")
    else:
        cfg = Config.from_yaml(path)
    _tiny_forward(cfg)


def test_scalar_val_datasets_normalized():
    cfg = Config(val_datasets="vimeo90k")
    assert cfg.val_datasets == ("vimeo90k",)


def test_unknown_key_still_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model_name: IFRNet\nnot_a_real_key: 1\n")
    with pytest.raises(ValueError, match="not_a_real_key"):
        Config.from_yaml(p)


def test_grad_clip_is_honored():
    """grad_clip must actually bound the update (the reference accepts the
    key but never applies it — Trainer.py:67-78 has no clipping)."""
    import optax
    from videoframeinterpolation_tpu.train.state import create_optimizer

    cfg = Config(grad_clip=1e-6, start_lr=1.0, end_lr=1.0,
                 weight_decay=0.0, warmup_steps=1, last_lr_decay_iter=10)
    tx = create_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 100.0)}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # Global norm of the clipped gradient is 1e-6; the Adam-normalized
    # update stays finite and small-ish rather than exploding.
    assert float(jnp.max(jnp.abs(updates["w"]))) < 10.0
    cfg2 = Config(grad_clip=None)
    tx2 = create_optimizer(cfg2)
    assert tx2 is not None

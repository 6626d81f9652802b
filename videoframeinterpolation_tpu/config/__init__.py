"""Typed experiment configuration (replaces the reference's untyped DotMap).

The reference loads YAML into a DotMap where absent keys silently return
falsy values (``utils/env.py:20-29``) — a footgun this rebuild replaces with
an explicit dataclass: unknown YAML keys raise, absent keys get defaults.
Field names match ``configs/DAT.yaml`` so reference configs load unchanged.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional, Sequence, Union

import yaml


@dataclasses.dataclass
class Config:
    # Experiment identity
    exp_name: str = "debug"
    log_dir: str = ""          # derived: exps/<exp_name> when empty
    seed: int = 42

    # Model
    model_name: str = "DATwConstantnCv1"
    nf: int = 72
    enc_res_blocks: int = 5
    dec_res_blocks: int = 10
    mlp_ratio: float = 2.0

    # Losses
    distill_lambda: Optional[float] = 0.01
    geo_lambda: float = 0.01
    # Teacher distillation (train-time only; no reference equivalent —
    # the measured recovery recipe for the fast flagship's horizon gap,
    # BENCH_NOTES.md round 4). ``teacher_ckpt`` is either an Orbax
    # checkpoint directory written by ``train/checkpoint.py`` or a flax
    # msgpack TrainState file written by ``tools/quality/head_to_head.py``.
    # ``teacher_overrides`` are config-field overrides applied on top of
    # THIS config to build the teacher's architecture (e.g.
    # ``{dat_samples: [8, 16, 8]}``); the student's own recipe gains
    # ``distill_teacher_w * Charbonnier(pred_student - pred_teacher)``.
    teacher_ckpt: Optional[str] = None
    teacher_overrides: Optional[dict] = None
    distill_teacher_w: float = 0.5

    # Model-family specific (archive models)
    m2m_branch: int = 5                      # M2M flow hypotheses
    channels: Sequence[int] = (16, 32, 64)   # MADAT pyramid
    depths: Sequence[int] = (3, 3, 3)        # MADAT pyramid depths
    load_gmflow: Optional[str] = None        # GMFlow warm-start ckpt (GMM2M)
    # DAT-TPU window geometry (no reference equivalent)
    radii: Sequence[int] = (2, 2, 3)         # per level (lv3, lv2, lv1)
    offset_sets: Optional[Sequence] = None   # dilated taps per level
    n_offset_groups: Sequence[int] = (0, 0, 0)  # learned per-group offsets
    # Flagship exact-parity windowed sampling fast path (ops/windowed.py).
    window_sampling: bool = False
    # Flagship TPU-fast variant: one offset set shared by all channel
    # groups per DAT level (8x fewer sampler gather rows at lv1). True
    # shares every level; a (lv3, lv2, lv1) triple selects per level.
    # Trains from scratch; quality head-to-head in BENCH_NOTES.md.
    shared_offsets: Union[bool, Sequence[bool]] = False
    # Flagship deformable samples per DAT level (lv3, lv2, lv1). The
    # reference hardcodes (8, 16, 32); fewer lv1 samples cut the hot
    # sampler's gather rows linearly (quality study in BENCH_NOTES.md).
    dat_samples: Sequence[int] = (8, 16, 32)
    # Flagship query-grid stride per DAT level (lv3, lv2, lv1). A strided
    # level runs its whole block on an (H/s, W/s) query grid and returns
    # through a learned upsample (+ zero-init detail conv): s**2 fewer
    # gather rows and FLOPs at that level. Only lv1 may be strided.
    dat_attn_stride: Sequence[int] = (1, 1, 1)
    # Flagship movement-extractor width per DAT level (lv3, lv2, lv1);
    # None = reference parity (nf at every level). The movement convs are
    # the largest lv1 cost slice after the sample ladder.
    dat_movement_nf: Optional[Sequence[int]] = None
    # Reference-exact sampling units for the DAT sampler: the reference
    # normalizes x-displacements by (W-1)*2 instead of (W-1)/2 when
    # sampling (modules/deformable_attn.py:94-95), so its effective x
    # offsets are value/4 pixels. Off (default) = symmetric pixel units
    # (REBUILD_NOTES.md); on = emulate the quirk so reference-trained
    # checkpoints imported via interop.torch_weights compute the identical
    # function (tests/test_reference_parity.py).
    dat_ref_offset_units: bool = False

    # Data
    data_name: str = "Vimeo90KwFlow"
    root: str = "datasets/vimeo_triplet"
    flow_dir: str = "flow"
    distill_bwd: bool = True
    crop_h: int = 256
    crop_w: int = 256

    # Training
    num_epochs: int = 2000
    batch_size: int = 12            # per host process
    num_workers: int = 8

    # Optimizer (warmup 2k steps, cosine start_lr -> end_lr at decay-end)
    start_lr: float = 2.0e-4
    end_lr: float = 1.0e-5
    weight_decay: float = 1.0e-4
    last_lr_decay_iter: int = 600_000
    warmup_steps: int = 2000   # reference hardcodes 2000 (utils/scheduler.py)
    # Keys present in reference archive configs. The reference's DotMap
    # swallows them without effect (``grad_clip``/``resume_epoch``/
    # ``last_lr_decay_epoch`` are never read by its Trainer or scheduler);
    # accepted here so those YAMLs load unchanged — and ``grad_clip``,
    # plainly intended, is actually honored by the optimizer.
    grad_clip: Optional[float] = None
    resume_epoch: int = 0
    last_lr_decay_epoch: Optional[int] = None

    # Validation
    valid_freq_epoch: int = 1
    val_datasets: Sequence[str] = ("vimeo90k",)
    save_best_benchmark: str = "vimeo90k"
    # Benchmark roots. The reference hardcodes these inside its eval loops
    # (``evaluate.py:127-210``: "datasets/UCF-101/test", "data/SNU-FILM");
    # configurable here so in-training validation and the eval CLI can be
    # pointed anywhere.
    ucf101_root: str = "datasets/UCF-101/test"
    snu_root: str = "datasets/SNU-FILM"

    # Logging / checkpoint cadence
    img_summary_freq: int = 1000
    metric_summary_freq: int = 100
    save_latest_freq: int = 2000
    save_every_freq_epoch: int = 25

    # TPU-specific (no reference equivalent)
    compute_dtype: str = "bfloat16"   # "bfloat16" | "float32"
    data_axis: str = "data"           # mesh axis name for data parallelism
    resume: Optional[str] = None

    def __post_init__(self):
        if not self.log_dir:
            self.log_dir = str(Path("exps") / self.exp_name)
        if isinstance(self.val_datasets, str):
            # Some reference archive configs use a scalar ("val_datasets:
            # vimeo90k", configs/archive/DCNDAT.yaml) instead of a list.
            self.val_datasets = (self.val_datasets,)
        if isinstance(self.val_datasets, list):
            self.val_datasets = tuple(self.val_datasets)
        if isinstance(self.channels, list):
            self.channels = tuple(self.channels)
        if isinstance(self.depths, list):
            self.depths = tuple(self.depths)
        if self.teacher_overrides and not self.teacher_ckpt:
            # A distillation config loaded without its teacher must fail
            # loudly, not silently train the plain recipe (ADVICE r4: the
            # shipped default also risked distilling toward an
            # out-of-domain teacher — the recipe now requires an explicit
            # teacher_ckpt; see configs/DAT_fast_distill.yaml).
            raise ValueError(
                "teacher_overrides is set but teacher_ckpt is not: this "
                "config declares teacher distillation, so train the "
                "teacher first (two-stage recipe in "
                "configs/DAT_fast_distill.yaml) and set teacher_ckpt, or "
                "remove teacher_overrides for a plain run")

    @classmethod
    def from_yaml(cls, path: str | Path, **overrides: Any) -> "Config":
        with open(path, "r") as f:
            raw = yaml.safe_load(f) or {}
        raw.update(overrides)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
        return cls(**raw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save_yaml(self, path: str | Path) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f, sort_keys=False)

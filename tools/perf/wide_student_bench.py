"""Latency of the wide-channel TPU student candidates (VERDICT r4 #6).

The measured conv-ceiling roofline (tools/perf/README.md) says nf=72
convs cap at ~33% of MXU peak (output-lane fill) while 128-channel convs
reach ~82% — so a wider student buys ~2.5x FLOPs per ms. This probe
prices the candidates' inference before/while the quality arms train:

  python tools/perf/wide_student_bench.py            # 448x256 b1 ladder
  python tools/perf/wide_student_bench.py --hd       # + 720p full-frame

Emits one JSON line per config; the quality side runs as distilled
head_to_head arms (--nf 96 --dec_res_blocks 5 --teacher_nf 72).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from videoframeinterpolation_tpu.utils.platform import honor_env_platform

honor_env_platform()

REPO = Path(__file__).resolve().parents[2]

CANDIDATES = (
    {"nf": 72, "dec_res_blocks": 10},           # shipped student (control)
    {"nf": 96, "dec_res_blocks": 5},            # wide-student quality arm
    {"nf": 96, "dec_res_blocks": 10},           # full-depth wide
    {"nf": 128, "dec_res_blocks": 3},           # max-lane-fill point
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hd", action="store_true", help="add 720p full-frame")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from bench import measure_model

    from videoframeinterpolation_tpu.config import Config

    sizes = [(256, 448)] + ([(720, 1280)] if args.hd else [])
    for kw in CANDIDATES:
        cfg = Config(model_name="DATwConstantnCv1",
                     compute_dtype="bfloat16", shared_offsets=True,
                     dat_samples=(8, 8, 2), **kw)
        for (H, W) in sizes:
            sec, n_params = measure_model(cfg, H, W)
            rec = {**kw, "size": f"{W}x{H}", "params": n_params,
                   "ms_per_frame": round(sec * 1e3, 3),
                   "pairs_per_s_per_chip": round(1.0 / sec, 1)}
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

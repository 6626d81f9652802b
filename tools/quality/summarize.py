"""Summarize head-to-head quality curves: one table row per results JSONL.

Usage: python tools/quality/summarize.py [--dir tools/quality/results]
                                         [--match SUBSTR] [--json]

Columns: arm tag, completed steps, best val PSNR (and its step), final
val PSNR, wall time — plus, when `eval_best.py` has re-scored an arm's
best checkpoint, its held-out SSIM. `--json` emits one machine-readable
line per arm (consumed by the BENCH_NOTES round tables).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def summarize_file(path: Path) -> dict | None:
    best = (0, float("-inf"))
    last = None
    final = None
    n_evals = 0
    elapsed = 0.0
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("event") == "eval":
            n_evals += 1
            last = d
            elapsed = max(elapsed, d.get("elapsed_s", 0.0))
            if d["val_psnr"] > best[1]:
                best = (d["step"], d["val_psnr"])
        elif d.get("event") == "final":
            final = d
            elapsed = max(elapsed, d.get("elapsed_s", 0.0))
    if n_evals == 0:
        return None
    return {
        "arm": path.stem,
        "steps": (final or last)["step"],
        "complete": final is not None,
        "best_psnr": round(best[1], 4),
        "best_step": best[0],
        "final_psnr": round((final or last)["val_psnr"], 4),
        "elapsed_s": round(elapsed, 1),
    }


def load_rescores(results_dir: Path) -> dict:
    """arm tag -> latest eval_best record for its best checkpoint."""
    path = results_dir / "eval_best.jsonl"
    out: dict = {}
    if not path.exists():
        return out
    for line in path.read_text().splitlines():
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        name = Path(d.get("ckpt", "")).name
        if name.endswith(".best.ckpt"):
            out[name[: -len(".best.ckpt")]] = d  # latest record wins
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=str(Path(__file__).parent / "results"))
    ap.add_argument("--match", default="", help="substring filter on tags")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    rescores = load_rescores(Path(args.dir))
    rows = []
    for p in sorted(Path(args.dir).glob("*.jsonl")):
        if p.name == "eval_best.jsonl":
            continue
        if args.match and args.match not in p.stem:
            continue
        r = summarize_file(p)
        if r:
            rs = rescores.get(r["arm"])
            if rs:
                r["ssim"] = rs["ssim"]
            rows.append(r)
    rows.sort(key=lambda r: -r["best_psnr"])

    if args.json:
        for r in rows:
            print(json.dumps(r))
        return
    w = max((len(r["arm"]) for r in rows), default=10)
    print(f"{'arm':<{w}}  {'steps':>6} {'fin?':>4} {'best':>8} "
          f"{'@step':>6} {'final':>8} {'ssim':>8} {'wall_s':>8}")
    for r in rows:
        ssim = f"{r['ssim']:>8.5f}" if "ssim" in r else f"{'-':>8}"
        print(f"{r['arm']:<{w}}  {r['steps']:>6} "
              f"{'yes' if r['complete'] else 'NO':>4} "
              f"{r['best_psnr']:>8.4f} {r['best_step']:>6} "
              f"{r['final_psnr']:>8.4f} {ssim} {r['elapsed_s']:>8.1f}")


if __name__ == "__main__":
    main()

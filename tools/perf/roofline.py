"""Per-op-class roofline: attribute a model's TPU time to hardware limits.

VERDICT round-3 #3: "MFU is low even where the model is compute-bound —
no per-op roofline says whether the ceiling is memory, dispatch, or
layout." This tool answers that without a profiler trace (the tunneled
backend exposes none): it parses the model's post-optimization HLO (CPU
backend — op mix is backend-portable to first order), buckets every op
into {convolution, gather, elementwise/other}, and prices each bucket
with MEASURED v5e ceilings:

- convolutions: FLOPs / conv_ceiling(Cin, Cout). Ceilings come from
  ``conv_channel_sweep.py`` (JSON in ``results/conv_ceilings.json``) —
  the measured ns/row facts in README.md showed 3x3@72ch = ~60 TF/s but
  thin channels fill the 128x128 MXU poorly, so per-channel calibration
  is the difference between "mystery 3-4x gap" and an explained number.
- gathers: rows x 13 ns (measured, README.md), rows = out_elems /
  slice-row width.
- everything else: HBM bytes / measured copy bandwidth (defaults to the
  819 GB/s v5e nominal until ``membw_probe.py`` writes a measured one).

Usage (CPU, no TPU needed):
  python tools/perf/roofline.py IFRNet 256 448 [--batch 1]
      [--measured_ms 2.48] [--dtype bfloat16]

Prints a per-bucket table + one JSON line. With --measured_ms it also
attributes the measured-vs-predicted residual (dispatch/serialization).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

RESULTS = Path(__file__).parent / "results"

# Measured v5e facts (tools/perf/README.md); overridable by probe JSONs.
GATHER_NS_PER_ROW = 13.0
DEFAULT_HBM_GBPS = 819.0       # v5e nominal; membw_probe.py refines
DEFAULT_CONV_TFLOPS = 60.0     # 3x3 @ 72ch measured

_SHAPE_RE = re.compile(r"(bf16|f16|f32|f64|s32|u32|s8|u8|pred)\[([0-9,]*)\]")


def _shapes(s: str):
    out = []
    for m in _SHAPE_RE.finditer(s):
        dims = [int(d) for d in m.group(2).split(",") if d]
        out.append((m.group(1), dims))
    return out


_DT_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s32": 4, "u32": 4,
             "s8": 1, "u8": 1, "pred": 1}


def _elems(dims):
    n = 1
    for d in dims:
        n *= d
    return n


def conv_ceiling(ci: int, co: int, ceilings: dict) -> float:
    """TF/s ceiling for a conv with Cin=ci, Cout=co.

    With a measured table (``conv_ceilings.json``: {channels: tflops}),
    interpolate on min(ci, co). Without one, scale the 72-ch measurement
    by MXU fill: a 128x128 systolic array runs at ~min(c,128)/128 of peak
    on the contraction dim."""
    c = min(ci, co)
    if ceilings:
        xs = sorted(int(k) for k in ceilings)
        if c <= xs[0]:
            return float(ceilings[str(xs[0])])
        if c >= xs[-1]:
            return float(ceilings[str(xs[-1])])
        for lo, hi in zip(xs, xs[1:]):
            if lo <= c <= hi:
                f = (c - lo) / (hi - lo)
                return float((1 - f) * ceilings[str(lo)]
                             + f * ceilings[str(hi)])
    fill72 = min(72, 128) / 128.0
    peak = DEFAULT_CONV_TFLOPS / fill72
    return peak * min(c, 128) / 128.0


def analyze(config_arg: str, H: int, W: int, B: int, dtype: str) -> dict:
    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models import create_model

    if config_arg.endswith((".yaml", ".yml")):
        cfg = Config.from_yaml(Path(config_arg))
        cfg.compute_dtype = dtype
    else:
        cfg = Config(model_name=config_arg, compute_dtype=dtype)
    model = create_model(cfg)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    x1 = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    t = jnp.full((B, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0[:1, :32, :32],
                        x1[:1, :32, :32], t[:1])

    compiled = jax.jit(
        lambda p, a, b, tt: model.apply(p, a, b, tt)
    ).lower(params, x0, x1, t).compile()
    hlo = compiled.as_text()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]

    ceil_path = RESULTS / "conv_ceilings.json"
    ceilings = (json.loads(ceil_path.read_text())
                if ceil_path.exists() else {})
    bw_path = RESULTS / "membw.json"
    hbm_gbps = (json.loads(bw_path.read_text())["gbps"]
                if bw_path.exists() else DEFAULT_HBM_GBPS)
    # Gather pricing is index-coherence-dependent (warp_gather_probe.py):
    # smooth flow-warp gathers stream far cheaper than deformable
    # (random-neighborhood) fetches. Without per-op index provenance in
    # HLO, price the bucket as a [all-smooth, all-deformable] range.
    rates_path = RESULTS / "gather_rates.json"
    if rates_path.exists():
        rates = json.loads(rates_path.read_text())
        gather_ns_lo = float(rates.get("smooth_ns_per_row",
                                       GATHER_NS_PER_ROW))
        gather_ns_hi = float(rates.get("deform_ns_per_row",
                                       GATHER_NS_PER_ROW))
    else:
        gather_ns_lo = gather_ns_hi = GATHER_NS_PER_ROW

    buckets = defaultdict(lambda: dict(flops=0.0, bytes=0.0, ms=0.0, n=0))
    conv_by_ch = defaultdict(lambda: dict(flops=0.0, ms=0.0, n=0))

    # Pass 1: symbol table (operands print without inline shapes).
    symtab: dict = {}
    def_re = re.compile(r"\s*(?:ROOT )?(%?[\w.\-]+) = (.+)$")
    for ln in hlo.splitlines():
        m = def_re.match(ln)
        if not m:
            continue
        shapes = _shapes(m.group(2))
        if shapes:
            symtab[m.group(1).lstrip("%")] = shapes[0]

    def _operand_shapes(body: str):
        inner = body[body.index("(") + 1:]
        names = re.findall(r"%?([\w.\-]+)", inner.split(")")[0])
        return [symtab[n] for n in names if n in symtab]

    # Pass 2: price convolution / dot / gather individually.
    for ln in hlo.splitlines():
        m = def_re.match(ln)
        if not m:
            continue
        body = m.group(2)
        op_m = re.match(r"(?:\([^=]*\)|\S+)\s+([\w\-]+)\(", body)
        if not op_m:
            continue
        op = op_m.group(1)
        shapes = _shapes(body)
        if not shapes:
            continue
        out_dt, out_dims = shapes[0]
        out_bytes = _elems(out_dims) * _DT_BYTES[out_dt]

        if op == "convolution":
            opnds = _operand_shapes(body)
            if len(opnds) < 2:
                continue
            (_, lhs_dims), (_, rhs_dims) = opnds[0], opnds[1]
            lab = re.search(r"dim_labels=\S+_(\w+)->", body)
            if not lab or len(rhs_dims) != 4:
                continue
            kspec = lab.group(1)  # e.g. "01io"
            ki, ko = kspec.index("i"), kspec.index("o")
            spatial = [d for n, d in enumerate(rhs_dims)
                       if n not in (ki, ko)]
            ci, co = rhs_dims[ki], rhs_dims[ko]
            feat_m = re.search(r"feature_group_count=(\d+)", body)
            g = int(feat_m.group(1)) if feat_m else 1
            flops = 2.0 * _elems(out_dims) * _elems(spatial) * ci
            key = min(ci * g, co)
            ceil = conv_ceiling(ci * g, co, ceilings)
            ms = flops / (ceil * 1e12) * 1e3
            bts = out_bytes + sum(
                _elems(d) * _DT_BYTES[dt_] for dt_, d in opnds[:2])
            ms = max(ms, bts / (hbm_gbps * 1e9) * 1e3)
            b = buckets["convolution"]
            b["flops"] += flops
            b["bytes"] += bts
            b["ms"] += ms
            b["n"] += 1
            cb = conv_by_ch[key]
            cb["flops"] += flops
            cb["ms"] += ms
            cb["n"] += 1
        elif op == "gather":
            sl = re.search(r"slice_sizes=\{([0-9,]*)\}", body)
            width = 1
            if sl:
                width = _elems([int(d) for d in sl.group(1).split(",") if d])
            rows = _elems(out_dims) / max(width, 1)
            ms = rows * gather_ns_hi * 1e-6
            b = buckets["gather"]
            b["bytes"] += out_bytes
            b["ms"] += ms
            b["ms_lo"] = b.get("ms_lo", 0.0) + rows * gather_ns_lo * 1e-6
            b["n"] += 1
        elif op == "dot":
            opnds = _operand_shapes(body)
            if len(opnds) < 2:
                continue
            _, r_d = opnds[1]
            k = r_d[-2] if len(r_d) >= 2 else 1
            flops = 2.0 * _elems(out_dims) * k
            ms = flops / (64e12) * 1e3  # measured raw matmul 64 TF/s
            b = buckets["matmul"]
            b["flops"] += flops
            b["bytes"] += out_bytes
            b["ms"] += ms
            b["n"] += 1

    # Elementwise/other: total bytes accessed (XLA cost analysis) minus
    # what the priced buckets already account for — no double counting of
    # fusion internals.
    total_bytes = float(ca.get("bytes accessed", 0.0))
    priced = sum(b["bytes"] for b in buckets.values())
    other = max(0.0, total_bytes - priced)
    buckets["elementwise/other"]["bytes"] = other
    buckets["elementwise/other"]["ms"] = other / (hbm_gbps * 1e9) * 1e3
    buckets["elementwise/other"]["n"] = -1  # aggregated, not per-op

    total_ms = sum(b["ms"] for b in buckets.values())
    g = buckets.get("gather", {})
    total_ms_lo = total_ms - g.get("ms", 0.0) + g.get("ms_lo", g.get("ms", 0.0))
    total_flops = sum(b["flops"] for b in buckets.values())
    return {
        "buckets": {k: dict(v) for k, v in buckets.items()},
        "conv_by_channels": {str(k): dict(v)
                             for k, v in sorted(conv_by_ch.items())},
        "predicted_ms": total_ms,
        "predicted_ms_lo": total_ms_lo,
        "gather_ns_per_row": [gather_ns_lo, gather_ns_hi],
        "total_flops": total_flops,
        "hbm_gbps": hbm_gbps,
        "conv_ceilings_measured": bool(ceilings),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("H", type=int)
    ap.add_argument("W", type=int)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--measured_ms", type=float, default=None)
    args = ap.parse_args()

    r = analyze(args.config, args.H, args.W, args.batch, args.dtype)
    print(f"\nroofline {args.config} {args.H}x{args.W} b{args.batch} "
          f"({args.dtype}; HBM {r['hbm_gbps']:.0f} GB/s, conv ceilings "
          f"{'measured' if r['conv_ceilings_measured'] else 'modeled'})")
    print(f"{'bucket':<20}{'n':>6}{'GFLOP':>10}{'MB':>10}{'pred ms':>10}")
    for k, b in sorted(r["buckets"].items(), key=lambda kv: -kv[1]["ms"]):
        print(f"{k:<20}{b['n']:>6}{b['flops']/1e9:>10.2f}"
              f"{b['bytes']/1e6:>10.1f}{b['ms']:>10.3f}")
    lo, hi = r["predicted_ms_lo"], r["predicted_ms"]
    rng_s = (f"{lo:.3f}..{hi:.3f}" if abs(hi - lo) > 1e-6 else f"{hi:.3f}")
    print(f"{'TOTAL pred':<36}{r['total_flops']/1e9:>10.2f}"
          f"{rng_s:>20}")
    print("\nconv by min-channel:")
    for k, b in r["conv_by_channels"].items():
        print(f"  ch={k:<5} n={b['n']:<4} {b['flops']/1e9:8.2f} GFLOP "
              f"{b['ms']:8.3f} ms  ({b['flops']/1e9/max(b['ms'],1e-9):6.1f} "
              f"GF/ms ceiling)")
    if args.measured_ms is not None:
        resid = args.measured_ms - r["predicted_ms"]
        print(f"\nmeasured {args.measured_ms:.3f} ms; predicted "
              f"{rng_s} ms; residual vs hi {resid:+.3f} ms "
              f"(dispatch/serialization/layout)")
        r["measured_ms"] = args.measured_ms
        r["residual_ms"] = resid
    print(json.dumps({k: v for k, v in r.items()
                      if k not in ("buckets", "conv_by_channels")}))


if __name__ == "__main__":
    main()

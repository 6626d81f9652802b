"""Probe v2: which property of the model's lv1 gather costs ~25 ns/row at HD?

Probe v1 (banded_gather_probe.py) showed a *shared-index* ``jnp.take`` of
coherent rows from a 266 MB table already runs at 8.6 ns/row, and banding
is a measured NEGATIVE (23.9 ns/row — window copies dominate). But the
model path (`ops/interp.py:_gather_hw`) is ``take_along_axis`` with
per-batch indices, B-chunked to one batch entry and row-chunked at 262144
when the table exceeds 16 MB. This isolates, at 720p lv1 scale
(table (2, 231k, 288) bf16 = 266 MB):

  mono     : take_along_axis, per-batch coherent idx, ONE call
  chunk    : + row chunks of 262144 (current code's CHUNK)
  bloop    : + B-loop of single-entry calls (current code's B_CHUNK=1)
  s2mono   : TWO displaced coherent fields per query (the shipped lv1=2
             samples), sample-major row order, one call (2R rows)
  s2query  : same rows, query-major (interleaved) order
  s2bloop  : sample-major + the current code's B/row chunking

Usage (ONE TPU process at a time):
  python tools/perf/banded_gather_probe2.py [--hw 360x641] [--ch 288]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from bench import time_loop

ap = argparse.ArgumentParser()
ap.add_argument("--hw", default="360x641")
ap.add_argument("--ch", type=int, default=288)
ap.add_argument("--flow", type=int, default=24)
ap.add_argument("--batch", type=int, default=2)
args = ap.parse_args()

H, W = (int(v) for v in args.hw.split("x"))
C, B = args.ch, args.batch
R = H * W
dt = jnp.bfloat16
CHUNK = 262144

rng = np.random.default_rng(0)
table = jnp.asarray(rng.standard_normal((B, R, C)).astype(np.float32), dt)

yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")


def field(phase):
    fy = (args.flow * np.sin(2 * np.pi * xx / W * 3 + phase) *
          np.cos(2 * np.pi * yy / H * 2)).astype(np.int64)
    fx = (args.flow * np.cos(2 * np.pi * xx / W * 2 + phase)).astype(np.int64)
    ty = np.clip(yy + fy, 0, H - 1)
    tx = np.clip(xx + fx, 0, W - 1)
    return (ty * W + tx).astype(np.int32).reshape(-1)  # (R,)


# Per-batch independent coherent fields.
idx1 = jnp.asarray(np.stack([field(0.3 * b) for b in range(B)]))  # (B, R)
# Two sample fields per query (lv1=2): sample-major (B, 2R) and
# query-major interleave.
f0 = np.stack([field(0.3 * b) for b in range(B)])
f1 = np.stack([field(0.3 * b + 1.7) for b in range(B)])
idx_sm = jnp.asarray(np.concatenate([f0, f1], axis=1))             # (B, 2R)
idx_qm = jnp.asarray(
    np.stack([f0, f1], axis=2).reshape(B, 2 * R))                  # (B, 2R)

print(f"table {B}x{R}x{C} bf16 = {B * R * C * 2 / 1e6:.0f} MB, "
      f"flow +-{args.flow} rows", flush=True)


def ta(t, i):
    return jnp.take_along_axis(t, i[..., None], axis=1)


def rowchunks(t, i):
    n = i.shape[1]
    return jnp.concatenate(
        [ta(t, i[:, k * CHUNK:(k + 1) * CHUNK])
         for k in range(-(-n // CHUNK))], axis=1)


def bloop(t, i):
    return jnp.concatenate(
        [rowchunks(t[b:b + 1], i[b:b + 1]) for b in range(B)], axis=0)


def fold(out):  # reduce (B, k*R, C) -> (B, R, C) so the table chains
    k = out.shape[1] // R
    return out.reshape(B, k, R, C).sum(axis=1) if k > 1 else out


VARIANTS = [
    ("mono", ta, idx1, 1),
    ("chunk", rowchunks, idx1, 1),
    ("bloop", bloop, idx1, 1),
    ("s2mono", ta, idx_sm, 2),
    ("s2query", ta, idx_qm, 2),
    ("s2bloop", bloop, idx_sm, 2),
]

for name, fn, iarg, k in VARIANTS:
    sec = time_loop(lambda i, t: fold(fn(t, i)), (iarg, table), n_hi=9)
    ns_row = sec / (B * R * k) * 1e9
    print(f"{name:8s}: {sec * 1e3:7.3f} ms = {ns_row:5.1f} ns/row "
          f"({B * R * k} rows)", flush=True)

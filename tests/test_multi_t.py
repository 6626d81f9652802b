"""Staged encode/decode API + multi-instant inference (models/base.py).

The flagship's encoder pyramid is t-invariant; ``multi_t_apply`` runs it
once per pair and decodes every interpolation instant inside one traced
program (``interpolate.py --mode direct``). No reference counterpart —
the reference's eval scripts are t=0.5-only."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videoframeinterpolation_tpu.models import DATwConstantnC, multi_t_apply

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def tiny():
    model = DATwConstantnC(nf=24, enc_res_blocks=1, dec_res_blocks=1,
                           mlp_ratio=2.0)
    x0 = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    x1 = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    t = jnp.full((1, 1, 1, 1), 0.5, jnp.float32)
    params = model.init(jax.random.key(0), x0, x1, t)
    return model, params, x0, x1, t


def test_staged_equals_call(tiny):
    """encode -> decode through apply(method=...) is exactly __call__."""
    model, params, x0, x1, t = tiny
    y = model.apply(params, x0, x1, t)
    feats, mean = model.apply(params, x0, x1, method="encode")
    y2 = model.apply(params, feats, mean, t, method="decode")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_multi_t_matches_per_t(tiny):
    model, params, x0, x1, t = tiny
    ts = (0.25, 0.5, 0.75)
    preds = multi_t_apply(model, params, x0, x1, ts)
    assert preds.shape == (3, 1, 32, 32, 3)
    for k, tv in enumerate(ts):
        y = model.apply(params, x0, x1,
                        jnp.full((1, 1, 1, 1), tv, jnp.float32))
        np.testing.assert_array_equal(np.asarray(preds[k]), np.asarray(y))


def test_encoder_shared_in_compiled_program(tiny):
    """The 3-instant program must contain the encoder ONCE: its conv count
    grows by strictly less than 3x the single-instant program's."""
    model, params, x0, x1, _ = tiny

    def count_convs(ts):
        f = jax.jit(lambda p, a, b: multi_t_apply(model, p, a, b, ts))
        txt = f.lower(params, x0, x1).compile().as_text()
        return len(re.findall(r" convolution\(", txt))

    c1 = count_convs((0.5,))
    c3 = count_convs((0.25, 0.5, 0.75))
    # decode triples; the encoder's convs must not. (Tiny config: the
    # encoder is 10 convs, so full sharing means c3 == 3*c1 - 20.)
    assert c3 <= 3 * c1 - 10, (c1, c3)


def test_train_path_unchanged(tiny):
    """__call__(train=True) still returns (pred, intermediates)."""
    model, params, x0, x1, t = tiny
    pred, inter = model.apply(params, x0, x1, t, train=True)
    assert pred.shape == (1, 32, 32, 3)
    assert set(inter) == {"pred_ft0", "pred_ft1"}


def test_tiled_multi_t_matches_full_local():
    """For a purely local multi-instant 'model', the tile sweep must equal
    the full-frame program up to blend arithmetic, per instant."""
    from videoframeinterpolation_tpu.parallel.spatial import (
        make_tiled_multi_t,
    )

    ts = (0.25, 0.5, 0.75)

    def multi_apply(params, a, b):
        return jnp.stack([(1.0 - tv) * a + tv * b for tv in ts])

    x0 = jnp.asarray(RNG.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32))
    x1 = jnp.asarray(RNG.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32))
    tiled = make_tiled_multi_t(multi_apply, tile_hw=(48, 48), overlap=16,
                               tile_batch=4)
    out = np.asarray(tiled({}, x0, x1))
    full = np.asarray(multi_apply({}, x0, x1))
    assert out.shape == (3, 1, 96, 128, 3)
    np.testing.assert_allclose(out, full, rtol=1e-5, atol=1e-5)


def test_flow_aware_multi_t_routes_and_scales(tiny):
    """Small frames route to the exact full-frame multi-t program; large
    frames tile; the seam-safety scale covers instants near 0/1."""
    from videoframeinterpolation_tpu.parallel.spatial import (
        make_flow_aware_multi_t,
    )

    model, params, x0, x1, _ = tiny
    ts = (0.25, 0.75)

    def multi_apply(p, a, b):
        return multi_t_apply(model, p, a, b, ts)

    def train_fn(p, a, b, tt, train):
        return model.apply(p, a, b, tt, train=train)

    infer = make_flow_aware_multi_t(
        multi_apply, params, 128, ts, train_apply_fn=train_fn,
        tile_batch=2, verbose=False)
    # 32x32 frame <= tile: byte-identical to the jitted full program.
    np.testing.assert_array_equal(
        np.asarray(infer(x0, x1)),
        np.asarray(jax.jit(multi_apply)(params, x0, x1)))

    # 96x160 frame > tile: the planner builds a tiled multi-t sweep
    # (tile 128 leaves room for the init-weights plan, so this exercises
    # the make_tiled_multi_t cache path, not the full-frame fallback).
    X0 = jnp.asarray(RNG.uniform(0, 1, (1, 96, 160, 3)).astype(np.float32))
    out = np.asarray(infer(X0, X0))
    assert out.shape == (2, 1, 96, 160, 3)
    assert np.isfinite(out).all()


def test_mesh_sharded_multi_t_sweep_matches_sequential():
    """Multi-instant tiles sharded over the 8-device mesh blend to the
    same frames as the single-device lax.map sweep."""
    from videoframeinterpolation_tpu.parallel import create_mesh
    from videoframeinterpolation_tpu.parallel.spatial import (
        make_tiled_multi_t,
    )

    ts = (1.0 / 3.0, 2.0 / 3.0)

    def multi_apply(params, a, b):
        return jnp.stack([(1.0 - tv) * a + tv * b for tv in ts])

    x0 = jnp.asarray(RNG.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32))
    x1 = jnp.asarray(RNG.uniform(0, 1, (1, 96, 128, 3)).astype(np.float32))
    mesh = create_mesh()
    assert mesh.size == 8  # conftest forces 8 virtual CPU devices
    seq = make_tiled_multi_t(multi_apply, tile_hw=(48, 48), overlap=16,
                             tile_batch=4)({}, x0, x1)
    par = make_tiled_multi_t(multi_apply, tile_hw=(48, 48), overlap=16,
                             mesh=mesh)({}, x0, x1)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               rtol=1e-5, atol=1e-5)


def test_flow_aware_multi_t_unsafe_plan_full():
    """Motion too large for the tile routes to FULL-FRAME, loudly — the
    multi-instant path inherits the round-3 failure-mode policy."""
    import warnings as _w

    from videoframeinterpolation_tpu.parallel.spatial import (
        make_flow_aware_multi_t,
    )

    ts = (0.5,)

    def multi_apply(params, a, b):
        return jnp.stack([0.5 * (a + b)])

    big = jnp.asarray(RNG.uniform(0, 1, (1, 96, 192, 3)).astype(np.float32))
    full = np.asarray(jax.jit(multi_apply)(None, big, big))

    infer = make_flow_aware_multi_t(
        multi_apply, None, 64, ts, default_flow_px=200.0, verbose=False)
    with pytest.warns(UserWarning, match="FULL-FRAME"):
        out = np.asarray(infer(big, big))
    np.testing.assert_array_equal(out, full)

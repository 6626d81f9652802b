"""Training-function parity against the PyTorch reference (VERDICT r3 #2).

Forward parity (``test_reference_parity.py``) proves inference equality;
these tests extend the proof through the TRAINING function — loss
components and parameter gradients — so a census-padding,
robust-weight-detach, or distillation-resize mismatch cannot pass the
forward tests yet train to a different model:

- loss primitives: value AND input-gradient parity vs
  ``/root/reference/modules/losses.py:11-125`` (incl. the detach
  semantics: Ternary detaches the GT census, get_robust_weight detaches
  the predicted flow);
- the flagship loss stack (``models/DAT.py:132-153``): values end-to-end
  on transferred weights, gradients w.r.t. every loss input;
- IFRNet end-to-end: parameter gradients of the full training step vs
  torch CPU autograd (``models/archive/IFRNet.py:235-258``), compared
  through the same layout converter as the weights (pure permutations,
  so it maps gradients exactly).
"""

import types
import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from videoframeinterpolation_tpu.interop import (  # noqa: E402
    dat_params_from_state_dict,
    ifrnet_params_from_state_dict,
)
from videoframeinterpolation_tpu.interop.reference_loader import (  # noqa: E402
    load_reference,
)

warnings.filterwarnings("ignore", category=FutureWarning)
warnings.filterwarnings("ignore", category=SyntaxWarning)

REF = load_reference()
pytestmark = pytest.mark.skipif(
    REF is None, reason="reference repo or torch unavailable"
)

RNG = np.random.default_rng(23)


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.ascontiguousarray(x_nchw.transpose(0, 2, 3, 1)))


def _nchw_grad(g_nhwc) -> np.ndarray:
    return np.asarray(g_nhwc).transpose(0, 3, 1, 2)


def _t(x, grad=False):
    v = torch.from_numpy(x.copy())
    v.requires_grad_(grad)
    return v


def _close(a, b, rtol=1e-4, atol=None, label=""):
    a, b = np.asarray(a), np.asarray(b)
    if atol is None:
        atol = 1e-6 + 1e-4 * float(np.abs(b).max())
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=label)


# --------------------------------------------------------- loss primitives


def test_charbonnier_l1_value_and_grad():
    from videoframeinterpolation_tpu.ops.losses import charbonnier_l1

    losses_t = REF.module("modules.losses")
    diff = RNG.standard_normal((2, 3, 16, 20)).astype(np.float32)

    dt = _t(diff, grad=True)
    lt = losses_t.Charbonnier_L1()(dt)
    lt.backward()

    lj, gj = jax.value_and_grad(
        lambda d: charbonnier_l1(d))(_nhwc(diff))
    _close(float(lj), float(lt.detach()), label="charbonnier value")
    _close(_nchw_grad(gj), dt.grad.numpy(), label="charbonnier grad")

    # masked variant
    mask = (RNG.random((2, 1, 16, 20)) > 0.3).astype(np.float32)
    dt = _t(diff, grad=True)
    lt = losses_t.Charbonnier_L1()(dt, _t(mask))
    lt.backward()
    lj, gj = jax.value_and_grad(
        lambda d: charbonnier_l1(d, _nhwc(mask)))(_nhwc(diff))
    _close(float(lj), float(lt.detach()), label="masked charbonnier value")
    _close(_nchw_grad(gj), dt.grad.numpy(), label="masked charbonnier grad")


def test_ternary_census_value_and_grad():
    """Census loss: the GT-side census is DETACHED (modules/losses.py:43)
    — the gradient must flow only through the prediction."""
    from videoframeinterpolation_tpu.ops.losses import ternary_loss

    losses_t = REF.module("modules.losses")
    x = RNG.random((2, 3, 18, 22)).astype(np.float32)
    y = RNG.random((2, 3, 18, 22)).astype(np.float32)

    xt, yt = _t(x, grad=True), _t(y, grad=True)
    lt = losses_t.Ternary()(xt, yt)
    lt.backward()
    assert yt.grad is None or float(yt.grad.abs().max()) == 0.0

    lj, gj = jax.value_and_grad(
        lambda a: ternary_loss(a, _nhwc(y)))(_nhwc(x))
    _close(float(lj), float(lt.detach()), label="census value")
    _close(_nchw_grad(gj), xt.grad.numpy(), rtol=1e-3, label="census grad")

    gy = jax.grad(lambda b: ternary_loss(_nhwc(x), b))(_nhwc(y))
    assert float(jnp.abs(gy).max()) == 0.0, "GT census side must be detached"


def test_geometry_value_and_grad():
    """Geometry loss: BOTH sides live (feature-vs-feature)."""
    from videoframeinterpolation_tpu.ops.losses import geometry_loss

    losses_t = REF.module("modules.losses")
    x = RNG.standard_normal((2, 8, 12, 14)).astype(np.float32)
    y = RNG.standard_normal((2, 8, 12, 14)).astype(np.float32)

    xt, yt = _t(x, grad=True), _t(y, grad=True)
    lt = losses_t.Geometry()(xt, yt)
    lt.backward()

    (lj, (gx, gy)) = jax.value_and_grad(
        lambda a, b: geometry_loss(a, b), argnums=(0, 1)
    )(_nhwc(x), _nhwc(y))
    _close(float(lj), float(lt.detach()), label="geometry value")
    _close(_nchw_grad(gx), xt.grad.numpy(), rtol=1e-3, label="geometry gx")
    _close(_nchw_grad(gy), yt.grad.numpy(), rtol=1e-3, label="geometry gy")


def test_robust_weighted_ada_value_and_grad():
    """Charbonnier_Ada with get_robust_weight: the weight is computed on a
    DETACHED prediction (modules/losses.py:12), so the flow that sizes the
    weight receives ZERO gradient while the distilled flow's gradient
    matches torch exactly — the silent-divergence case VERDICT #2 names."""
    from videoframeinterpolation_tpu.ops.losses import (
        charbonnier_ada, get_robust_weight,
    )

    losses_t = REF.module("modules.losses")
    B, H, W = 2, 10, 12
    anchor = RNG.standard_normal((B, 2, H, W)).astype(np.float32)
    pred = RNG.standard_normal((B, 2, H, W)).astype(np.float32)
    gt = RNG.standard_normal((B, 2, H, W)).astype(np.float32)

    at, pt = _t(anchor, grad=True), _t(pred, grad=True)
    wt = losses_t.get_robust_weight(at, _t(gt), beta=0.3)
    lt = losses_t.Charbonnier_Ada()(pt - _t(gt), weight=wt)
    lt.backward()
    assert at.grad is None or float(at.grad.abs().max()) == 0.0

    def loss_j(a, p):
        w = get_robust_weight(a, _nhwc(gt), beta=0.3)
        return charbonnier_ada(p - _nhwc(gt), w)

    (lj, (ga, gp)) = jax.value_and_grad(loss_j, argnums=(0, 1))(
        _nhwc(anchor), _nhwc(pred))
    _close(float(lj), float(lt.detach()), label="ada value")
    assert float(jnp.abs(ga).max()) == 0.0, "robust-weight flow must detach"
    _close(_nchw_grad(gp), pt.grad.numpy(), rtol=1e-3, label="ada grad")


# ------------------------------------------------- flagship loss stack


def _dat_stack_torch(losses_t, img_pred, xt, p0, p1, ft0, ft1, lam):
    """The reference's exact loss formula (models/DAT.py:132-153), composed
    from the reference's own loss modules (used as an oracle)."""
    l1 = losses_t.Charbonnier_L1()(img_pred - xt)
    census = losses_t.Ternary()(img_pred, xt)
    w0 = losses_t.get_robust_weight(p0[0], ft0, beta=0.3)
    w1 = losses_t.get_robust_weight(p1[0], ft1, beta=0.3)
    rb = losses_t.Charbonnier_Ada()
    distill = lam * (
        rb(p0[1] - ft0, weight=w0) + rb(p1[1] - ft1, weight=w1)
        + rb(p0[2] - ft0, weight=w0) + rb(p1[2] - ft1, weight=w1)
        + rb(p0[3] - ft0, weight=w0) + rb(p1[3] - ft1, weight=w1)
    )
    return l1, census, distill


def test_dat_loss_stack_grad_parity():
    """d(total)/d(img_pred, pyramid flows): torch autograd vs jax.grad.

    Checks in particular that p*[0] (the finest flow, used only inside the
    detached robust weight) receives exactly zero gradient on both sides."""
    from videoframeinterpolation_tpu.models.dat import dat_loss

    losses_t = REF.module("modules.losses")
    B, H, W = 2, 16, 20
    lam = 0.01
    img_pred = RNG.random((B, 3, H, W)).astype(np.float32)
    xt = RNG.random((B, 3, H, W)).astype(np.float32)
    p0 = [RNG.standard_normal((B, 2, H, W)).astype(np.float32)
          for _ in range(4)]
    p1 = [RNG.standard_normal((B, 2, H, W)).astype(np.float32)
          for _ in range(4)]
    ft0 = RNG.standard_normal((B, 2, H, W)).astype(np.float32)
    ft1 = RNG.standard_normal((B, 2, H, W)).astype(np.float32)

    ip_t = _t(img_pred, grad=True)
    p0_t = [_t(p, grad=True) for p in p0]
    p1_t = [_t(p, grad=True) for p in p1]
    l1_t, cen_t, dis_t = _dat_stack_torch(
        losses_t, ip_t, _t(xt), p0_t, p1_t, _t(ft0), _t(ft1), lam)
    total_t = l1_t + cen_t + dis_t
    total_t.backward()

    def loss_j(ip, p0j, p1j):
        inter = {"pred_ft0": list(p0j), "pred_ft1": list(p1j)}
        batch = {"xt": _nhwc(xt), "f0x": _nhwc(ft0), "f1x": _nhwc(ft1)}
        return dat_loss(ip, inter, batch, distill_lambda=lam)

    (total_j, log_j), grads = jax.value_and_grad(
        loss_j, argnums=(0, 1, 2), has_aux=True
    )(_nhwc(img_pred), tuple(_nhwc(p) for p in p0),
      tuple(_nhwc(p) for p in p1))
    g_ip, g_p0, g_p1 = grads

    _close(float(log_j["l1_loss"]), float(l1_t.detach()), label="l1")
    _close(float(log_j["census_loss"]), float(cen_t.detach()),
           label="census")
    _close(float(log_j["flow_loss"]), float(dis_t.detach()),
           label="distill")
    _close(float(total_j), float(total_t.detach()), label="total")

    _close(_nchw_grad(g_ip), ip_t.grad.numpy(), rtol=1e-3,
           label="d/d img_pred")
    # finest flow: only the detached robust weight sees it -> zero grad
    assert float(jnp.abs(g_p0[0]).max()) == 0.0
    assert p0_t[0].grad is None or float(p0_t[0].grad.abs().max()) == 0.0
    for k in (1, 2, 3):
        _close(_nchw_grad(g_p0[k]), p0_t[k].grad.numpy(), rtol=1e-3,
               label=f"d/d pred_ft0[{k}]")
        _close(_nchw_grad(g_p1[k]), p1_t[k].grad.numpy(), rtol=1e-3,
               label=f"d/d pred_ft1[{k}]")


def test_flagship_loss_components_end_to_end(monkeypatch):
    """Full training forward on transferred weights: our train=True apply +
    dat_loss equals the reference net.forward's loss components
    (models/DAT.py:121-155) — proving the train-mode intermediates
    (pyramid scaling/resize) match, not just inference."""
    from test_reference_parity import _patch_deform_conv2d, _perturb

    args = types.SimpleNamespace(
        nf=24, enc_res_blocks=1, dec_res_blocks=1, mlp_ratio=2,
        distill_lambda=0.01,
    )
    ref_dat = REF.dat()
    _patch_deform_conv2d(monkeypatch)
    net = _perturb(ref_dat.DATwConstantnCv1(args).train(), scale=0.02)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    params = dat_params_from_state_dict(sd)

    B, H, W = 1, 48, 64
    x0 = RNG.random((B, 3, H, W), np.float32)
    x1 = RNG.random((B, 3, H, W), np.float32)
    xt = RNG.random((B, 3, H, W), np.float32)
    t = np.full((B, 1, 1, 1), 0.5, np.float32)
    f0x = (3.0 * RNG.standard_normal((B, 2, H, W))).astype(np.float32)
    f1x = (3.0 * RNG.standard_normal((B, 2, H, W))).astype(np.float32)

    with torch.no_grad():
        total_t, log_t = net({
            "x0": torch.from_numpy(x0), "x1": torch.from_numpy(x1),
            "xt": torch.from_numpy(xt), "t": torch.from_numpy(t),
            "f0x": torch.from_numpy(f0x), "f1x": torch.from_numpy(f1x),
        })

    from videoframeinterpolation_tpu.models import DATwConstantnC
    from videoframeinterpolation_tpu.models.dat import dat_loss

    model = DATwConstantnC(nf=24, enc_res_blocks=1, dec_res_blocks=1,
                           mlp_ratio=2.0, ref_offset_units=True)
    pred, inter = model.apply(
        {"params": params}, _nhwc(x0), _nhwc(x1),
        jnp.asarray(t), train=True)
    total_j, log_j = dat_loss(
        pred, inter,
        {"xt": _nhwc(xt), "f0x": _nhwc(f0x), "f1x": _nhwc(f1x)},
        distill_lambda=0.01)

    for key in ("l1_loss", "census_loss"):
        _close(float(log_j[key]), log_t[key], rtol=1e-3, atol=1e-5,
               label=key)
    _close(float(log_j["flow_loss"]), log_t["flow_loss"], rtol=1e-3,
           atol=1e-5, label="flow_loss")
    _close(float(total_j), float(total_t), rtol=1e-3, atol=1e-5,
           label="total_loss")


# ---------------------------------------------------- IFRNet end-to-end


def test_ifrnet_train_step_gradient_parity(monkeypatch):
    """Parameter gradients of the FULL IFRNet training function vs torch
    CPU autograd (models/archive/IFRNet.py:191-258): same transferred
    weights, same batch -> d(total_loss)/d(theta) equal leaf-by-leaf
    through the layout converter (pure permutations).

    Reference bug worked around (REBUILD_NOTES): ``ResBlock.forward``
    (models/archive/IFRNet.py:44-51) assigns conv2/conv4 outputs INTO a
    slice of their own input (``out[:, -side:] = conv2(out[:, -side:])``)
    — modern torch autograd rejects this (saved conv input overwritten,
    version-counter error), so the reference's archive IFRNet cannot
    backprop at all on this stack. The test monkeypatches a mathematically
    identical out-of-place forward (concat instead of slice-assign; conv2
    still reads the pre-assign slice, exactly as in-place did)."""
    ifr = REF.archive_ifrnet()

    def resblock_forward(self, x):
        s = self.side_channels
        out = self.conv1(x)
        out = torch.cat([out[:, :-s], self.conv2(out[:, -s:])], dim=1)
        out = self.conv3(out)
        out = torch.cat([out[:, :-s], self.conv4(out[:, -s:])], dim=1)
        out = x + self.conv5(out)
        if not self.act_at_last:
            out = self.prelu(out)
        return out

    monkeypatch.setattr(ifr.ResBlock, "forward", resblock_forward)

    net = ifr.IFRNet(types.SimpleNamespace()).train()
    torch.manual_seed(3)
    with torch.no_grad():
        for p in net.parameters():
            p.add_(0.05 * torch.randn_like(p))
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = ifrnet_params_from_state_dict(sd)

    # Local deterministic rng: the module-level RNG's state depends on
    # which tests ran before this one, and the flip-noise floor below is
    # input-dependent — the test must see the same draw in every run
    # configuration (-k selection, -x ordering, full file).
    rng = np.random.default_rng(1701)
    B, H, W = 2, 48, 64
    x0 = rng.random((B, 3, H, W), np.float32)
    x1 = rng.random((B, 3, H, W), np.float32)
    xt = rng.random((B, 3, H, W), np.float32)
    t = np.full((B, 1), 0.5, np.float32)
    f01 = (2.0 * rng.standard_normal((B, 2, H, W))).astype(np.float32)
    f10 = (2.0 * rng.standard_normal((B, 2, H, W))).astype(np.float32)

    def torch_grads(tdtype):
        """total, log, layout-converted grads at dtype ``tdtype`` (the f32
        pass checks loss VALUES at the production dtype; the f64 pass is
        the round-off-free gradient ground truth)."""
        net.to(tdtype).zero_grad()
        for m in net.modules():
            # Ternary/Geometry census kernels are plain attributes, not
            # registered buffers (modules/losses.py:24,57), so .to()
            # misses them.
            if torch.is_tensor(getattr(m, "w", None)):
                m.w = m.w.to(tdtype)
        _, total, log = net({
            "x0": torch.from_numpy(x0 * 255.0).to(tdtype),
            "x1": torch.from_numpy(x1 * 255.0).to(tdtype),
            "xt": torch.from_numpy(xt * 255.0).to(tdtype),
            "t": torch.from_numpy(t).to(tdtype),
            "f01": torch.from_numpy(f01).to(tdtype),
            "f10": torch.from_numpy(f10).to(tdtype),
        })
        total.backward()
        grad_sd = {k: p.grad.detach().to(torch.float64).numpy()
                   for k, p in net.named_parameters()}
        return total, log, ifrnet_params_from_state_dict(grad_sd)

    total_t, log_t, _ = torch_grads(torch.float32)
    total_t = total_t.detach()
    _, _, grads_t64 = torch_grads(torch.float64)

    from videoframeinterpolation_tpu.config import Config
    from videoframeinterpolation_tpu.models.ifrnet import IFRNet
    from videoframeinterpolation_tpu.train import make_loss_fn

    cfg = Config(model_name="IFRNet", compute_dtype="float32",
                 geo_lambda=0.01, distill_lambda=0.01)
    model = IFRNet()
    loss_fn = make_loss_fn(model, cfg)
    batch = {
        "x0": _nhwc(x0), "x1": _nhwc(x1), "xt": _nhwc(xt),
        "t": jnp.asarray(t.reshape(B, 1, 1, 1)),
        "f0x": _nhwc(f01), "f1x": _nhwc(f10),
    }
    (total_j, log_j), grads_j = jax.value_and_grad(
        loss_fn, has_aux=True)({"params": params}, batch)

    _close(float(total_j), float(total_t.detach()), rtol=1e-3, atol=1e-5,
           label="total loss")
    for key in ("l1_loss", "census_loss", "flow_loss", "geometry_loss"):
        if key in log_j:
            _close(float(log_j[key]), log_t[key], rtol=1e-3, atol=1e-5,
                   label=key)

    # Gradients are compared at f64-vs-f64, where parity must be TIGHT.
    # At f32 the comparison is structurally noisy: the loss backprops
    # through bilinear-warp floor() cells on PREDICTED flows, and jax/
    # torch f32 round-off flips different cells (different op order), so
    # jax-f32 grads deviate from the f64 ground truth by an input-
    # dependent 3e-3..5e-3 rel-L2 even when semantics match exactly —
    # indistinguishable from a small real bug. At f64 flips vanish
    # (round-off ~1e-16 never crosses a cell boundary) and any census-
    # padding / detach / resize-gradient mismatch survives undiluted
    # (such bugs measure 1e-2..1 rel-L2). Measured f64-vs-f64 residual on
    # this draw: max 2.5e-5 rel-L2 (a stray f32-rounded constant, e.g.
    # grid coordinates, in one of the stacks) — the 2e-4 bound keeps
    # ~100x discrimination headroom below semantic-bug magnitudes.
    # The jax f64 pass patches the models' hardcoded `jnp.float32` casts
    # (call-time attribute lookups; monkeypatch restores them) and
    # toggles x64 around the trace.
    monkeypatch.setattr(jnp, "float32", jnp.float64)
    try:
        jax.config.update("jax_enable_x64", True)

        def to64(tree):
            return jax.tree_util.tree_map(
                lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree)

        batch64 = to64(batch)
        (total_j64, _), grads_j64 = jax.value_and_grad(
            loss_fn, has_aux=True)({"params": to64(params)}, batch64)
        assert np.asarray(total_j64).dtype == np.float64
    finally:
        jax.config.update("jax_enable_x64", False)

    flat_t64 = jax.tree_util.tree_leaves_with_path(grads_t64)
    flat_j64 = dict(jax.tree_util.tree_leaves_with_path(grads_j64["params"]))
    assert len(flat_t64) == len(flat_j64) and len(flat_t64) > 50
    bad = []
    for path, gt64 in flat_t64:
        gt64 = np.asarray(gt64)
        err = (np.linalg.norm(np.asarray(flat_j64[path], np.float64) - gt64)
               / (np.linalg.norm(gt64) + 1e-300))
        if err > 2e-4:
            bad.append((jax.tree_util.keystr(path), float(err)))
    assert not bad, (
        f"f64 gradient rel-L2 mismatches: "
        f"{sorted(bad, key=lambda kv: -kv[1])[:10]}")

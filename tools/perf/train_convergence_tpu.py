"""Mini-convergence run on the real TPU: overfit the flagship on a fixed
synthetic batch and report loss/PSNR trajectory."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp

from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.parallel import create_mesh, shard_batch
from videoframeinterpolation_tpu.train import create_train_state, make_train_step
from videoframeinterpolation_tpu.eval.metrics import psnr

cfg = Config(model_name="DATwConstantnCv1", nf=32, enc_res_blocks=2,
             dec_res_blocks=2, compute_dtype="bfloat16",
             start_lr=2e-4, end_lr=1e-5, last_lr_decay_iter=600000)
model = create_model(cfg)
mesh = create_mesh()
rng = np.random.default_rng(0)
B, H, W = 4, 96, 96
# A real interpolation task: smooth random images translated by a constant
# shift; xt is the half-shift frame.
base = rng.uniform(0, 1, (B, H + 8, W + 8, 3)).astype(np.float32)
import scipy.ndimage as ndi  # noqa: F401
def blur(a):
    k = np.ones((5, 5, 1)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    return a  # keep simple: raw random is fine for overfit
x0 = base[:, 0:H, 0:W]
x1 = base[:, 4:H+4, 4:W+4]
xt = base[:, 2:H+2, 2:W+2]
batch = {
    "x0": x0, "x1": x1, "xt": xt,
    "t": np.full((B, 1, 1, 1), 0.5, np.float32),
    "f0x": np.full((B, H, W, 2), -2.0/255, np.float32),
    "f1x": np.full((B, H, W, 2), 2.0/255, np.float32),
}
params = model.init(jax.random.key(0), jnp.asarray(x0[:1]),
                    jnp.asarray(x1[:1]), jnp.asarray(batch["t"][:1]),
                    train=True)
state = create_train_state(model, params, cfg)
step_fn = make_train_step(model, cfg, mesh)
infer = jax.jit(lambda p, a, b, t: model.apply(p, a, b, t))

def cur_psnr():
    pred = infer(state.params, jnp.asarray(x0), jnp.asarray(x1),
                 jnp.asarray(batch["t"]))
    return float(psnr(pred, jnp.asarray(xt)))

print("step 0: psnr %.2f dB" % cur_psnr(), flush=True)
sb = shard_batch(batch, mesh)
t0 = time.perf_counter()
for i in range(1, 301):
    state, log = step_fn(state, sb)
    if i % 100 == 0:
        print("step %d: loss %.4f psnr %.2f dB (%.1fs)" % (
            i, float(log["total_loss"]), cur_psnr(),
            time.perf_counter() - t0), flush=True)

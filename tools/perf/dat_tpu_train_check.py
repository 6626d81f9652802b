import sys; sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
import time, numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.parallel import create_mesh, shard_batch
from videoframeinterpolation_tpu.train import create_train_state, make_train_step
from videoframeinterpolation_tpu.eval.metrics import psnr

cfg = Config(model_name="DATwConstantnCTPU", nf=32, enc_res_blocks=2,
             dec_res_blocks=2, compute_dtype="bfloat16")
model = create_model(cfg)
mesh = create_mesh()
rng = np.random.default_rng(0)
B, H, W = 4, 96, 96
base = rng.uniform(0, 1, (B, H + 8, W + 8, 3)).astype(np.float32)
x0, x1, xt = base[:, 0:H, 0:W], base[:, 4:H+4, 4:W+4], base[:, 2:H+2, 2:W+2]
batch = {"x0": x0, "x1": x1, "xt": xt,
         "t": np.full((B,1,1,1),0.5,np.float32),
         "f0x": np.full((B,H,W,2), -2.0/255, np.float32),
         "f1x": np.full((B,H,W,2), 2.0/255, np.float32)}
params = model.init(jax.random.key(0), jnp.asarray(x0[:1]), jnp.asarray(x1[:1]),
                    jnp.asarray(batch["t"][:1]), train=True)
state = create_train_state(model, params, cfg)
step_fn = make_train_step(model, cfg, mesh)
infer = jax.jit(lambda p,a,b,t: model.apply(p,a,b,t))
def cur():
    return float(psnr(infer(state.params, jnp.asarray(x0), jnp.asarray(x1),
                            jnp.asarray(batch["t"])), jnp.asarray(xt)))
print("step 0 psnr %.2f" % cur(), flush=True)
sb = shard_batch(batch, mesh)
for i in range(1, 301):
    state, log = step_fn(state, sb)
    if i % 150 == 0:
        print("step %d loss %.4f psnr %.2f" % (i, float(log["total_loss"]), cur()), flush=True)

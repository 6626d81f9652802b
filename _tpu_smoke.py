"""TPU smoke: a few real train steps of the flagship at small crop + IFRNet latency."""
import time, numpy as np, jax, jax.numpy as jnp
from videoframeinterpolation_tpu.config import Config
from videoframeinterpolation_tpu.models import create_model
from videoframeinterpolation_tpu.parallel import create_mesh, shard_batch
from videoframeinterpolation_tpu.train import create_train_state, make_train_step

cfg = Config(model_name="DATwConstantnCv1", compute_dtype="bfloat16")
model = create_model(cfg)
mesh = create_mesh()
rng = np.random.default_rng(0)
B, H, W = 4, 128, 128
batch = {
    "x0": rng.uniform(0,1,(B,H,W,3)).astype(np.float32),
    "x1": rng.uniform(0,1,(B,H,W,3)).astype(np.float32),
    "xt": rng.uniform(0,1,(B,H,W,3)).astype(np.float32),
    "t": np.full((B,1,1,1),0.5,np.float32),
    "f0x": (rng.standard_normal((B,H,W,2))*0.02).astype(np.float32),
    "f1x": (rng.standard_normal((B,H,W,2))*0.02).astype(np.float32),
}
params = model.init(jax.random.key(0), jnp.asarray(batch["x0"][:1]),
                    jnp.asarray(batch["x1"][:1]), jnp.asarray(batch["t"][:1]), train=True)
state = create_train_state(model, params, cfg)
step = make_train_step(model, cfg, mesh)
sb = shard_batch(batch, mesh)
t0=time.perf_counter()
state, log = step(state, sb)
l0 = float(log["total_loss"]); print("step1 loss %.4f (compile %.0fs)" % (l0, time.perf_counter()-t0), flush=True)
losses=[l0]
t0=time.perf_counter()
for i in range(10):
    state, log = step(state, shard_batch(batch, mesh))
    losses.append(float(log["total_loss"]))
print("10 steps in %.2fs; loss %.4f -> %.4f (monotone-ish decrease on fixed batch)" % (
    time.perf_counter()-t0, losses[0], losses[-1]), flush=True)
assert losses[-1] < losses[0], "loss did not decrease"

# IFRNet latency at 448x256 using the marginal-loop methodology.
from bench import time_loop
cfg2 = Config(model_name="IFRNet", compute_dtype="bfloat16")
m2 = create_model(cfg2)
x0 = jnp.asarray(rng.uniform(0,1,(1,256,448,3)).astype(np.float32))
x1 = jnp.asarray(rng.uniform(0,1,(1,256,448,3)).astype(np.float32))
t = jnp.full((1,1,1,1),0.5,jnp.float32)
p2 = m2.init(jax.random.key(0), x0[:, :32, :32], x1[:, :32, :32], t)
sec = time_loop(lambda p,a,b,tt: m2.apply(p,a,b,tt), (p2, x0, x1, t))
print("IFRNet 448x256: %.2f ms/frame (baseline 6 ms)" % (sec*1e3), flush=True)

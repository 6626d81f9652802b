import time, numpy as np, jax, jax.numpy as jnp

k = jax.random.key(0)
# Big compute, tiny output: chained matmul reduced to scalar each step.
a = jax.random.normal(k, (2048, 2048), jnp.bfloat16)

@jax.jit
def f_small(x, s):
    y = x @ x
    return jnp.sum(y) + s

s = jnp.float32(0)
f_small(a, s).block_until_ready()
t0 = time.perf_counter()
ss = s
for i in range(20):
    ss = f_small(a, ss)
ss.block_until_ready()
t = (time.perf_counter()-t0)/20
print("matmul2048 -> scalar out: %.2f ms/call (%.1f TFLOP/s)" % (t*1e3, 2*2048**3/t/1e12), flush=True)

@jax.jit
def f_big(x, s):
    y = x @ x
    return y + s

s2 = jnp.bfloat16(0)
r = f_big(a, s2).block_until_ready()
t0 = time.perf_counter()
acc = s2
for i in range(10):
    r = f_big(a, acc)
    r.block_until_ready()
    acc = jnp.bfloat16(float(r[0,0]) % 3)
t = (time.perf_counter()-t0)/10
print("matmul2048 -> 8MB out fetched: %.2f ms/call" % (t*1e3), flush=True)

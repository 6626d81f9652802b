import time, numpy as np, jax, jax.numpy as jnp

def bench_chain(f, x, n=20):
    # Chain the output into the next call so every execution is distinct.
    y = f(x); y = jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = f(y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / n

k = jax.random.key(0)

a = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda x: (x @ a).astype(jnp.bfloat16))
t = bench_chain(mm, a)
print("matmul 4096^3 chained: %.3f ms -> %.1f TFLOP/s" % (t*1e3, 2*4096**3/t/1e12))

w = jax.random.normal(k, (3, 3, 72, 72), jnp.bfloat16)
x = jax.random.normal(k, (1, 128, 224, 72), jnp.bfloat16)
conv = jax.jit(lambda x: jax.lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)), dimension_numbers=("NHWC","HWIO","NHWC")))
fl = 2*128*224*72*72*9
t = bench_chain(conv, x)
print("conv chained: %.3f ms -> %.1f TFLOP/s" % (t*1e3, fl/t/1e12))

img = jax.random.normal(k, (8, 28672, 16), jnp.bfloat16)
idx0 = jax.random.randint(k, (8, 917504), 0, 28672)
def gg(carry):
    img, idx = carry
    out = jnp.take_along_axis(img, idx[...,None], axis=1)  # (8, 917504, 16)
    # fold output back into a new index tensor to create dependency
    idx2 = (idx + out[..., 0].astype(jnp.int32)) % 28672
    return (img, idx2)
g = jax.jit(gg)
c = g((img, idx0)); jax.block_until_ready(c)
t0 = time.perf_counter()
for _ in range(20): c = g(c)
jax.block_until_ready(c)
t = (time.perf_counter()-t0)/20
byt = 8*917504*16*2
print("gather 7.3M x 16ch chained: %.3f ms -> %.1f GB/s effective" % (t*1e3, byt/t/1e9))

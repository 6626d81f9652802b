import time, numpy as np, jax, jax.numpy as jnp

k = jax.random.key(0)
a = jax.random.normal(k, (2048, 2048), jnp.bfloat16)

def make(n):
    @jax.jit
    def f(x):
        def body(i, c):
            y = (c @ a)
            return y * (1.0 / (1.0 + jnp.max(jnp.abs(y))))  # keep bounded, dependent
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))
    return f

for n in (1, 33):
    f = make(n)
    r = float(f(a))  # compile+run, force fetch
    t0 = time.perf_counter(); r = float(f(a)); t1 = time.perf_counter()
    print("n=%d: total %.2f ms (checksum %.3f)" % (n, (t1-t0)*1e3, r), flush=True)

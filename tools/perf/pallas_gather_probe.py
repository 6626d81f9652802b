"""Feasibility test: Mosaic tpu.dynamic_gather via take_along_axis inside a
Pallas kernel — per-lane row gather from a VMEM-resident table."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_gather(M, N):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return run


def marginal(fn, args, n_hi=17):
    def make(n):
        @jax.jit
        def f(x, idx):
            def body(i, c):
                out = fn(c, idx)
                return c + (1e-12 * out).astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))
        return f
    ts = {}
    for n in (1, n_hi):
        f = make(n)
        float(f(*args))
        t0 = time.perf_counter(); float(f(*args)); ts[n] = time.perf_counter() - t0
    return (ts[n_hi] - ts[1]) / (n_hi - 1)


k = jax.random.key(0)
for M in (1024, 8192, 28672):
    N = 128
    x = jax.random.normal(k, (M, N), jnp.float32)
    idx = jax.random.randint(k, (M, N), 0, M, jnp.int32)
    run = make_gather(M, N)
    try:
        out = np.asarray(run(x, idx))
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=0)
        ok = np.allclose(out, ref)
        t = marginal(run, (x, idx))
        rows_per_s = M / t
        print(f"M={M}: correct={ok}  {t*1e6:.1f} us/call  "
              f"{rows_per_s/1e6:.1f} Mrow/s", flush=True)
    except Exception as e:
        print(f"M={M}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

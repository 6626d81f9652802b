"""Gate test for the windowed sampler: Mosaic lane-dim dynamic gather,
out[i, j] = x[i, idx[i, j]] with idx < 128, for large M."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(M, N=128):
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def run(x, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    return run


k = jax.random.key(0)
for M, dt in [(8, jnp.float32), (256, jnp.float32), (4096, jnp.float32),
              (4096, jnp.bfloat16), (32768, jnp.float32)]:
    x = jax.random.normal(k, (M, 128), dt)
    idx = jax.random.randint(k, (M, 128), 0, 128, jnp.int32)
    try:
        run = make(M)
        out = np.asarray(run(x, idx))
        ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
        ok = np.allclose(out, ref, rtol=1e-2)
        # marginal timing
        @jax.jit
        def loop(x, idx, n=64):
            def body(i, c):
                o = run(c, idx)
                return c + (1e-6 * o).astype(c.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))
        float(loop(x, idx))
        t0 = time.perf_counter(); float(loop(x, idx)); t = time.perf_counter() - t0
        print(f"M={M} {dt.__name__}: ok={ok}  ~{t/64*1e6:.1f} us/gather "
              f"({M*128/(t/64)/1e9:.1f} Gelem/s)", flush=True)
    except Exception as e:
        print(f"M={M} {dt.__name__}: FAIL {str(e)[:200]}", flush=True)

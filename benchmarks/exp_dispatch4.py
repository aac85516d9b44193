import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32) * 0.01).astype(jnp.bfloat16)

def chain_fn(n):
    @jax.jit
    def chain(a):
        def body(i, y):
            return jnp.tanh(y @ a)
        return jax.lax.fori_loop(0, n, body, a)[:1, :1]
    return chain

for n in (1, 10, 40):
    f = chain_fn(n)
    v = np.asarray(f(a))  # warmup + value
    t0 = time.perf_counter(); v = np.asarray(f(a)); dt = time.perf_counter()-t0
    t0 = time.perf_counter(); jax.block_until_ready(f(a)); dt_b = time.perf_counter()-t0
    print(f"chain{n}: value-fetch {dt*1e3:.2f} ms ({n*2*4096**3/dt/1e12:.1f} TF/s), block_until_ready {dt_b*1e3:.2f} ms")

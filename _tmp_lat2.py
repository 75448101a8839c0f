import time, numpy as np, jax, jax.numpy as jnp
f = jax.jit(lambda a, k: a + k)
x = jnp.zeros((2048,), jnp.int32)
outs = [f(x, i) for i in range(12)]
_ = jax.device_get(outs)
t0=time.perf_counter()
for _ in range(10):
    outs = [f(x, i) for i in range(12)]
    r = jax.device_get(outs)
print(f"device_get 12 arrays: {(time.perf_counter()-t0)/10*1e3:.1f} ms")
t0=time.perf_counter()
for _ in range(10):
    outs = [f(x, i) for i in range(12)]
    r = [np.asarray(o) for o in outs]
print(f"np.asarray x12:       {(time.perf_counter()-t0)/10*1e3:.1f} ms")

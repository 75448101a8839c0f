import time, numpy as np, jax, jax.numpy as jnp
f = jax.jit(lambda a: a + 1)
x = jnp.zeros(8, jnp.int32)
_ = np.asarray(f(x))
t0=time.perf_counter()
for _ in range(20): _ = np.asarray(f(x))
print(f"tiny jit + fetch: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
# chain of 10 dispatches then one fetch
t0=time.perf_counter()
for _ in range(20):
    y = x
    for i in range(10): y = f(y)
    _ = np.asarray(y)
print(f"10 chained + fetch: {(time.perf_counter()-t0)/20*1e3:.2f} ms")
big = jnp.zeros((4096,256), jnp.uint8)
g = jax.jit(lambda a: a)
_ = np.asarray(g(big))
t0=time.perf_counter()
for _ in range(10): _ = np.asarray(g(big))
print(f"1MB fetch: {(time.perf_counter()-t0)/10*1e3:.2f} ms")

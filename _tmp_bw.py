import time
import numpy as np, jax
import jax.numpy as jnp
for MB in (1, 4, 16, 64):
    x = jnp.ones((MB * 256 * 1024,), jnp.int32)  # MB megabytes
    jax.block_until_ready(x)
    t = time.perf_counter()
    _ = np.asarray(x)
    dt = time.perf_counter() - t
    print(f"{MB} MB device->host: {dt*1000:.0f} ms  ({MB/dt:.1f} MB/s)", flush=True)
# host->device
h = np.ones((16 * 256 * 1024,), np.int32)
t = time.perf_counter()
d = jax.block_until_ready(jnp.asarray(h))
print(f"16 MB host->device: {(time.perf_counter()-t)*1000:.0f} ms", flush=True)
# RTT: tiny sync
y = jnp.ones((8,), jnp.int32)
jax.block_until_ready(y)
for _ in range(3):
    t = time.perf_counter()
    np.asarray(y + 1)
    print(f"tiny sync RTT: {(time.perf_counter()-t)*1000:.1f} ms", flush=True)

import time
import numpy as np, jax
import jax.numpy as jnp
for KB in (64, 128, 256, 512, 1024, 2048, 4096):
    x = jnp.arange(KB * 256, dtype=jnp.int32)  # KB kilobytes
    jax.block_until_ready(x)
    times = []
    for i in range(6):
        y = x + i  # fresh array each time to avoid caching
        jax.block_until_ready(y)
        t = time.perf_counter()
        np.asarray(y)
        times.append(time.perf_counter() - t)
    ms = [round(t*1000) for t in times]
    print(f"{KB:5d} KB: {ms} ms", flush=True)

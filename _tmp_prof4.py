import time, numpy as np, jax, jax.numpy as jnp
from imsame_tpu.ops.nw_pallas import nw_forward_batch_pallas
from imsame_tpu.ops.traceback import traceback_batch
rng = np.random.default_rng(0)
L=256
for B in (512, 2048):
    X = jnp.asarray(rng.integers(0,4,(B,L),dtype=np.uint8))
    Y = jnp.asarray(rng.integers(0,4,(B,L),dtype=np.uint8))
    xl = jnp.full(B,250,jnp.int32); yl = jnp.full(B,250,jnp.int32)
    def run():
        r = nw_forward_batch_pallas(X,Y,xl,yl,-5,-2,max_len=L)
        tb = traceback_batch(r.bp, r.best_i, r.best_j, X, Y, max_len=L)
        return np.asarray(tb.length).sum()
    run()
    t0=time.perf_counter(); it=3
    for _ in range(it): s=run()
    dt=(time.perf_counter()-t0)/it
    cells=B*250*250
    print(f"B={B}: {dt*1e3:.1f} ms, {cells/dt/1e9:.2f} GCUPS (fwd+tb), sum={s}")
    # forward only
    r = nw_forward_batch_pallas(X,Y,xl,yl,-5,-2,max_len=L); _=np.asarray(r.best_i)
    t0=time.perf_counter()
    for _ in range(it):
        r = nw_forward_batch_pallas(X,Y,xl,yl,-5,-2,max_len=L); _=np.asarray(r.best_i)
    dt=(time.perf_counter()-t0)/it
    print(f"  fwd only: {dt*1e3:.1f} ms, {cells/dt/1e9:.2f} GCUPS")

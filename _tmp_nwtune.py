import time, importlib, numpy as np, jax.numpy as jnp
import imsame_tpu.ops.nw_pallas as NP_
rng = np.random.default_rng(0)
L=256; B=2048
X = jnp.asarray(rng.integers(0,4,(B,L),dtype=np.uint8))
Y = jnp.asarray(rng.integers(0,4,(B,L),dtype=np.uint8))
xl = jnp.full(B,250,jnp.int32); yl = jnp.full(B,250,jnp.int32)
import itertools
for bblk, unroll in [(8,8),(16,8),(8,16),(16,16),(32,8),(8,32)]:
    NP_.BBLK = bblk; NP_.UNROLL = unroll
    NP_.nw_forward_batch_pallas.clear_cache()
    try:
        r = NP_.nw_forward_batch_pallas(X,Y,xl,yl,-5,-2,max_len=L)
        _ = np.asarray(r.best_i)
        t0=time.perf_counter(); it=3
        for _i in range(it):
            r = NP_.nw_forward_batch_pallas(X,Y,xl,yl,-5,-2,max_len=L)
            s = np.asarray(r.best_i).sum()
        dt=(time.perf_counter()-t0)/it
        print(f"BBLK={bblk} UNROLL={unroll}: {dt*1e3:.1f} ms {B*250*250/dt/1e9:.2f} GCUPS sum={s}")
    except Exception as e:
        print(f"BBLK={bblk} UNROLL={unroll}: FAIL {str(e)[:120]}")

"""Scratch: compiled-on-TPU parity + speed of pipe2 vs pipe."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
from imsame_tpu.ops.nw import nw_stats_batch
from imsame_tpu.ops.nw_pallas import (
    RBLK2, PIPE2_K, nw_stats_batch_pallas_pipe, nw_stats_batch_pallas_pipe2)
from test_nw_stats import _mixed_pairs

def amortized(fn, reps=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps

for L, B in ((256, 8192), (256, 2048), (128, 1024)):
    rng = np.random.default_rng(1)
    X, Y, xlen, ylen = _mixed_pairs(rng, B, L)
    args = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xlen),
            jnp.asarray(ylen), -5, -2)
    st = jax.tree.map(np.asarray, nw_stats_batch(*args, max_len=L))
    p2 = jax.tree.map(np.asarray,
                      nw_stats_batch_pallas_pipe2(*args, max_len=L))
    names = ["best_score", "best_i", "best_j", "length", "identities"]
    for n, a, b in zip(names, st, p2):
        assert np.array_equal(a, b), (L, B, n, np.flatnonzero(a != b)[:5])
    cells = int((xlen.astype(np.int64) * ylen).sum())
    t1 = amortized(lambda: nw_stats_batch_pallas_pipe(*args, max_len=L))
    t2 = amortized(lambda: nw_stats_batch_pallas_pipe2(*args, max_len=L))
    print(f"L={L} B={B}: parity OK  pipe={t1*1e3:.1f}ms ({cells/t1/1e9:.1f} "
          f"GCUPS)  pipe2={t2*1e3:.1f}ms ({cells/t2/1e9:.1f} GCUPS)  "
          f"speedup {t1/t2:.2f}x")

"""NW stats kernel A/B timer (dev tool, not the driver bench).

Times the generations of the pipelined wavefront stats kernel on the
real TPU with the same inputs and a bit-equality check:

  pipe   v1 (8 pairs/row, per-step masked best-cell reductions)
  pipe2  v2 (16 pairs/row, associative best-cell fold, 4-buffer rotation)
  pipe3  v3 (registerized carried state -- production dispatch)

Timing methodology for the tunneled TPU (see memory/ADVICE r3):
block_until_ready does not block on this backend, so each variant
dispatches ``reps`` calls and fetches one small output slice as the
sync; a warmup call separates compile time.

NOTE: do NOT "variant-probe" by monkeypatching the kernel builder inside
one process -- the jit wrappers cache on shapes only and _clear_cache is
not reliable here, so the patched builder is silently ignored after the
first trace (measured round 4: all variants timed identically until run
in fresh processes).

Usage: python bench_kernel.py [B] [L] [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from imsame_tpu.ops.nw_pallas import (
        nw_stats_batch_pallas_pipe,
        nw_stats_batch_pallas_pipe2,
        nw_stats_batch_pallas_pipe3,
        nw_stats_batch_pallas_pipe4,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rlen = min(L - 6, int(L * 0.98))
    print(f"B={B} L={L} read_len={rlen} reps={reps}")

    rng = np.random.default_rng(1)
    xlen = np.full(B, rlen, np.int32)
    ylen = np.full(B, rlen, np.int32)
    X = rng.integers(0, 4, (B, L)).astype(np.uint8)
    Y = rng.integers(0, 4, (B, L)).astype(np.uint8)
    for b in range(B // 2):  # half mutated copies: realistic pick mix
        Y[b] = X[b].copy()
        mut = rng.random(L) < 0.08
        Y[b][mut] = (Y[b][mut] + rng.integers(1, 4, int(mut.sum()))) % 4
    args = (jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xlen),
            jnp.asarray(ylen), -5, -2)
    cells = B * rlen * rlen

    ref = None
    for name, fn in (("pipe", nw_stats_batch_pallas_pipe),
                     ("pipe2", nw_stats_batch_pallas_pipe2),
                     ("pipe3", nw_stats_batch_pallas_pipe3),
                     ("pipe4", nw_stats_batch_pallas_pipe4)):
        try:
            out = fn(*args, max_len=L)
            got = tuple(
                np.asarray(getattr(out, f)).copy()
                for f in ("best_score", "best_i", "best_j", "length",
                          "identities")
            )
        except Exception as e:
            print(f"{name:6s} FAIL {type(e).__name__}: {str(e)[:100]}")
            continue
        if ref is None:
            ref = got
        ok = all(np.array_equal(a, b) for a, b in zip(ref, got))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args, max_len=L)
        np.asarray(out.best_score)
        dt = (time.perf_counter() - t0) / reps
        print(
            f"{name:6s} {dt * 1e3:8.2f} ms  {cells / dt / 1e9:7.2f} GCUPS"
            f"  bit-equal={'yes' if ok else 'NO'}"
        )


if __name__ == "__main__":
    main()

"""Pallas wavefront kernel vs the jnp reference implementation.

Runs the kernel in interpret mode on CPU (hermetic); on real TPU hardware
the same comparison runs compiled (see bench/driver runs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imsame_tpu.ops.nw import nw_forward_batch
from imsame_tpu.ops.nw_pallas import nw_forward_batch_pallas
from imsame_tpu.ops.traceback import traceback_batch


def _mk(seed, B=8, L=128):
    rng = np.random.default_rng(seed)
    X = rng.integers(0, 4, (B, L), dtype=np.uint8)
    Y = X.copy()
    m = rng.random((B, L)) < 0.07
    Y[m] = (Y[m] + rng.integers(1, 4, int(m.sum()), dtype=np.uint8)) % 4
    xl = rng.integers(L // 2, L + 1, B).astype(np.int32)
    yl = rng.integers(L // 2, L + 1, B).astype(np.int32)
    return X, Y, xl, yl


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_interpret_matches_jnp(seed):
    B, L = 8, 128
    X, Y, xl, yl = _mk(seed, B, L)
    interp = jax.default_backend() != "tpu"
    rp = nw_forward_batch_pallas(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xl), jnp.asarray(yl),
        -5, -2, max_len=L, interpret=interp,
    )
    rj = nw_forward_batch(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xl), jnp.asarray(yl),
        -5, -2, max_len=L,
    )
    np.testing.assert_array_equal(np.asarray(rp.best_score), np.asarray(rj.best_score))
    np.testing.assert_array_equal(np.asarray(rp.best_i), np.asarray(rj.best_i))
    np.testing.assert_array_equal(np.asarray(rp.best_j), np.asarray(rj.best_j))
    np.testing.assert_array_equal(
        np.asarray(rp.bp)[:, : 2 * L - 1], np.asarray(rj.bp)
    )


def test_pallas_bp_feeds_traceback():
    B, L = 8, 128
    X, Y, xl, yl = _mk(7, B, L)
    interp = jax.default_backend() != "tpu"
    rp = nw_forward_batch_pallas(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xl), jnp.asarray(yl),
        -5, -2, max_len=L, interpret=interp,
    )
    rj = nw_forward_batch(
        jnp.asarray(X), jnp.asarray(Y), jnp.asarray(xl), jnp.asarray(yl),
        -5, -2, max_len=L,
    )
    tp = traceback_batch(rp.bp, rp.best_i, rp.best_j, jnp.asarray(X),
                         jnp.asarray(Y), max_len=L)
    tj = traceback_batch(rj.bp, rj.best_i, rj.best_j, jnp.asarray(X),
                         jnp.asarray(Y), max_len=L)
    np.testing.assert_array_equal(np.asarray(tp.length), np.asarray(tj.length))
    np.testing.assert_array_equal(
        np.asarray(tp.identities), np.asarray(tj.identities)
    )
    np.testing.assert_array_equal(np.asarray(tp.chain), np.asarray(tj.chain))

"""Batched wavefront NW + traceback vs the faithful scalar oracle:
backpointers cell-for-cell, best cell, traceback stats, and reconstructed
report buffers."""

import random

import numpy as np
import pytest

from imsame_tpu.io.fasta import CODE_TO_CHAR
from imsame_tpu.io.reconstruct import backtrack_from_chain
from imsame_tpu.io.report import render_alignment
from imsame_tpu.oracle.nw import backtrack_faithful, nw_faithful
from imsame_tpu.ops.nw import PACK, nw_forward_batch
from imsame_tpu.ops.traceback import traceback_batch

import jax.numpy as jnp


def _random_pairs(rng, n_pairs, lmin, lmax, mutate_frac=0.6):
    pairs = []
    for _ in range(n_pairs):
        lx = rng.randrange(lmin, lmax + 1)
        X = np.array([rng.randrange(4) for _ in range(lx)], dtype=np.uint8)
        if rng.random() < mutate_frac:
            Y = X.copy()
            # substitutions + indels so gap moves are exercised
            for _ in range(max(1, lx // 8)):
                p = rng.randrange(len(Y))
                Y[p] = rng.randrange(4)
            if rng.random() < 0.5 and len(Y) > lmin:
                p = rng.randrange(len(Y) - 3)
                Y = np.delete(Y, slice(p, p + rng.randrange(1, 4)))
            if rng.random() < 0.5:
                p = rng.randrange(len(Y))
                ins = np.array(
                    [rng.randrange(4) for _ in range(rng.randrange(1, 4))],
                    dtype=np.uint8,
                )
                Y = np.concatenate([Y[:p], ins, Y[p:]])
        else:
            ly = rng.randrange(lmin, lmax + 1)
            Y = np.array([rng.randrange(4) for _ in range(ly)], dtype=np.uint8)
        pairs.append((X, Y))
    return pairs


def _run_batch(pairs, L, igap=-5, egap=-2):
    B = len(pairs)
    Xb = np.zeros((B, L), np.uint8)
    Yb = np.zeros((B, L), np.uint8)
    xl = np.zeros(B, np.int32)
    yl = np.zeros(B, np.int32)
    for b, (X, Y) in enumerate(pairs):
        Xb[b, : len(X)] = X
        Yb[b, : len(Y)] = Y
        xl[b] = len(X)
        yl[b] = len(Y)
    res = nw_forward_batch(
        jnp.asarray(Xb), jnp.asarray(Yb), jnp.asarray(xl), jnp.asarray(yl),
        igap, egap, max_len=L,
    )
    tb = traceback_batch(
        res.bp, res.best_i, res.best_j, jnp.asarray(Xb), jnp.asarray(Yb),
        max_len=L,
    )
    return res, tb, Xb, Yb


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_wavefront_matches_oracle(seed):
    rng = random.Random(seed)
    L = 64
    pairs = _random_pairs(rng, 12, 16, 60)
    res, tb, Xb, Yb = _run_batch(pairs, L)
    bp = np.asarray(res.bp)
    bi = np.asarray(res.best_i)
    bj = np.asarray(res.best_j)
    bsc = np.asarray(res.best_score)

    for b, (X, Y) in enumerate(pairs):
        score, frm, bc = nw_faithful(X, Y, -5, -2)
        assert bsc[b] == bc.score, f"pair {b} best score"
        assert (bi[b], bj[b]) == (bc.xpos, bc.ypos), f"pair {b} best cell"
        # backpointer parity over all inner cells
        for i in range(1, len(X)):
            for j in range(1, len(Y)):
                got = bp[b, i + j, i] & 0xFFFFFF  # low 24: from-cell
                want = frm[i, j, 0] * PACK + frm[i, j, 1]
                assert got == want, f"pair {b} cell ({i},{j})"


@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_traceback_matches_oracle(seed):
    rng = random.Random(seed)
    L = 96
    pairs = _random_pairs(rng, 16, 14, 90)
    res, tb, Xb, Yb = _run_batch(pairs, L)
    chain = np.asarray(tb.chain)
    n_steps = np.asarray(tb.n_steps)

    for b, (X, Y) in enumerate(pairs):
        _, frm, bc = nw_faithful(X, Y, -5, -2)
        xc, yc = CODE_TO_CHAR[X], CODE_TO_CHAR[Y]
        rec_x, rec_y, hx, hy, ba, ml = backtrack_faithful(X, Y, frm, bc, xc, yc)
        block, idents = render_alignment(rec_x, rec_y, hx, hy, ml)

        assert int(np.asarray(tb.length)[b]) == ba.length, f"pair {b} length"
        assert int(np.asarray(tb.identities)[b]) == idents, f"pair {b} idents"
        assert int(np.asarray(tb.igaps)[b]) == ba.igaps
        assert int(np.asarray(tb.egaps)[b]) == ba.egaps

        # chain-driven reconstruction must give identical buffers
        rec_x2, rec_y2, hx2, hy2, ml2 = backtrack_from_chain(
            chain[b], int(n_steps[b]), len(X), len(Y), xc, yc
        )
        assert (hx2, hy2, ml2) == (hx, hy, ml)
        block2, idents2 = render_alignment(rec_x2, rec_y2, hx2, hy2, ml2)
        assert block2 == block and idents2 == idents


def test_nondefault_gaps():
    rng = random.Random(9)
    pairs = _random_pairs(rng, 8, 20, 50)
    res, tb, _, _ = _run_batch(pairs, 64, igap=-3, egap=-1)
    for b, (X, Y) in enumerate(pairs):
        _, frm, bc = nw_faithful(X, Y, -3, -1)
        assert int(np.asarray(res.best_score)[b]) == bc.score
        assert (int(np.asarray(res.best_i)[b]), int(np.asarray(res.best_j)[b])) == (
            bc.xpos,
            bc.ypos,
        )

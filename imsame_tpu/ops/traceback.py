"""Batched traceback over the wavefront backpointers.

Follows the reference backtracker's control flow
(src/alignmentFunctions.c:493-560) vectorized across pairs with a masked
while-loop: from the best cell, repeatedly read the stored (xfrom, yfrom),
classify the move (diagonal / gap-in-X / gap-in-Y by the reference's
``(dx > dy)`` rule), and accumulate:

  length      diag: +1, gap run: +run length
  identities  diag moves whose characters match -- provably equal to the
              reference's render-time '*' count (gap-run positions always
              pair a base with '-', head padding pairs '-' with spaces)
  igaps/egaps gap-open / gap-extend counts as the reference tallies them

The chain of visited cells is also recorded so the host can reconstruct the
two right-aligned report buffers for accepted pairs without re-running the
DP (io/reconstruct.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .nw import PACK


class TracebackResult(NamedTuple):
    length: jax.Array  # [B] int32
    identities: jax.Array  # [B] int32
    igaps: jax.Array  # [B] int32
    egaps: jax.Array  # [B] int32
    chain: jax.Array  # [B, 2L] int32 packed px*4096+py, chain[0]=best cell
    n_steps: jax.Array  # [B] int32 number of valid entries in chain


@functools.partial(jax.jit, static_argnames=("max_len",))
def traceback_batch(
    bp: jax.Array,  # [B, 2L-1, L] int32 from nw_forward_batch
    best_i: jax.Array,  # [B] int32
    best_j: jax.Array,  # [B] int32
    X: jax.Array,  # [B, L] uint8
    Y: jax.Array,  # [B, L] uint8
    *,
    max_len: int,
) -> TracebackResult:
    B, ND, L = bp.shape
    assert L == max_len
    CH = 2 * L
    bp_flat = bp.reshape(B, ND * L)

    chain0 = jnp.full((B, CH), -1, jnp.int32)
    chain0 = chain0.at[:, 0].set(best_i * PACK + best_j)

    def cond(state):
        px, py, t, *_ = state
        return jnp.any((px > 0) & (py > 0)) & (t < CH - 1)

    def body(state):
        px, py, t, length, ident, igaps, egaps, chain = state
        active = (px > 0) & (py > 0)

        flat_idx = jnp.clip((px + py) * L + px, 0, ND * L - 1)
        frm = jnp.take_along_axis(bp_flat, flat_idx[:, None], axis=1)[:, 0]
        fx = frm // PACK
        fy = frm - fx * PACK

        xc = jnp.take_along_axis(X, jnp.clip(px, 0, L - 1)[:, None], axis=1)[:, 0]
        yc = jnp.take_along_axis(Y, jnp.clip(py, 0, L - 1)[:, None], axis=1)[:, 0]

        dx = px - fx
        dy = py - fy
        is_diag = (dx == 1) & (dy == 1)
        is_gapx = (~is_diag) & (dx > dy)

        add_len = jnp.where(is_diag, 1, jnp.where(is_gapx, dx, dy))
        add_id = jnp.where(is_diag & (xc == yc), 1, 0)
        add_ig = jnp.where(is_diag, 0, 1)
        add_eg = jnp.where(is_diag, 0, jnp.where(is_gapx, dx - 1, dy - 1))

        length = jnp.where(active, length + add_len, length)
        ident = jnp.where(active, ident + add_id, ident)
        igaps = jnp.where(active, igaps + add_ig, igaps)
        egaps = jnp.where(active, egaps + add_eg, egaps)

        chain = chain.at[:, t + 1].set(
            jnp.where(active, fx * PACK + fy, chain[:, t + 1])
        )
        px = jnp.where(active, fx, px)
        py = jnp.where(active, fy, py)
        return (px, py, t + 1, length, ident, igaps, egaps, chain)

    z = jnp.zeros((B,), jnp.int32)
    state = (
        best_i.astype(jnp.int32),
        best_j.astype(jnp.int32),
        jnp.int32(0),
        z,
        z,
        z,
        z,
        chain0,
    )
    px, py, t, length, ident, igaps, egaps, chain = jax.lax.while_loop(
        cond, body, state
    )
    # n_steps = number of moves actually recorded per pair: first t' where
    # the pair went inactive.  Count chain entries != -1 minus 1.
    n_steps = jnp.sum(chain != -1, axis=1) - 1
    return TracebackResult(length, ident, igaps, egaps, chain, n_steps)

"""Batched bidirectional ungapped extension + e-value gate.

Vectorized reformulation of the reference's sequential extension
(src/alignmentFunctions.c:276-387, oracle in oracle/extend.py): the
extension walks a single diagonal, so each candidate's forward/backward
passes become prefix-sum scans over a gathered window of the two
concatenated sequence arrays:

  * the walk's stop condition (running score <= 0, or read/array end) maps
    to "first index where" reductions over monotone prefix masks;
  * the ``high <= score`` watermark (later equal scores win) makes the
    watermarked endpoint the *last* processed index attaining the running
    max, expressible as a masked argmax -- no sequential loop needed;
  * the backward pass starts its running score at the forward high
    watermark but its own watermark at the seed score (reference quirks,
    SURVEY.md 6.6), both preserved.

E-value gate parity without float drama: the accept test
``K*qlen*dbtot*exp(-lambda*raw) < min_e`` is equivalent to
``raw >= floor((ln(K*qlen*dbtot) - ln(min_e))/lambda) + 1`` with raw an
exact int32 on device and the threshold computed once per read in float64
on the host (see raw_score_threshold).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import FIXED_K, POINT, QF_KARLIN, QF_LAMBDA

SEED_SCORE = FIXED_K * POINT  # 48


def raw_score_threshold(
    qlens: np.ndarray, db_total_len: int, min_e_value: float
) -> np.ndarray:
    """Per-read minimum integer raw score passing the e-value gate,
    bit-exact against the reference's long-double comparison.

    The reference computes
    ``e_value = (long double)QF_KARLIN * qlen * total_len * expl(-QF_LAMBDA*raw)``
    and gates with strict ``<`` (src/alignmentFunctions.c:384 + :139).  A
    float64 log-space estimate can land within rounding of an integer, so
    the estimate is corrected by evaluating the reference's exact
    expression in ``np.longdouble`` -- the same 80-bit x87 type and the
    same libm ``expl`` gcc compiles to on this platform -- at the two
    neighboring integers.  Returns int32 thresholds (int32 max = never
    passes)."""
    qlens = qlens.astype(np.float64)
    out = np.full(len(qlens), np.iinfo(np.int32).max, dtype=np.int64)
    if min_e_value > 0:
        with np.errstate(divide="ignore"):
            t = (
                np.log(QF_KARLIN * qlens * float(db_total_len))
                - np.log(min_e_value)
            ) / QF_LAMBDA
        # qlen == 0 -> t = -inf -> always passes (reference: 0 < min_e).
        thr = np.where(
            qlens > 0,
            np.floor(t) + 1.0,
            float(np.iinfo(np.int32).min),
        )
        out = np.clip(thr, np.iinfo(np.int32).min, np.iinfo(np.int32).max).astype(
            np.int64
        )
        # Long-double boundary correction, mirroring the reference's
        # operand order and promotions: C double literals promoted to
        # long double, left-associated products, expl.
        finite = (qlens > 0) & (out < np.iinfo(np.int32).max) & (
            out > np.iinfo(np.int32).min
        )
        if np.any(finite):
            lam = np.longdouble(np.float64(QF_LAMBDA))
            base = (
                np.longdouble(np.float64(QF_KARLIN))
                * qlens[finite].astype(np.longdouble)
                * np.longdouble(float(db_total_len))
            )
            e0 = np.longdouble(np.float64(min_e_value))
            sub = out[finite]

            def passes(raw):
                return base * np.exp(-lam * raw.astype(np.longdouble)) < e0

            # E is strictly decreasing in raw; the float64 estimate is
            # within 1 of the exact boundary.
            sub = np.where(passes(sub - 1), sub - 1, sub)
            sub = np.where(passes(sub), sub, sub + 1)
            out[finite] = sub
    return out.astype(np.int32)


class ExtendResult(NamedTuple):
    raw: jax.Array  # [N] int32 raw scores
    passes: jax.Array  # [N] bool e-value gate
    t_len: jax.Array  # [N] int32 (diagnostics)
    idents: jax.Array  # [N] int32 (diagnostics)


def _first_true(mask: jax.Array, size: int) -> jax.Array:
    """Index of first True along axis 1, else ``size``."""
    o = jnp.arange(size, dtype=jnp.int32)
    return jnp.min(jnp.where(mask, o, size), axis=1)


def _last_true(mask: jax.Array, size: int) -> jax.Array:
    o = jnp.arange(size, dtype=jnp.int32)
    return jnp.max(jnp.where(mask, o, -1), axis=1)


@functools.partial(jax.jit, static_argnames=("window",))
def extend_batch(
    db_codes: jax.Array,  # [Ld] uint8 concatenated database
    q_codes: jax.Array,  # [Lq] uint8 concatenated query
    pos_db: jax.Array,  # [N] int32 one past seed k-mer end in db
    pos_q: jax.Array,  # [N] int32 one past seed k-mer end in query
    rxs: jax.Array,  # [N] int32 db-read start
    rxe: jax.Array,  # [N] int32 db-read end bound (reference semantics)
    rys: jax.Array,  # [N] int32 query-read start
    rye: jax.Array,  # [N] int32 query-read end bound
    raw_min: jax.Array,  # [N] int32 per-candidate gate threshold
    *,
    window: int,
) -> ExtendResult:
    W = window
    Ld = db_codes.shape[0]
    Lq = q_codes.shape[0]
    o = jnp.arange(W, dtype=jnp.int32)[None, :]
    NEGI = jnp.int32(-(2**30))

    pos_db = pos_db.astype(jnp.int32)[:, None]
    pos_q = pos_q.astype(jnp.int32)[:, None]

    # ---- forward pass ----
    dpos = pos_db + o
    qpos = pos_q + o
    in_b = (
        (dpos < Ld)
        & (qpos < Lq)
        & (dpos <= rxe[:, None])
        & (qpos <= rye[:, None])
    )
    dch = jnp.take(db_codes, jnp.clip(dpos, 0, Ld - 1))
    qch = jnp.take(q_codes, jnp.clip(qpos, 0, Lq - 1))
    match = (dch == qch) & in_b
    pm = jnp.where(in_b, jnp.where(match, POINT, -POINT), 0)
    S = SEED_SCORE + jnp.cumsum(pm, axis=1)

    first_oob = _first_true(~in_b, W)
    first_np = _first_true((S <= 0) & in_b, W)
    stop = jnp.minimum(first_oob, first_np + 1)
    processed = o < stop[:, None]

    idents_fwd = jnp.sum(match & processed, axis=1).astype(jnp.int32)
    Sm = jnp.where(processed, S, NEGI)
    M = jnp.max(Sm, axis=1)
    has_high = M >= SEED_SCORE
    o_best = _last_true(processed & (S == M[:, None]), W)
    final_end_x = jnp.where(
        has_high, pos_db[:, 0] + o_best, pos_db[:, 0] - 1
    )
    high_right = jnp.maximum(SEED_SCORE, M)

    # ---- backward pass (running score seeded with high_right) ----
    bd = pos_db[:, 0] - FIXED_K - 1
    bq = pos_q[:, 0] - FIXED_K - 1
    dpos2 = bd[:, None] - o
    qpos2 = bq[:, None] - o
    in_b2 = (
        (dpos2 >= 0)
        & (qpos2 >= 0)
        & (dpos2 >= rxs[:, None])
        & (qpos2 >= rys[:, None])
    )
    dch2 = jnp.take(db_codes, jnp.clip(dpos2, 0, Ld - 1))
    qch2 = jnp.take(q_codes, jnp.clip(qpos2, 0, Lq - 1))
    match2 = (dch2 == qch2) & in_b2
    pm2 = jnp.where(in_b2, jnp.where(match2, POINT, -POINT), 0)
    S2 = high_right[:, None] + jnp.cumsum(pm2, axis=1)

    first_oob2 = _first_true(~in_b2, W)
    first_np2 = _first_true((S2 <= 0) & in_b2, W)
    stop2 = jnp.minimum(first_oob2, first_np2 + 1)
    processed2 = o < stop2[:, None]

    idents_bwd = jnp.sum(match2 & processed2, axis=1).astype(jnp.int32)
    S2m = jnp.where(processed2, S2, NEGI)
    M2 = jnp.max(S2m, axis=1)
    has_high2 = M2 >= SEED_SCORE  # backward watermark starts at seed score
    o_best2 = _last_true(processed2 & (S2 == M2[:, None]), W)
    final_start_x = jnp.where(has_high2, bd - o_best2, pos_db[:, 0] - FIXED_K)

    idents = FIXED_K + idents_fwd + idents_bwd
    t_len = (final_end_x - final_start_x).astype(jnp.int32)
    raw = (2 * idents - t_len) * POINT

    return ExtendResult(
        raw=raw,
        passes=raw >= raw_min,
        t_len=t_len,
        idents=idents,
    )

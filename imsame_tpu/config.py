"""Runtime configuration for the engine.

One dataclass mirroring the reference CLI flags and their defaults
(reference: src/IMSAME.c:44-49 and init_args at src/IMSAME.c:520-578), plus
TPU-engine tunables that have no reference equivalent (batching, sharding).

Reference flag quirks honored here:
  * ``-igap``/``-egap`` are *negated* on parse (src/IMSAME.c:565,568): users
    pass positive penalties; the engine stores negative scores.  The
    dataclass stores the already-negative scores, like the reference's
    internal state, with defaults igap=-5, egap=-2.
  * ``--verbose`` is accepted but dead, as in the reference
    (src/IMSAME.c:32,524 -- VERBOSE_ACTIVE is never read).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Config:
    """Pipeline configuration (defaults == reference defaults)."""

    # Acceptance thresholds (reference: src/IMSAME.c:44-49).
    min_e_value: float = 1e-20
    min_coverage: float = 0.5
    min_identity: float = 0.5
    # Gap scores, stored negative (post-negation, reference internal form).
    igap: int = -5
    egap: int = -2

    # Reference thread count; kept for parity of the query-scan stream
    # boundary quirk (a thread's first read does not receive the previous
    # read's trailing base -- see oracle/engine.py).  The TPU engine emulates
    # a given thread split; 1 gives the canonical deterministic stream.
    n_threads: int = 1

    # --- TPU-engine tunables (no reference equivalent) ---
    # Read-batch size for the seed-scan / extension stages.  Large batches
    # amortize device round-trips (the engine may sit behind a
    # high-latency tunnel to the chip).
    read_batch: int = 8192
    # Candidates fetched per read per resolution round.
    cands_per_round: int = 128
    # Max NW pairs batched per kernel invocation (bp memory is
    # ~0.5 MB/pair at the 256-bucket; 512 pairs ~= 256 MB HBM).
    nw_batch: int = 512
    # Length buckets (reads padded up to the smallest bucket >= their len).
    length_buckets: tuple = (128, 256, 512, 1024, 2048, 3072)
    # Use the Pallas NW kernel when on TPU; fall back to pure-jnp otherwise.
    use_pallas: Optional[bool] = None  # None = auto-detect

    def validate(self) -> None:
        if self.min_e_value < 0:
            raise ValueError("min_e_value must be >= 0")
        if not (0 < self.min_coverage):
            raise ValueError("min_coverage must be > 0")
        if not (0 < self.min_identity):
            raise ValueError("min_identity must be > 0")
        if self.n_threads < 1:
            raise ValueError("n_threads must be >= 1")


DEFAULT_CONFIG = Config()

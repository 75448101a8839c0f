"""imsame_tpu -- TPU-native all-vs-all metagenome read comparison engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
C tool IMSAME (Bitlab-UMA/IMSAME, mounted read-only at /root/reference):
k-mer dictionary seeding, ungapped extension + Karlin-Altschul e-value
filtering, a quirky semi-global gapped aligner, and per-read
identity/coverage reporting with sample-level Jaccard similarity.

Layout:
  io/        FASTA ingest, revcomp, report rendering (host, numpy)
  index/     sorted k-mer arrays + vectorized binary search
  oracle/    faithful scalar engine (parity anchor for tests)
  ops/       batched XLA/Pallas compute: extension, wavefront NW, traceback
  parallel/  mesh/sharding: data-parallel reads, sharded dictionary
  pipeline   single-host batched engine
"""

import os as _os

import jax as _jax

# NOTE: jax_enable_x64 must stay OFF -- enabling it poisons Mosaic's
# lowering of the Pallas wavefront kernel ("failed to legalize func.return")
# even when every array in the kernel is explicitly int32.  All
# parity-critical 64-bit arithmetic (e-value thresholds, accept gates,
# cell tallies) therefore runs on the host in numpy float64/int64.

# Persistent compilation cache: the first TPU compile of the wavefront loop
# pays a large one-time backend warmup; caching executables across
# processes removes it from every later run.
_cache_dir = _os.environ.get(
    "IMSAME_TPU_JAX_CACHE",
    _os.path.join(_os.path.expanduser("~"), ".cache", "imsame_tpu", "jax_cache"),
)
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"

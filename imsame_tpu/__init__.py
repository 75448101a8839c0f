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

__version__ = "0.1.0"

"""hite_tpu — a TPU-native transposable-element discovery and annotation engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of HiTE
(reference: CSU-KangHu/HiTE, surveyed in SURVEY.md): de-novo detection of
full-length TEs (LTR, TIR, Helitron, non-LTR) in genome assemblies, dynamic
boundary adjustment via batched MSA column statistics, redundancy clustering,
protein-profile classification, genome annotation, and pan-genome analysis.

Unlike the reference (a Nextflow/subprocess pipeline over a zoo of external
CPU tools), hite_tpu keeps the genome on-device as a code tensor and runs
k-mer seeding, banded seed-extend alignment, FMEA repeat chaining, terminal
repeat / TSD structure scanning, batched MSA boundary adjudication, and
clustering as JAX/Pallas kernels, sharded over a TPU mesh.

Layout:
  hite_tpu.config    — single typed configuration (replaces the reference's
                       three uncoordinated flag systems, SURVEY.md §5)
  hite_tpu.io        — FASTA/GFF/format codecs (host side)
  hite_tpu.genome    — genome tensor, chunk/segment bookkeeping, masking
  hite_tpu.ops       — device kernels (encode, kmer, seeds, extend, chain,
                       tandem, terminal, tsd, msa, boundary, cluster, pwm,
                       ltr_profile, protein)
  hite_tpu.pipeline  — pipeline stages (coarse, tir, helitron, non_ltr, ltr,
                       library, annotate, benchmark, pan)
  hite_tpu.models    — Flax neural classifiers (TE superfamily CNN, LTR filter)
  hite_tpu.parallel  — mesh/sharding helpers, chunk-grid dispatch
  hite_tpu.native    — C++ host runtime (FASTA scan, interval ops) via ctypes
"""

__version__ = "0.1.0"
